"""Distributed BPE training vs an independent pure-Python reference
implementation of the Sennrich merge loop (same tie-breaks)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.text import (
    BPE_ISH,
    bpe_train,
    bpe_vocab,
)
from airline_data_warehouse_spark.plans.registry import load

SF = "/root/testdata/sf0.001"


def _reference_bpe(texts, n_merges, min_pair_count=2):
    """Dict-based reference: word histogram -> iterative best-pair merge,
    leftmost-first non-overlapping, ties by (count desc, pair asc)."""
    hist = Counter()
    for t in texts:
        for w in re.findall(BPE_ISH, t.lower()):
            hist[w] += 1
    words = {w: tuple(w) + ("</w>",) for w in hist}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += hist[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = tuple(out)
    vocab = Counter()
    for w, syms in words.items():
        for s in syms:
            vocab[s] += hist[w]
    return merges, words, hist, vocab


def test_bpe_train_matches_reference(spark):
    """30 merges on the sf0.001 documents corpus: identical merge
    sequence, identical final segmentation of every word, identical
    subword vocabulary counts."""
    docs = load(spark, SF, "documents")
    merges, words = bpe_train(docs, n_merges=30)
    texts = [r["text"] for r in docs.select("text").collect()]
    ref_merges, ref_words, ref_hist, ref_vocab = _reference_bpe(texts, 30)

    assert merges == ref_merges
    got_words = {r["word"]: (r["count"], tuple(r["syms"]))
                 for r in words.collect()}
    assert got_words == {w: (ref_hist[w], syms)
                         for w, syms in ref_words.items()}
    got_vocab = {r["symbol"]: r["count"] for r in bpe_vocab(words).collect()}
    assert got_vocab == dict(ref_vocab)


def test_bpe_train_learns_frequent_subwords(spark):
    """Sanity on the learned rules: the corpus's most frequent bigram
    of characters merges first, and merges chain into longer units."""
    docs = load(spark, SF, "documents")
    merges, words = bpe_train(docs, n_merges=30)
    assert len(merges) == 30
    # merged outputs feed later merges: some rule consumes a prior join
    joined = {a + b for a, b in merges}
    assert any(a in joined or b in joined for a, b in merges)
    # every learned rule's joined form appears in some final segmentation
    seen = {s for r in words.select("syms").collect() for s in r["syms"]}
    assert sum((a + b) in seen for a, b in merges) >= len(merges) // 2


def test_bpe_train_early_stop_and_checkpoint(spark):
    """A tiny corpus exhausts its pairs: training stops early rather
    than looping; deep runs (past the checkpoint cadence) still match
    the reference exactly."""
    tiny = spark.createDataFrame([("ab ab",), ("ab",)], ["text"])
    merges, words = bpe_train(tiny, n_merges=50, min_pair_count=2,
                              checkpoint_every=2)
    ref_merges, ref_words, _, _ = _reference_bpe(["ab ab", "ab"], 50)
    assert merges == ref_merges
    assert len(merges) < 50
    got = {r["word"]: tuple(r["syms"]) for r in words.collect()}
    assert got == dict(ref_words)
