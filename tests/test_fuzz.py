"""Crash-robustness fuzz: adversarial CSV content through detection and
the matching processor must never raise — everything lands in clean or
dirty, like the reference's try/catch-per-row contract."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from airline_data_warehouse_spark import etl
from airline_data_warehouse_spark.sources.csv import read_detected

CELL = st.text(alphabet=st.characters(codec="ascii", min_codepoint=32,
                                      exclude_characters=',"\r\n'),
               max_size=12)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(CELL, CELL, CELL, CELL), min_size=30, max_size=30))
def _fuzz_rows(rows):
    return rows  # materialized by the caller-level test


def test_fuzzed_passenger_csv(spark, tmp_path):
    import random
    rnd = random.Random(1234)
    alphabet = "Pabc019 $.-'@#"
    lines = ["PassengerKey,FullName,Email,LoyaltyStatus"]
    for i in range(200):
        cells = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 12)))
                 for _ in range(rnd.randint(1, 6))]
        lines.append(",".join(cells))
    p = tmp_path / "fuzz_passengers.csv"
    p.write_text("\n".join(lines) + "\n")
    # the CSV reader skips fully-blank lines (csv-parser does the same)
    n_nonblank = sum(1 for ln in lines[1:] if ln.strip())
    sig, raw = read_detected(spark, str(p))
    assert sig.file_type == "passengers"
    clean, dirty = etl.process_passengers(raw)
    n_clean, n_dirty = clean.count(), dirty.count()
    assert n_clean + n_dirty == n_nonblank  # conservation: nothing lost or crashed
    # clean keys always canonical
    for r in clean.collect():
        assert r["passenger_key"].startswith("P") and len(r["passenger_key"]) == 4
        assert "@" in r["email"]
        assert r["loyalty_status"] in ("Bronze", "Silver", "Gold", "Platinum")


def test_fuzzed_sales_csv(spark, tmp_path):
    import random
    rnd = random.Random(99)
    alphabet = "P0123456789-/$., aZ"
    header = "TransactionID,TransactionDate,PassengerID,FlightID,TicketPrice,Taxes,BaggageFees,TotalAmount"
    lines = [header]
    for i in range(200):
        cells = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 10)))
                 for _ in range(8)]
        lines.append(",".join(cells))
    p = tmp_path / "fuzz_sales.csv"
    p.write_text("\n".join(lines) + "\n")
    sig, raw = read_detected(spark, str(p))
    assert sig.file_type == "travel_agency_sales"
    clean, dirty = etl.process_sales(raw, "travel_agency")
    assert clean.count() + dirty.count() == 200
    for r in clean.collect():
        assert r["transaction_id"].startswith("TA")
        assert r["ticket_price"] is not None  # bad amounts → 0.00, never null
        assert 19000101 <= r["date_key"] <= 21001231


def test_fuzzed_documents_through_text_suite(spark):
    """Adversarial document content — control chars, emoji, RTL, huge
    single tokens, pathological whitespace, nulls, empties — must flow
    through every text operator without crashing, with stable schemas
    and no surprise rows for null/empty docs."""
    from airline_data_warehouse_spark.operators import dedup as dd
    from airline_data_warehouse_spark.operators import text as tx

    rows = [
        (1, "normal words here"),
        (2, ""),
        (3, None),
        (4, " \t\n  "),
        (5, "x" * 5000),                       # one huge token
        (6, ("a " * 3000).strip()),            # many tiny tokens
        (7, "emoji 🙂🙃 and ​zero​width"),
        (8, "עברית rtl مع العربية mixed"),
        (9, "ctrl\x01chars\x7fhere"),
        (10, "quotes \"inside\" and 'more' | pipes, commas"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # every filtering operator drops NULL text; lang_id is the one
    # documented exception (a null/empty doc classifies as 'und' — its
    # certified oracle shares that behavior)
    ops = [
        tx.token_stats(docs),
        tx.quality_score(docs),
        tx.model_quality_score(docs),
        tx.vocab_table(docs, id_col="doc_id", min_count=1),
        tx.chunk_documents(docs),
        tx.repeated_ngram_spans(docs, w=3),
        tx.bigram_logprob_score(docs),
        tx.keyword_search_all(docs, ["normal"]),
        dd.exact_dedup(docs.filter("text is not null")),
    ]
    for df in ops:
        rows_out = df.collect()  # must not throw
        ids = {r["doc_id"] for r in rows_out if "doc_id" in r.asDict()}
        assert 3 not in ids  # null text never leaks through
    lang = {r["doc_id"]: r["predicted_lang"] for r in
            tx.lang_id(docs).collect()}
    assert lang[3] == "und" and lang[2] == "und"
    enc = tx.encode_documents(
        docs, tx.vocab_table(docs, id_col="doc_id", min_count=1)).collect()
    assert 3 not in {r["doc_id"] for r in enc}


def test_adversarial_embeddings(spark):
    """Vector-poisoning contract, pinned: NaN sorts above every real in
    Spark AND DuckDB, so unguarded cosine top-k would rank a poisoned
    vector FIRST — since r08 every scoring operator excludes
    non-finite / zero-norm vectors at entry (similarity._finite_ok), so
    the poisoned corpus ranks clean WITHOUT a manual pre-filter;
    `finite_vectors` additionally removes wrong-dimension vectors
    (scoring can't know the expected width — vec 6 still scores, as
    NULL, without it), and an IVF index built from poisoned input never
    ingests any garbage class."""
    import math

    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.operators import similarity as sim

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [float("nan"), 1.0]),
            (4, [float("inf"), 0.0]), (5, [0.0, 0.0]), (6, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 1)

    # the hazard the guard exists for, demonstrated on the raw scores:
    # an UNguarded cosine ranks the NaN vector first in both engines
    naive = (F.broadcast(q.select(F.col("vec_id").alias("query_id"),
                                  F.col("embedding").alias("qv")))
             .crossJoin(df.select(F.col("vec_id").alias("neighbor_id"),
                                  F.col("embedding").alias("cv")))
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("neighbor_id", sim.cosine(F.col("qv"), F.col("cv"))
                     .alias("score"))
             .orderBy(F.col("score").desc()).collect())
    # both the NaN vector (3) and the Inf vector (4, whose cosine is
    # inf/inf = NaN) tie at NaN and outrank every real score
    assert math.isnan(naive[0]["score"]) and naive[0]["neighbor_id"] in (3, 4)

    # the guarded operator excludes NaN/Inf/zero-norm on its own; the
    # wrong-width vector 6 survives (scores NULL, sinks to the bottom)
    raw = sim.brute_force_topk(df, q, k=6).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in raw] == [2, 6]
    assert raw[0]["score"] is not None and raw[1]["score"] is None

    clean = sim.finite_vectors(df, dims=2)
    assert {r["vec_id"] for r in clean.collect()} == {1, 2}
    good = sim.brute_force_topk(clean, q, k=6).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in good] == [2]

    idx_rows = rows + [(10 + i, [1.0, 0.01 * i]) for i in range(4)]
    poisoned = spark.createDataFrame(idx_rows,
                                     "vec_id long, embedding array<double>")
    idx = "/tmp/fuzz_ivf"
    import shutil
    shutil.rmtree(idx, ignore_errors=True)
    sim.ivf_index_build(poisoned, idx, k=2, iters=1)
    stored = {r["vec_id"] for r in
              spark.read.parquet(f"{idx}/lists.parquet").collect()}
    assert stored & {3, 4, 5, 6} == set()     # garbage never indexed
