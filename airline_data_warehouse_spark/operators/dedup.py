"""Deduplication operators for large-scale text corpora.

Exact dedup here; MinHash/SimHash/n-gram-Jaccard/embedding near-dup in
this module too (added incrementally). Design rules for 100 TB:

* group/shuffle on fixed-width digests (md5 → 2×64-bit halves), never on
  raw document text;
* candidate generation is always index-based (banding / shared-shingle
  inverted index), never an all-pairs cross join;
* everything is a declarative plan — AQE handles skewed bucket sizes.
"""

from __future__ import annotations

import logging
from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.hashing import (
    BAND_ROWS,
    DEFAULT_SHINGLE_K,
    LSH_BANDS,
    N_HASHES,
    SIMHASH_BITS,
    hashed_shingle_set,
    minhash_signature,
    rehash60,
)

SIMHASH_MAX_HAMMING = 3  # default near-dup budget (Manku et al. use 3 on 64 bits)

_LOG = logging.getLogger(__name__)

# DataFrames persisted by operators in this module, so long-lived sessions
# (bench loops, driver sweeps) can release executor memory between queries.
# The persists are load-bearing — each cached plan is consumed by both
# sides of a self-join — but the cache's lifetime is one query, not the
# session, so callers running many queries call release_caches() after
# each action completes.
_LIVE_CACHES: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    _LIVE_CACHES.append(df.persist())
    return df


def _release_one(df: DataFrame) -> None:
    """Unpersist ONE frame created via _persist and drop it from the
    registry — for bounded-iteration loops where round i's frame is
    dead the moment round i+1's cache has materialized (VERDICT r11
    item 4: at 20+ iterations the dead frames are pure executor-memory
    pressure). Callers must only release a frame whose successor has
    actually materialized (an action ran), or the lineage recompute
    cascades right back through it."""
    try:
        _LIVE_CACHES.remove(df)
    except ValueError:
        pass  # already released (or never registered) — idempotent
    try:
        df.unpersist()
    except Exception:
        _LOG.warning("unpersist failed during _release_one",
                     exc_info=True)


def release_caches() -> None:
    """Unpersist every cache created by this module's operators. Safe to
    call at any time; blocking=False so it never stalls the caller.

    GLOBAL teardown: it assumes one query runs at a time on the driver
    (true for the bench/driver/test harnesses here). Callers interleaving
    queries on one SparkSession should wrap each query in `cache_scope()`
    instead, which releases only the caches that query created."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            # best-effort teardown (session may already be stopped), but
            # never silent: a live-session unpersist failure is a leak
            _LOG.warning("unpersist failed during release_caches",
                         exc_info=True)


@contextmanager
def cache_scope():
    """Scoped cache ownership: releases exactly the caches created inside
    the block, leaving caches owned by other in-flight queries alone.

        with cache_scope():
            ngram_jaccard_pairs(df).write...   # caches freed on exit

    Scopes nest (inner scopes release their own tail first). Driver-side
    registries are not thread-safe; concurrent queries must come from
    separate driver threads only if each wraps its own scope around a
    GIL-serialized registry — the practical guidance is one scope per
    query on the main driver thread."""
    mark = len(_LIVE_CACHES)
    try:
        yield
    finally:
        tail = _LIVE_CACHES[mark:]
        del _LIVE_CACHES[mark:]
        for df in tail:
            try:
                df.unpersist()
            except Exception:
                _LOG.warning("unpersist failed during cache_scope exit",
                             exc_info=True)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct text value.

    Shuffles on md5(text) (fixed 32-byte key) and computes min(id) per
    group with map-side partial aggregation — one narrow shuffle, no
    window over the full corpus. Returns (id_col, text_hash).
    """
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    keepers = hashed.groupBy("text_hash").agg(F.min(id_col).alias(id_col))
    return keepers.select(id_col, "text_hash")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All rows that belong to a duplicate group, tagged with the group's
    representative (lowest id) — the audit-report companion to exact_dedup."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return (hashed
            .withColumn("group_size", F.count("*").over(w))
            .withColumn("representative", F.min(id_col).over(w))
            .filter(F.col("group_size") > 1))


def shingled(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """(id, hs): distinct 31-bit shingle-hash set per doc; empty docs
    dropped. The one shared representation for MinHash / SimHash /
    Jaccard (see hashing.hashed_shingle_set).

    Repartitions on the id before the md5-heavy derivation: shingling is
    CPU-bound, so parallelism must track cores, not input splits — a
    small-file scan would otherwise pin the whole corpus hash on one or
    two tasks (and on a cluster, the id-keyed exchange also evens out
    document-length skew)."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    # filter on text length BEFORE the projection: a filter on size(hs)
    # would be collapsed into the projection and evaluate the whole
    # md5 cascade twice (alias inlining), doubling the dominant cost.
    return (df.filter(F.length(text_col) >= k)
              .repartition(cores * 2, F.col(id_col))
              .select(F.col(id_col), hashed_shingle_set(F.col(text_col), k).alias("hs")))


def minhash_band_table(shingle_sets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key) LSH band table from a `shingled` frame: the
    N_HASHES min-hash signature split into LSH_BANDS bands of BAND_ROWS
    rows, one row per (doc, band). This is the frame a production
    pipeline materializes as its signature store — dedup against it
    never rescans corpus text."""
    sig = shingle_sets.select(
        id_col, *[c.alias(f"h{i}") for i, c in
                  enumerate(minhash_signature("hs"))])
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"h{b * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              F.concat_ws("_", *cols).alias("band_key")))
    return (sig.select(id_col, F.explode(F.array(*bands)).alias("bk"))
               .select(id_col, "bk.band", "bk.band_key"))


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = DEFAULT_SHINGLE_K,
                           shingle_sets: DataFrame | None = None) -> DataFrame:
    """MinHash + banded LSH candidate pairs (id1 < id2).

    shingle-hash set -> N_HASHES min-hashes -> LSH_BANDS bands of BAND_ROWS
    rows -> explode by band -> self-equi-join on (band, band_key). The join
    shuffles on the band key, never an all-pairs cross product - candidate
    volume scales with bucket collisions, not corpus^2.
    """
    sh = shingled(df, text_col, id_col, k) if shingle_sets is None else shingle_sets
    # Persist the exploded band table: the self-join would otherwise
    # evaluate the whole shingle->md5->signature subtree twice. This is
    # the scale-safe thing to cache - LSH_BANDS rows x ~50 bytes per doc,
    # orders of magnitude smaller than the corpus (at warehouse scale
    # you'd materialize signatures as a table instead).
    exploded = _persist(minhash_band_table(sh, id_col))
    a = exploded.alias("a")
    b_ = exploded.alias("b")
    return (a.join(b_, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id1"),
                     F.col(f"b.{id_col}").alias("id2"))
             .distinct())


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = DEFAULT_SHINGLE_K, threshold: float = 0.6) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified with exact Jaccard
    over the shingle-hash sets (>= threshold) - the standard
    candidate-then-verify near-dup pipeline (MinHash recall, set-exact
    precision modulo 31-bit hash collisions)."""
    # persist: candidate generation and both pair sides reuse the sets,
    # and shingling (substring explosion + md5) dominates the cost
    sh = _persist(shingled(df, text_col, id_col, k))
    cand = minhash_lsh_candidates(df, text_col, id_col, k, shingle_sets=sh)
    # verify via the shared barrier join (_verified_jaccard_pairs): the
    # shuffle_hash discipline on the array sides (in-heap hash-map
    # expansion 4-8x shuffle bytes defeats AQE's broadcast size check —
    # the r07 8x probe OOM) and the compute-once barrier both live there.
    return _verified_jaccard_pairs(cand, sh, sh, "id1", "id2",
                                   id_col, threshold)


def _i32(col: str) -> F.Column:
    """Shingle hashes are 31-bit by construction (mod 2^31-1) but ride
    in array<long>: cast to array<int> at the verify-join boundary so
    the candidate-proportional array shuffle — the dominant cost of
    every Jaccard verify (1.6 GB for the exact join at sf0.1, measured)
    — ships half the bytes. Values are preserved exactly; MinHash/
    SimHash arithmetic upstream keeps the long form it needs."""
    return F.col(col).cast("array<int>")


def _verified_jaccard_pairs(cand: DataFrame, sh_left: DataFrame,
                            sh_right: DataFrame, c1: str, c2: str,
                            id_col: str, threshold: float) -> DataFrame:
    """The exact-Jaccard verify join shared by every candidate-then-
    verify dedup operator: attach both shingle sets to each candidate
    pair (shuffle_hash — corpus-proportional array sides never reach a
    broadcast build, the r07 rule; arrays ship as int32, `_i32`),
    compute the intersection ONCE per pair, and apply the threshold
    filter ABOVE a persist barrier.

    The barrier is the r16 fix for a measured 1.7× verify overhead
    (guide §1.2 per-task work): written as join → withColumn(jaccard)
    → filter, Catalyst pushes the threshold predicate back INTO the
    join condition, where size(array_intersect(sh1, sh2)) appears twice
    (score numerator + union denominator) and join-condition evaluation
    has no common-subexpression elimination — every candidate pair paid
    the dominant intersect kernel twice, and survivors paid it twice
    more in the output projection (plans/r16/dedup_prefix_filter_exact_
    before.txt node 58: the full round(...) expression sits in the
    ShuffledHashJoin condition AND the Project). The persisted frame is
    candidate-proportional ids+score only (~24 B/row, memory+disk
    storage level, freed by release_caches/cache_scope) — traded
    against halving the per-candidate verify CPU.

    Output: (c1, c2, jaccard) with jaccard = round(|x∩y|/|x∪y|, 6)
    ≥ threshold — expression-identical to the pre-r16 inline form.
    """
    s1 = (sh_left.select(F.col(id_col).alias(c1), _i32("hs").alias("sh1"))
          .hint("shuffle_hash"))
    s2 = (sh_right.select(F.col(id_col).alias(c2), _i32("hs").alias("sh2"))
          .hint("shuffle_hash"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    scored = _persist(
        cand.join(s1, c1).join(s2, c2)
            .select(c1, c2,
                    F.round(inter.cast("double") / union, 6)
                     .alias("jaccard")))
    return scored.filter(F.col("jaccard") >= threshold)


def prefix_filter_jaccard_pairs(df: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id",
                                k: int = DEFAULT_SHINGLE_K,
                                threshold: float = 0.6) -> DataFrame:
    """EXACT all-pairs Jaccard similarity join via prefix filtering — the
    AllPairs/SSJoin family (Chaudhuri et al., "A Primitive Operator for
    Similarity Joins", ICDE'06; Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07). The exact-algorithm complement of the
    MinHash-LSH path: LSH trades false negatives for speed, prefix
    filtering guarantees the complete answer — every pair with
    J(x, y) >= threshold is emitted, with no probabilistic recall caveat.

    Why it scales: order every shingle set by GLOBAL token frequency,
    rarest first. A pair with J >= t must share at least one token among
    the first ``|x| - ceil(t*|x|) + 1`` tokens of each set (if the
    prefixes were disjoint, the overlap is at most the suffix length
    ceil(t*|x|) - 1 < t*|x| <= the required intersection). So candidate
    generation is an inverted-index equi-join on PREFIX tokens only —
    and because the ordering puts the rarest tokens in the prefix, the
    postings lists being joined are the shortest ones in the corpus.
    Never all-pairs; candidate volume tracks prefix-postings collisions.

    Pruning bounds are computed in DECIMAL so they are exact: with
    double math, 0.6*5 = 3.0000000000000004 and ceil() of it drops a
    true J = 3/5 subset pair — a silent false negative that only shows
    up on adversarial set sizes. The trailing verify join removes prefix
    false positives, so the output is exactly { (x, y) : J >= t }.

    The global frequency table grows with vocabulary (Heaps' law), so it
    joins shuffle_hash, never broadcast — same rule as tf_idf (r07).

    r16 (guide §2.3, shuffle/compute fewer candidate rows): the
    candidate join is Bayardo-ASYMMETRIC (AllPairs' indexing prefix,
    WWW'07 §3.1). Order every pair by set size — (n, id) lexicographic,
    the larger set is the PROBE, the smaller the INDEXED side. The
    probe still needs the full Jaccard prefix |x| − ⌈t·|x|⌉ + 1 (its
    partner may be as small as t·|x|), but the indexed side's partners
    are all ≥ its own size, so its required overlap is
    α ≥ ⌈2t/(1+t)·|y|⌉ and its prefix shortens to
    |y| − ⌈2t/(1+t)·|y|⌉ + 1 (at t = 0.6: 25% of the set instead of
    40%). Soundness is the standard prefix-share lemma: if
    |x∩y| ≥ α(x,y) = ⌈t/(1+t)(|x|+|y|)⌉ then the first |x|−α+1 tokens
    of x and the first |y|−α+1 of y (same global order) share a token;
    |x| ≥ |y| gives α ≥ ⌈t·|x|⌉ AND α ≥ ⌈2t/(1+t)·|y|⌉, so both actual
    prefixes contain those bounds. Per-token candidate volume drops
    from plen² to plen_probe × plen_indexed (measured at sf0.1:
    78.6M → 49M raw match rows, 2.61M → 1.63M distinct candidates),
    and the verify join shrinks proportionally. The emitted pair
    re-orients to the canonical (lesser id, greater id) afterward.
    """
    from decimal import Decimal

    t = F.lit(Decimal(str(threshold)).quantize(Decimal("0.000001")))
    sh = _persist(shingled(df, text_col, id_col, k))
    tok = sh.select(F.col(id_col), F.size("hs").alias("n"),
                    F.explode("hs").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    # rank each doc's tokens rarest-first; (df_t, t) is a total order so
    # both join sides agree on every doc's prefix deterministically
    pos = F.row_number().over(Window.partitionBy(id_col).orderBy("df_t", "t"))
    prefix = _persist(
        tok.join(freq.hint("shuffle_hash"), "t")
           .withColumn("pos", pos)
           .filter(F.col("pos") <= F.col("n") - F.ceil(t * F.col("n")) + 1)
           .select(id_col, "n", "t", "pos"))
    # indexed-side prefix cut: pos <= n - ceil(2t·n/(1+t)) + 1, computed
    # EXACTLY in integer units (2t·n/(1+t) is not a finite decimal, so
    # never divide decimals: with S = 1e6, p = 2·t·n·S and q = (1+t)·S
    # are exact integers and ceil(p/q) = (p + q − 1 − (p+q−1) mod q)/q —
    # the triangle_counts DECIMAL(38,0) integer-division discipline).
    s_units = 10 ** 6
    p_int = (F.lit(2).cast("decimal(38,0)")
             * F.lit(int(Decimal(str(threshold))
                         .quantize(Decimal("0.000001")) * s_units))
             .cast("decimal(38,0)")
             * F.col("n").cast("decimal(38,0)"))
    q_int = F.lit(int((Decimal("1") + Decimal(str(threshold))
                       .quantize(Decimal("0.000001"))) * s_units)) \
        .cast("decimal(38,0)")
    num = p_int + q_int - F.lit(1).cast("decimal(38,0)")
    alpha_min = ((num - num % q_int) / q_int).cast("long")
    a = prefix.select(F.col(id_col).alias("id1"), F.col("n").alias("n1"),
                      F.col("pos").alias("p1"), "t")
    b = (prefix.filter(F.col("pos") <= F.col("n") - alpha_min + 1)
         .select(F.col(id_col).alias("id2"), F.col("n").alias("n2"),
                 F.col("pos").alias("p2"), "t"))
    # PPJoin positional filter (Xiao et al., WWW'08): a shared token at
    # ranks (p1, p2) bounds the overlap by ub = 1 + min(n1-p1, n2-p2)
    # (only suffix tokens can still match), and J >= t needs overlap
    # >= t*(n1+n2)/(1+t). ub shrinks with position, so filtering every
    # matched-token row keeps a pair iff its EARLIEST shared token
    # qualifies — sound, and on low-entropy corpora (templated text,
    # where prefix tokens stop being rare) it is the difference between
    # near-all-pairs and a usable candidate set: 125,775 -> 23,387 on
    # the sf0.01 fixture. Stated multiplicatively — ub*(1+t) >= t*(n1+n2)
    # — because decimal multiply is exact while t/(1+t) would round.
    ub = F.lit(1) + F.least(F.col("n1") - F.col("p1"),
                            F.col("n2") - F.col("p2"))
    # pair order: (n2, id2) <lex (n1, id1) — the indexed side is the
    # smaller set of the pair; ties break by id so each unordered pair
    # is generated exactly once
    probe_is_larger = ((F.col("n2") < F.col("n1"))
                       | ((F.col("n2") == F.col("n1"))
                          & (F.col("id2") < F.col("id1"))))
    cand = (a.join(b, "t")
             .filter(probe_is_larger
                     # length filter: J >= t forces t*max(|x|,|y|) <= min
                     & (F.col("n2") >= t * F.col("n1"))
                     & (ub * (1 + t) >= t * (F.col("n1") + F.col("n2"))))
             .select(F.least("id1", "id2").alias("id1"),
                     F.greatest("id1", "id2").alias("id2"))
             .distinct())
    return _verified_jaccard_pairs(cand, sh, sh, "id1", "id2",
                                   id_col, threshold)


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = DEFAULT_SHINGLE_K,
                      threshold: float = 0.9) -> DataFrame:
    """EXACT all-pairs set-CONTAINMENT join: every unordered pair with
    C(x, y) = |x ∩ y| / min(|x|, |y|) >= threshold, reported as
    (id_small, id_big, containment) with the smaller shingle set first.

    Why this exists next to the Jaccard family: containment is the
    quote-inclusion / near-superset detector. A short document embedded
    verbatim inside a much longer one has containment ~1.0 but Jaccard
    ~|small|/|big| — arbitrarily far below any Jaccard threshold, so
    both the LSH path and the exact Jaccard join are structurally blind
    to it (MinHash collision probability IS Jaccard). Training-data
    pipelines care: boilerplate-wrapped reposts and quoted passages are
    exactly this shape (cf. Broder 1997's resemblance/containment
    split).

    Same AllPairs skeleton as prefix_filter_jaccard_pairs, asymmetric:
    C >= t needs overlap >= t*|small|, so the SMALLER side must share a
    token among its first |s| - ceil(t*|s|) + 1 frequency-rarest tokens
    — joined against the FULL inverted index of every candidate larger
    set ("smaller" = (n, id) lexicographic, so ties pair exactly once).
    The PPJoin-style positional bound 1 + min(n1-p1, n2-p2) >= t*n1
    prunes matched-token rows before the pair distinct. No length
    filter — containment has none, which is the point. Bounds are
    DECIMAL-exact (see prefix_filter_jaccard_pairs on why double ceil
    silently drops boundary pairs). Verify is set-exact over the
    shingle sets; the DuckDB oracle generates candidates independently
    (any-shared-token join, no prefix/positional pruning), so a hash
    match certifies the pruning emitted the complete answer.

    Scale shape: candidate volume = sum over smaller-side prefix tokens
    of their posting-list length — prefix tokens are each doc's rarest,
    so the joined postings are the corpus's shortest; never corpus².
    Frequency table joins shuffle_hash (Heaps'-law growth, same rule as
    tf_idf); verify arrays ship as int32.
    """
    from decimal import Decimal

    t = F.lit(Decimal(str(threshold)).quantize(Decimal("0.000001")))
    sh = _persist(shingled(df, text_col, id_col, k))
    tok = sh.select(F.col(id_col), F.size("hs").alias("n"),
                    F.explode("hs").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    pos = F.row_number().over(Window.partitionBy(id_col).orderBy("df_t", "t"))
    ranked = _persist(tok.join(freq.hint("shuffle_hash"), "t")
                         .withColumn("pos", pos)
                         .select(id_col, "n", "t", "pos"))
    a = (ranked.filter(F.col("pos") <= F.col("n") - F.ceil(t * F.col("n")) + 1)
               .select(F.col(id_col).alias("id_small"), F.col("n").alias("n1"),
                       F.col("pos").alias("p1"), "t"))
    b = ranked.select(F.col(id_col).alias("id_big"), F.col("n").alias("n2"),
                      F.col("pos").alias("p2"), "t")
    smaller = (F.col("n1") < F.col("n2")) | \
              ((F.col("n1") == F.col("n2")) & (F.col("id_small") < F.col("id_big")))
    ub = F.lit(1) + F.least(F.col("n1") - F.col("p1"),
                            F.col("n2") - F.col("p2"))
    cand = (a.join(b, "t")
             .filter(smaller & (ub >= t * F.col("n1")))
             .select("id_small", "id_big")
             .distinct())
    s1 = sh.select(F.col(id_col).alias("id_small"),
                   _i32("hs").alias("sh1")).hint("shuffle_hash")
    s2 = sh.select(F.col(id_col).alias("id_big"),
                   _i32("hs").alias("sh2")).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    # compute-once barrier before the threshold filter — the
    # _verified_jaccard_pairs rationale (r16): without it Catalyst
    # pushes the containment predicate into the join condition and
    # every candidate pays array_intersect twice
    scored = _persist(
        cand.join(s1, "id_small").join(s2, "id_big")
            .select("id_small", "id_big",
                    F.round(inter.cast("double") / F.size("sh1"), 6)
                     .alias("containment")))
    return scored.filter(F.col("containment") >= threshold)


def incremental_minhash_pairs(corpus: DataFrame, increment: DataFrame,
                              text_col: str = "text", id_col: str = "doc_id",
                              k: int = DEFAULT_SHINGLE_K,
                              threshold: float = 0.6) -> DataFrame:
    """(inc_id, corpus_id, jaccard): increment documents that near-
    duplicate an EXISTING corpus document — the dedup shape a production
    ingest actually runs daily. A self-join over corpus+increment would
    re-candidate the whole historical corpus against itself on every
    batch; this joins only increment bands against corpus bands, so
    per-batch cost scales with |increment| × collision rate, not
    |corpus|².

    At warehouse scale the corpus band table is the persisted signature
    store (see minhash_band_table) and only the increment side is
    shingled fresh; here both derive from their frames. The band join
    shuffles on (band, band_key) — when the increment is small relative
    to shuffle cost, broadcast it by hinting the caller's frame.
    Increment-internal duplicates are NOT reported (run
    ngram_jaccard_pairs within the batch for those).
    """
    csh = _persist(shingled(corpus, text_col, id_col, k))
    ish = _persist(shingled(increment, text_col, id_col, k))
    cbands = minhash_band_table(csh, id_col).select(
        F.col(id_col).alias("corpus_id"), "band", "band_key")
    ibands = minhash_band_table(ish, id_col).select(
        F.col(id_col).alias("inc_id"), "band", "band_key")
    cand = (ibands.join(cbands, ["band", "band_key"])
                  .select("inc_id", "corpus_id")
                  .distinct())
    # shared barrier verify (_verified_jaccard_pairs): the shuffle_hash
    # no-driver-side-broadcast rule and the compute-once barrier both
    # live there (the increment side is hinted too because batch sizes
    # are caller-controlled)
    return _verified_jaccard_pairs(cand, ish, csh, "inc_id", "corpus_id",
                                   id_col, threshold)


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """60-bit SimHash per document: per bit position j, the ±1 votes of
    each (rehashed) shingle's bit j are summed; signature bit j is set
    iff the vote is positive. Wide signatures are what make hamming
    blocking work at scale (Manku/Jain/Sarma, "Detecting near-duplicates
    for web crawling", WWW 2007, use 64 bits; 60 here = the portable
    md5-prefix width).

    Shape: explode the shingle set to rows and hash-aggregate 60 bit-count
    SUMs per doc — higher-order array functions are interpreted, not
    whole-stage-codegen'd, so folding votes inside F.aggregate costs ~10×
    this plan. The explode adds no shuffle: `shingled` already partitions
    by the id, and the groupBy reuses that partitioning. Vote rule:
    bit j set iff 2·ones_j > n_shingles (±1 sum positive)."""
    sh = shingled(df, text_col, id_col, k)
    ex = sh.select(F.col(id_col),
                   F.explode(F.transform(F.col("hs"), rehash60)).alias("h60"))
    # the 60 bit-count sums (one struct-of-aggregates) and the 60-branch
    # signature assembly are generated as TWO parsed SQL strings: built
    # expression-object-by-object they cost ~8 py4j round trips per bit
    # (~2 s of driver time per plan construction, measured r06) for the
    # identical expression tree
    ones = F.expr("struct(" + ",".join(
        f"sum(shiftright(h60, {j}) & 1) AS _b{j}"
        for j in range(SIMHASH_BITS)) + ") AS _bs")
    votes = ex.groupBy(id_col).agg(F.count("*").alias("_n"), ones)
    sig = F.expr("cast(0 AS BIGINT) + " + " + ".join(
        f"(CASE WHEN _bs._b{j} * 2 > _n THEN {1 << j}L ELSE 0L END)"
        for j in range(SIMHASH_BITS)))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_buckets(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """SimHash bucket report: signature → member count + representative."""
    return (simhash_signatures(df, text_col, id_col, k)
            .groupBy("simhash")
            .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("representative")))


def simhash_chunks(bits: int, parts: int) -> list[tuple[int, int]]:
    """(offset, width) per chunk, splitting `bits` into `parts` contiguous
    bit-ranges as evenly as possible (widths differ by at most 1)."""
    base, rem = divmod(bits, parts)
    out, off = [], 0
    for i in range(parts):
        w = base + (1 if i < rem else 0)
        out.append((off, w))
        off += w
    return out


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = DEFAULT_SHINGLE_K,
                       max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs (id1 < id2, hamming <= max_hamming) over 60-bit
    SimHash signatures — the multi-probe upgrade over hamming-0 bucketing.

    Pigeonhole chunk blocking instead of bit-flip enumeration: split the
    signature into max_hamming+1 contiguous bit-chunks; any pair within
    the hamming budget agrees exactly on at least one chunk (h flipped
    bits cannot touch h+1 chunks). Candidates come from per-chunk
    equi-joins — max_hamming+1 exploded rows per doc, then
    bit_count(xor) verifies. Chunk cardinality is what keeps the
    per-chunk self-join sub-quadratic: at the default h<=3 each chunk is
    15 bits (32k values), so expected bucket size is n/2^15 — this is
    exactly why the signature is 60 bits wide, a 16-bit signature's
    5-bit chunks would make every bucket O(n/32) and the join O(n²).
    """
    from airline_data_warehouse_spark.operators.hashing import SIMHASH_BITS

    sigs = simhash_signatures(df, text_col, id_col, k)
    return hamming_near_pairs(sigs, "simhash", id_col, SIMHASH_BITS,
                              max_hamming)


def hamming_near_pairs(sigs: DataFrame, sig_col: str, id_col: str,
                       bits: int, max_hamming: int) -> DataFrame:
    """Generic pigeonhole near-pair join over integer signatures — the
    chunk-blocking core shared by text SimHash and image average-hash
    (operators/multimodal.py): split `bits` into max_hamming+1 chunks,
    equi-join per chunk, verify with bit_count(xor). Works for full
    64-bit (possibly sign-negative) signatures: arithmetic shiftright's
    sign extension only touches bits above each chunk's mask width, so
    chunk values stay exact, and bit_count(xor) covers the sign bit."""
    parts = max_hamming + 1
    chunk_cols = []
    for i, (off, w) in enumerate(simhash_chunks(bits, parts)):
        # w == 64 (single chunk, e.g. max_hamming=0 over 64-bit sigs as
        # an exact-dup screen): (1 << 64) - 1 overflows int64 and the
        # literal becomes a decimal that breaks bitwiseAND — mask with
        # -1 (all bits set in two's complement) instead (ADVICE r07)
        mask = -1 if w == 64 else (1 << w) - 1
        chunk = F.shiftright(F.col(sig_col), off).bitwiseAND(F.lit(mask))
        chunk_cols.append(F.struct(F.lit(i).alias("part"), chunk.alias("chunk")))
    # persist: the self-join consumes the banded table twice, and the
    # signature derivation (shingle md5 cascade + 60 bit-count sums) is
    # the dominant cost — without the cache it runs once per join side
    banded = _persist(sigs.withColumn("_bk", F.explode(F.array(*chunk_cols)))
                          .select(id_col, sig_col, "_bk.part", "_bk.chunk"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.part") == F.col("b.part"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id1"),
                     F.col(f"a.{sig_col}").alias("s1"),
                     F.col(f"b.{id_col}").alias("id2"),
                     F.col(f"b.{sig_col}").alias("s2"))
             .distinct())
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("int")
    return (cand.select("id1", "id2", hamming.alias("hamming"))
                .filter(F.col("hamming") <= max_hamming))


def connected_components(pairs: DataFrame, vertices: DataFrame,
                         id_col: str = "doc_id", max_iter: int = 25,
                         stats: dict | None = None) -> DataFrame:
    """(id_col, cluster_id) for every vertex: cluster_id = the minimum id
    reachable through the pair graph — the canonical final step of a
    near-dup pipeline (pairs → duplicate clusters → keep one doc each).

    Min-label propagation with pointer doubling: each round every vertex
    takes the min of its own label and its neighbors' labels (one edge
    hop), then jumps to its label's label (label-of-label — the
    "shortcutting" step of large-star/small-star, Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014). The hop
    alone needs diameter-many rounds; the doubling step halves the
    remaining pointer chains each round, so chains converge in O(log d)
    rounds — a 1000-link near-dup chain (templated docs edited
    incrementally) finishes in ~13 rounds, not 1000. The doubling
    self-join only engages after 3 hop-only rounds fail to converge:
    real near-dup components are almost always diameter 1-2, where
    shortcutting has nothing to shortcut and would just add a shuffle
    per round.

    Labels only ever decrease, so sum(label) is strictly monotone until
    the fixpoint — convergence is one cheap aggregate, no self-join
    diffing. The FIRST job materializes hops 1 and 2 together and
    collects s_0/s_1/s_2 in one combined aggregate, so a diameter-1
    graph (the overwhelming near-dup case: every cluster a star around
    its keeper) converges in a single driver barrier instead of three;
    deeper graphs continue one hop per job. If max_iter hops pass
    without reaching the fixpoint the function raises (silently
    returning split clusters would make downstream keep-one-per-cluster
    dedup keep duplicates undetectably); pass a larger max_iter for
    adversarially long chains.

    Driver involvement is one float per round (the convergence sum), not
    per-row data; each round is a distributed shuffle-join keyed on the
    vertex id. Each round's label table is local-checkpointed: the round
    body references the previous labels several times (the neighbor
    join, the fold, and both sides of the doubling self-join once it
    engages), so without lineage truncation the logical plan grows
    multiplicatively per round and the driver OOMs just *printing* it by
    round 6. The checkpoint is LAZY — the convergence aggregate is the
    action that materializes it, so each round costs exactly one job.
    Label blocks live on executors and are GC'd by the ContextCleaner
    when the round's frame drops. On a cluster where executor loss
    mid-query matters, swap in reliable `checkpoint()` with a
    checkpoint dir — same shape, durable blocks.
    """
    # Edges are local-checkpointed, not just persisted: they're consumed
    # once per round, so materializing once is right anyway. The
    # symmetric closure is emitted by a single explode, NOT a
    # union-of-two-selects: `pairs` arrives unpersisted from a full
    # minhash+verify pipeline, and a union would execute that whole
    # subtree once per branch — measured 5.4 s vs 2.8 s at sf0.1 after
    # the r07 shuffle_hash verify-join change made the subtree pricier.
    # (The loop also deliberately contains no Union: a round shaped as
    # union(labels, neighbor_labels).groupBy.min trips a Catalyst
    # constraint-rewrite crash — NoSuchElementException in
    # Union.rewriteConstraints — once the loop's self-referencing
    # lineage carries inferred constraints, e.g. from spark.range
    # sources. The join+least formulation below is equivalent and
    # constraint-safe.)
    edges = (pairs.select(F.explode(F.array(
                      F.struct(F.col("id1").alias("src"),
                               F.col("id2").alias("dst")),
                      F.struct(F.col("id2").alias("src"),
                               F.col("id1").alias("dst")))).alias("e"))
                  .select("e.src", "e.dst")
                  .localCheckpoint(eager=True))
    labels = (vertices.select(F.col(id_col).alias("v"),
                              F.col(id_col).cast("long").alias("label"))
                      .localCheckpoint(eager=False))

    def one_hop(cur: DataFrame, round_no: int) -> DataFrame:
        # 1-hop: per-vertex min over incoming neighbor labels, folded
        # into the vertex's own label with a left join + least
        nbr_min = (edges.join(cur, edges["src"] == cur["v"])
                        .groupBy("dst").agg(F.min("label").alias("_nl")))
        hop = (cur.join(nbr_min, cur["v"] == nbr_min["dst"], "left")
                  .select(F.col("v"),
                          F.least(F.col("label"),
                                  F.coalesce(F.col("_nl"), F.col("label")))
                           .alias("label")))
        # Pointer doubling engages only once plain hops have run 3 rounds
        # without converging (a long-chain graph): near-dup components are
        # overwhelmingly diameter 1-2, where the doubling self-join is a
        # pure per-round cost that can never shortcut anything.
        if round_no > 3:
            # pointer doubling: v's label <- min(label, label(label)).
            # Every label is itself a vertex id, so the lookup is a
            # self-join — worth its shuffle only on deep chains.
            x, y = hop.alias("x"), hop.alias("y")
            hop = (x.join(y, F.col("x.label") == F.col("y.v"), "left")
                    .select(F.col("x.v").alias("v"),
                            F.least(F.col("x.label"),
                                    F.coalesce(F.col("y.label"),
                                               F.col("x.label")))
                             .alias("label")))
        return hop.localCheckpoint(eager=False)

    # First job: TWO hops + three sums in one combined aggregate. A
    # diameter-1 component graph — the overwhelming near-dup shape (each
    # cluster a star around its keeper) — converges here in a single
    # driver barrier: hop 1 propagates, hop 2 confirms, and s_0/s_1/s_2
    # arrive together. Deeper graphs continue one hop per job below (a
    # speculative second hop there would mostly compute a discarded
    # doubling self-join).
    hop1 = one_hop(labels, 1)
    hop2 = one_hop(hop1, 2)
    row = (hop1.agg(F.sum("label").alias("s_1"))
               .crossJoin(hop2.agg(F.sum("label").alias("s_2")))
               .crossJoin(labels.agg(F.sum("label").alias("s_0")))
               .collect()[0])
    converged = False
    if row["s_0"] is None:  # empty vertex set: trivially converged
        converged, rounds = True, 0
    elif row["s_1"] == row["s_0"]:
        labels, converged, rounds = hop1, True, 1
    elif row["s_2"] == row["s_1"]:
        labels, converged, rounds = hop2, True, 2
    else:
        labels, prev_sum, rounds = hop2, row["s_2"], 2
    while rounds < max_iter and not converged:
        rounds += 1
        new_labels = one_hop(labels, rounds)
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the pair graph has a longer chain than expected — rerun with "
            "a larger max_iter (rounds needed ~ log2(chain length))")
    return labels.select(F.col("v").alias(id_col), F.col("label").alias("cluster_id"))


def cascade_store_build(docs: DataFrame, emb: DataFrame, store_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        vec_col: str = "embedding",
                        overwrite: bool = False) -> None:
    """Materialize the accumulated-corpus dedup state the three-tier
    cascade needs, so a daily ingest (see `incremental_cascade`) never
    rescans or re-shingles corpus text / re-hashes corpus vectors:

    * ``hashes``    — (text_md5, keeper): exact-tier lookup, keeper =
      lowest corpus doc_id per distinct text (the cascade's keep-rule).
    * ``bands``     — the MinHash LSH band table (minhash_band_table):
      lexical-tier candidates come from an increment-bands ⋈
      store-bands join, cost ∝ |increment| × collision rate.
    * ``shingles``  — (doc_id, hs int32): the exact-Jaccard verify side.
    * ``emb_bands`` — hyperplane band keys (4 bands × 8 sign bits, the
      embedding_near_dup_pairs family) of the corpus vectors.
    * ``vectors``   — (vec_id, v, n): finite, nonzero-norm corpus
      vectors with hoisted norms for the semantic-tier exact-cosine
      verify.

    ``overwrite=False`` (the default used by the registry query) reuses
    an existing store — the daily-ingest contract is that the store is
    an output of YESTERDAY's run, amortized across batches; per-frame
    parquet writes go to the final paths in one action each, and the
    ``_built`` marker lands last, so a crashed build is rebuilt rather
    than half-read (the snapshot-commit marker convention). An
    ``overwrite=True`` rebuild DELETES the stale marker before touching
    any frame, so a mid-rebuild crash leaves a markerless —
    i.e. rebuildable — store instead of a half-new/half-old one the
    surviving marker would declare complete; the marker goes through
    the Hadoop FileSystem API (not driver-local open()/os.path), so the
    guard holds for non-local store_dirs too (ADVICE r08)."""
    import os

    from airline_data_warehouse_spark.operators import similarity as sim

    spark = docs.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(os.path.join(store_dir, "_built"))
    fs = marker.getFileSystem(conf)
    if fs.exists(marker):
        if not overwrite:
            return
        fs.delete(marker, False)
    d = docs.filter(F.col(text_col).isNotNull())
    (d.select(F.md5(text_col).alias("text_md5"), F.col(id_col))
      .groupBy("text_md5").agg(F.min(id_col).alias("keeper"))
      .write.mode("overwrite").parquet(os.path.join(store_dir, "hashes")))
    sh = _persist(shingled(d, text_col, id_col))
    (sh.select(id_col, _i32("hs").alias("hs"))
       .write.mode("overwrite").parquet(os.path.join(store_dir, "shingles")))
    (minhash_band_table(sh, id_col)
       .write.mode("overwrite").parquet(os.path.join(store_dir, "bands")))
    release_caches()
    ev = (emb.filter(sim._finite_ok(F.col(vec_col)))
             .select(F.col(id_col if id_col in emb.columns else "vec_id")
                     .alias("vec_id"),
                     F.transform(F.col(vec_col), lambda x: x.cast("double"))
                      .alias("v")))
    keys = sim.hyperplane_band_keys_sql("v", bands=4, rows_per_band=8)
    (ev.select("vec_id", F.posexplode(F.array(*keys)).alias("band", "band_key"))
       .select("vec_id", F.col("band").cast("int").alias("band"), "band_key")
       .write.mode("overwrite").parquet(os.path.join(store_dir, "emb_bands")))
    (ev.select("vec_id", "v", sim._norm(F.col("v")).alias("n"))
       .write.mode("overwrite").parquet(os.path.join(store_dir, "vectors")))
    out = fs.create(marker, True)
    out.write(bytearray(b"ok\n"))
    out.close()


def incremental_cascade(spark, store_dir: str, inc_docs: DataFrame,
                        inc_emb: DataFrame, threshold: float = 0.6,
                        cos_threshold: float = 0.99,
                        text_col: str = "text", id_col: str = "doc_id",
                        vec_col: str = "embedding") -> DataFrame:
    """The daily-ingest form of the three-tier dedup cascade: classify
    each INCREMENT document against the accumulated corpus STATE
    (`cascade_store_build`) — never against raw corpus text or vectors —
    with each tier consuming only the previous tier's survivors:

    1. exact    — md5(text) hits the store's hash table; partner = the
       stored keeper.
    2. near_dup — survivor bands ⋈ store bands (MinHash LSH), exact
       9-gram Jaccard ≥ threshold against store shingles; partner = the
       lowest matching corpus doc.
    3. semantic — survivor embeddings banded (hyperplane, 4×8) ⋈ store
       emb_bands, exact cosine ≥ cos_threshold against store vectors;
       partner = the lowest matching corpus vec (vec_id = doc_id by
       corpus convention).

    Returns (doc_id, verdict ∈ {exact, near_dup, semantic, kept},
    partner_id). 100 TB shape: every stage is increment-driven — the
    corpus appears only through its persisted signature stores, joined
    band-keyed or id-keyed, so the per-batch cost scales with
    |increment| × collision rate while corpus state grows append-only
    (the batch twin of streaming/dedup.start_neardup_ingest, with the
    semantic tier the stream variant doesn't have). Store-side verify
    frames are hinted shuffle_hash — corpus-proportional array payloads
    must never reach a broadcast build (SCALING.md r07).

    Cite: cascade semantics mirror plans/llmops.dedup_cascade (the
    from-scratch batch form); the driver certifies this operator's
    store-mediated answer equals DuckDB recomputing from raw tables."""
    import os

    # recursiveFileLookup: a store written by the STREAMING cascade
    # ingest is tiered (b{N}/ + c{lo}_{hi}/ subdirs, r15 — the shared-
    # state contract lets a stream and this batch job hand the same
    # dirs to each other); flat batch-built stores read identically
    def _rd(name: str):
        return (spark.read.option("recursiveFileLookup", "true")
                .parquet(os.path.join(store_dir, name)))

    hashes = _rd("hashes")
    bands = _rd("bands")
    shingles = _rd("shingles")
    emb_bands = _rd("emb_bands")
    vectors = _rd("vectors")
    return cascade_classify(inc_docs, inc_emb, hashes, bands, shingles,
                            emb_bands, vectors, threshold=threshold,
                            cos_threshold=cos_threshold, text_col=text_col,
                            id_col=id_col, vec_col=vec_col)


def cascade_classify(inc_docs: DataFrame, inc_emb: DataFrame,
                     hashes: DataFrame, bands: DataFrame,
                     shingles: DataFrame, emb_bands: DataFrame,
                     vectors: DataFrame, threshold: float = 0.6,
                     cos_threshold: float = 0.99, text_col: str = "text",
                     id_col: str = "doc_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Frame-level core of `incremental_cascade`, shared with the
    streaming `start_cascade_ingest` (which passes retention-filtered
    store reads): classify the increment against corpus-state FRAMES.
    ``hashes`` rows are (text_md5, keeper) and may contain several rows
    per hash (the streaming store appends one keeper per batch) — the
    exact-tier partner is the MIN keeper over matching rows, which
    reduces to the stored keeper when the table is pre-aggregated (the
    batch store build). Tier plumbing and scale posture as documented
    on `incremental_cascade`."""
    from airline_data_warehouse_spark.operators import similarity as sim

    inc = _persist(inc_docs.select(F.col(id_col), F.col(text_col)))

    # hash table is corpus-proportional: shuffle_hash, never broadcast
    matched = (inc.select(id_col, F.md5(text_col).alias("text_md5"))
               .join(hashes.hint("shuffle_hash"), "text_md5")
               .groupBy(id_col)
               .agg(F.min("keeper").alias("e_partner")))
    t1 = _persist(inc.select(id_col).join(matched, id_col, "left"))
    s1 = inc.join(t1.filter(F.col("e_partner").isNotNull()).select(id_col),
                  id_col, "left_anti")

    ish = _persist(shingled(s1, text_col, id_col))
    ibands = minhash_band_table(ish, id_col).select(
        F.col(id_col).alias("inc_id"), "band", "band_key")
    cbands = bands.select(F.col(id_col).alias("corpus_id"), "band",
                          "band_key")
    cand = (ibands.join(cbands, ["band", "band_key"])
                  .select("inc_id", "corpus_id").distinct())
    s_i = (ish.select(F.col(id_col).alias("inc_id"), _i32("hs").alias("sh1"))
              .hint("shuffle_hash"))
    s_c = (shingles
           .select(F.col(id_col).alias("corpus_id"), F.col("hs").alias("sh2"))
           .hint("shuffle_hash"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    # inner compute-once barrier before the threshold filter (the
    # _verified_jaccard_pairs rationale, r16) — the outer persist
    # serves the two downstream consumers as before
    j_scored = _persist(
        cand.join(s_i, "inc_id").join(s_c, "corpus_id")
            .select("inc_id", "corpus_id",
                    F.round(inter.cast("double") / union, 6)
                     .alias("jaccard")))
    near = _persist(
        j_scored.filter(F.col("jaccard") >= threshold)
            .groupBy(F.col("inc_id").alias(id_col))
            .agg(F.min("corpus_id").alias("n_partner")))
    s2 = s1.select(id_col).join(near.select(id_col), id_col, "left_anti")

    iv = (inc_emb.filter(sim._finite_ok(F.col(vec_col)))
          .select(F.col("vec_id").alias(id_col),
                  F.transform(F.col(vec_col), lambda x: x.cast("double"))
                   .alias("v"))
          .join(s2, id_col, "left_semi"))
    keys = sim.hyperplane_band_keys_sql("v", bands=4, rows_per_band=8)
    ivb = (iv.select(id_col,
                     F.posexplode(F.array(*keys)).alias("band", "band_key"))
             .select(id_col, F.col("band").cast("int").alias("band"),
                     "band_key"))
    cvb = emb_bands.select(F.col("vec_id").alias("corpus_id"), "band",
                           "band_key")
    vcand = (ivb.join(cvb, ["band", "band_key"])
                .select(id_col, "corpus_id").distinct())
    v_i = (iv.withColumn("n1", sim._norm(F.col("v")))
             .select(id_col, F.col("v").alias("v1"), "n1")
             .hint("shuffle_hash"))
    v_c = (vectors
           .select(F.col("vec_id").alias("corpus_id"),
                   F.col("v").alias("v2"), F.col("n").alias("n2"))
           .hint("shuffle_hash"))
    cos = F.round(sim._dot(F.col("v1"), F.col("v2"))
                  / (F.col("n1") * F.col("n2")), 6)
    # same compute-once barrier: pushed into the join condition the
    # 64-mult interpreted-HOF dot product would evaluate twice per
    # candidate (r16)
    c_scored = _persist(
        vcand.join(v_i, id_col).join(v_c, "corpus_id")
             .select(id_col, "corpus_id", cos.alias("score")))
    sem = (c_scored.filter(F.col("score") >= cos_threshold)
                   .groupBy(id_col)
                   .agg(F.min("corpus_id").alias("s_partner")))

    return (inc.select(id_col)
            .join(t1, id_col, "left")
            .join(near, id_col, "left")
            .join(sem, id_col, "left")
            .select(
                id_col,
                F.when(F.col("e_partner").isNotNull(), F.lit("exact"))
                 .when(F.col("n_partner").isNotNull(), F.lit("near_dup"))
                 .when(F.col("s_partner").isNotNull(), F.lit("semantic"))
                 .otherwise(F.lit("kept")).alias("verdict"),
                F.coalesce("e_partner", "n_partner", "s_partner")
                 .cast("long").alias("partner_id")))


def minhash_estimate_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """Estimator calibration for the MinHash family: for every LSH
    candidate pair, BOTH the MinHash Jaccard estimate (matching
    signature components / N_HASHES — the Broder 1997 unbiased
    estimator the banding's collision probability is built on) and the
    exact shingle-set Jaccard, side by side — the read that tunes
    band/row counts against a corpus (how tight is 16 permutations
    HERE?) and the sketch-calibration discipline the CMS/LC keys set
    (estimator and truth certified together).

    (id1, id2, est_jaccard, jaccard), both 6-dp. Deterministic: the
    pinned permutation family makes the estimate itself replayable
    bit-for-bit, not just in distribution.

    Scale shape: candidates from the banded join (collision-linear);
    the signature sides are N_HASHES longs per doc (fixed width —
    far smaller than the shingle arrays the exact side ships, which
    keep the shuffle_hash discipline of ngram_jaccard_pairs)."""
    sh = _persist(shingled(df, text_col, id_col, k))
    cand = minhash_lsh_candidates(df, text_col, id_col, k,
                                  shingle_sets=sh)
    sig = sh.select(id_col, *[c.alias(f"h{i}") for i, c in
                              enumerate(minhash_signature("hs"))])
    s1 = sig.select(F.col(id_col).alias("id1"),
                    *[F.col(f"h{i}").alias(f"a{i}")
                      for i in range(N_HASHES)])
    s2 = sig.select(F.col(id_col).alias("id2"),
                    *[F.col(f"h{i}").alias(f"b{i}")
                      for i in range(N_HASHES)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1)
                  .otherwise(0) for i in range(N_HASHES))
    v1 = sh.select(F.col(id_col).alias("id1"),
                   _i32("hs").alias("sh1")).hint("shuffle_hash")
    v2 = sh.select(F.col(id_col).alias("id2"),
                   _i32("hs").alias("sh2")).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (cand.join(s1, "id1").join(s2, "id2")
            .withColumn("est_jaccard",
                        F.round(matches / F.lit(float(N_HASHES)), 6))
            .join(v1, "id1").join(v2, "id2")
            .withColumn("jaccard",
                        F.round(inter.cast("double") / union, 6))
            .select("id1", "id2", "est_jaccard", "jaccard"))


# ---------------------------------------------------------------------------
# Cross-document exact-substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr method).
# The reference method builds a corpus-global suffix array; at 100 TB
# that is a global sort no cluster wants. The Spark-first shape instead:
# k-token window-hash inverted index -> same-hash CROSS-DOC hits
# (bucket-bounded, never corpus x corpus) -> per-(pair, diagonal)
# consecutive-run merge into MAXIMAL shared spans (a partitioned
# gaps-and-islands window) -> exact verify-join of the merged span text
# (the dedup family's verify-join discipline, closing the ~2^-60
# window-hash collision tail). Deterministic end to end, so fully
# oracle-able.
# ---------------------------------------------------------------------------

def _token_window_hashes(df: DataFrame, text_col: str, id_col: str,
                         k: int) -> DataFrame:
    """(id, pos, wh): the 60-bit md5 hash of every k-token window,
    pos 1-based on the whitespace token sequence. The window STRING
    never leaves the executor — only the fixed-width hash is shuffled
    (a k-token window is ~10k bytes of shuffle per corpus token at
    k-gram granularity otherwise)."""
    from airline_data_warehouse_spark.operators.text import WS

    toks = (df.select(F.col(id_col),
                      F.split(F.trim(F.col(text_col)), WS).alias("_w"))
            .filter(F.size("_w") >= k))
    win = F.expr(
        f"transform(sequence(1, size(_w) - {k - 1}), "
        f"i -> array_join(slice(_w, i, {k}), ' '))")
    return (toks.select(F.col(id_col), F.posexplode(win)
                        .alias("_p0", "_s"))
            .select(F.col(id_col),
                    (F.col("_p0") + 1).cast("long").alias("pos"),
                    F.conv(F.substring(F.md5("_s"), 1, 15), 16, 10)
                     .cast("long").alias("wh")))


def exact_substring_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 8,
                          min_tokens: int = 25, max_df: int = 16,
                          max_occ: int = 256) -> DataFrame:
    """Maximal >= min_tokens-token spans shared VERBATIM between two
    otherwise-distinct documents — the dominant contamination shape in
    web-scale corpora (quoted boilerplate, syndicated paragraphs,
    licence blocks) that document-level exact/MinHash/SimHash dedup
    cannot see (reference semantics: Lee et al. 2022 ExactSubstr;
    VERDICT r13 item 2). Output: (doc_a, doc_b, start_a, start_b,
    span_tokens) with doc_a < doc_b, starts 1-based in token units,
    one row per maximal run per (pair, diagonal).

    How a span is found: a shared L-token span appears as L - k + 1
    consecutive window-hash hits on ONE diagonal (pa - pb constant),
    so hits group by (pair, diagonal) and merge by the classic
    gaps-and-islands pos - row_number() key; the merged span is then
    re-extracted from BOTH documents and kept only if the texts are
    byte-equal (verify-join: a window-hash collision can at worst
    DROP a span, never invent one).

    Scale guards, both loud:
    * ``max_df``: window hashes in more than max_df distinct docs are
      boilerplate and are EXCLUDED before pair expansion (the
      boilerplate_ngrams rationale) — candidate volume per hash stays
      <= max_df^2, never corpus^2. A span containing an excluded
      window splits; report what you drop, don't silently quadratic.
    * ``max_occ``: if any surviving hash still occurs more than
      max_occ times TOTAL — max_df bounds DOCS, not occurrences, so
      both intra-document repetition and legitimate accumulation
      across <= max_df documents can breach it — raise with the
      remediation matched to each cause (repetition filter vs a
      deliberate max_occ raise; the mutual_knn_pairs
      bounded-contract precedent)."""
    wins = _persist(_token_window_hashes(df, text_col, id_col, k))
    good = _good_window_hashes(wins, id_col, max_df, max_occ,
                               "exact_substring_spans")
    w2 = wins.join(good, "wh", "left_semi")
    a = w2.select(F.col("wh"), F.col(id_col).alias("doc_a"),
                  F.col("pos").alias("pa"))
    b = w2.select(F.col("wh"), F.col(id_col).alias("doc_b"),
                  F.col("pos").alias("pb"))
    hits = a.join(b, "wh").filter(F.col("doc_a") < F.col("doc_b"))
    return _merged_verified_spans(
        hits, k, min_tokens, "doc_a", "doc_b", "start_a", "start_b",
        _token_arrays(df, text_col, id_col, "doc_a", "_wa"),
        _token_arrays(df, text_col, id_col, "doc_b", "_wb"))


def _good_window_hashes(wins_union: DataFrame, id_col: str, max_df: int,
                        max_occ: int, who: str) -> DataFrame:
    """The boilerplate df-filter + intra-document repetition guard
    shared by the batch and incremental span operators: (wh) hashes in
    ≤ max_df distinct docs, raising loudly when a surviving hash still
    occurs > max_occ times."""
    freq = wins_union.groupBy("wh").agg(
        F.count_distinct(F.col(id_col)).alias("_df"),
        F.count(F.lit(1)).alias("_occ"))
    good = _persist(freq.filter(F.col("_df") <= max_df)
                    .select("wh", "_occ"))
    worst = good.agg(F.max("_occ").alias("m")).collect()[0]["m"]
    if worst is not None and worst > max_occ:
        raise ValueError(
            f"{who}: a window hash occurs {worst} times TOTAL across "
            f"the corpus (> max_occ={max_occ}) after the max_df "
            "filter — the pair join fans out quadratically in a "
            "hash's occurrence count whichever documents hold them. "
            "If the mass is intra-document repetition, run the "
            "repetition filter (text_repetition_filter / "
            "remove_repeated_spans) first; if it is legitimate "
            "accumulation spread across <= max_df documents, raise "
            "max_occ deliberately (ADVICE r14: the guard counts "
            "total occurrences, not per-document ones)")
    return good.select("wh")


def _token_arrays(df: DataFrame, text_col: str, id_col: str,
                  out_id: str, out_arr: str) -> DataFrame:
    """(out_id, out_arr): each document's whitespace token array — the
    verify-join side frames."""
    from airline_data_warehouse_spark.operators.text import WS

    return df.select(F.col(id_col).alias(out_id),
                     F.split(F.trim(F.col(text_col)), WS).alias(out_arr))


def _merged_spans(hits: DataFrame, k: int, min_tokens: int,
                  id_a: str, id_b: str, start_a: str,
                  start_b: str) -> DataFrame:
    """The diagonal run merge alone — consecutive window-hash hits per
    (pair, diagonal) folded into maximal runs by gaps-and-islands.
    A ≥ min_tokens span is min_tokens − k + 1 CONSECUTIVE hash
    collisions, so even unverified spans carry (2^-60)^(run-length)
    false-positive odds — the streaming tier leans on exactly this
    amplification where the corpus text is not in its store."""
    run_w = Window.partitionBy(id_a, id_b, "_diag").orderBy("pa")
    runs = (hits.select(id_a, id_b, "pa", "pb",
                        (F.col("pa") - F.col("pb")).alias("_diag"))
            .withColumn("_grp",
                        F.col("pa") - F.row_number().over(run_w)))
    return (runs.groupBy(id_a, id_b, "_diag", "_grp")
            .agg(F.min("pa").cast("long").alias(start_a),
                 F.min("pb").cast("long").alias(start_b),
                 (F.count(F.lit(1)) + F.lit(k - 1)).cast("long")
                 .alias("span_tokens"))
            .filter(F.col("span_tokens") >= min_tokens)
            .select(id_a, id_b, start_a, start_b, "span_tokens"))


def _merged_verified_spans(hits: DataFrame, k: int, min_tokens: int,
                           id_a: str, id_b: str, start_a: str,
                           start_b: str, arr_a: DataFrame,
                           arr_b: DataFrame) -> DataFrame:
    """The diagonal run merge + exact verify shared by the batch and
    incremental span operators. ``hits``: (id_a, id_b, pa, pb) window
    matches; ``arr_a``/``arr_b``: (id_x, _wa/_wb) token arrays. One
    maximal run per (pair, diagonal); a merged span survives only if
    its re-extracted text is byte-equal on both sides (a window-hash
    collision can drop a span, never invent one)."""
    spans = _merged_spans(hits, k, min_tokens, id_a, id_b,
                          start_a, start_b)
    return (spans.join(arr_a, id_a).join(arr_b, id_b)
            .filter(F.expr(f"array_join(slice(_wa, int({start_a}), "
                           "int(span_tokens)), ' ') = "
                           f"array_join(slice(_wb, int({start_b}), "
                           "int(span_tokens)), ' ')"))
            .select(id_a, id_b, start_a, start_b, "span_tokens"))


def remove_cross_doc_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           min_tokens: int = 25, max_df: int = 16,
                           max_occ: int = 256,
                           spans: DataFrame | None = None) -> DataFrame:
    """The ExactSubstr REMOVAL twin, keep-first across documents: every
    token range of a LATER document (larger id) that exact_substring_
    spans found verbatim in an earlier one is cut, and the survivor
    text re-assembled in token order. Output: (doc_id, n_removed,
    kept_text) for each document that lost at least one token —
    kept_text is '' when a document was covered entirely (a full
    duplicate seen through the span lens). Overlapping spans union
    cleanly (positions are deduplicated before removal); a document
    losing spans to several earlier documents loses the union.

    Scale shape: spans explode into covered POSITIONS (sequence +
    explode — linear in tokens actually removed), the removal set
    anti-marks the affected documents' token positions with one keyed
    left join, and reassembly is a per-document sort of that
    document's own tokens (array_sort over a collect_list bounded by
    single-document length — the same per-doc bound every text
    operator carries)."""
    if spans is None:
        spans = exact_substring_spans(df, text_col, id_col, k,
                                      min_tokens, max_df, max_occ)
    from airline_data_warehouse_spark.operators.text import WS

    rem = (spans.select(F.col("doc_b").alias(id_col),
                        F.explode(F.sequence(
                            F.col("start_b"),
                            F.col("start_b") + F.col("span_tokens") - 1))
                        .alias("pos"))
           .distinct()
           .withColumn("_rm", F.lit(1)))
    toks = (df.select(F.col(id_col),
                      F.posexplode(F.split(F.trim(F.col(text_col)), WS))
                      .alias("_p0", "tok"))
            .select(F.col(id_col),
                    (F.col("_p0") + 1).cast("long").alias("pos"), "tok"))
    affected = toks.join(rem.select(id_col).distinct(), id_col,
                         "left_semi")
    marked = affected.join(rem, [id_col, "pos"], "left")
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "tok", "_rm"))),
        lambda x: x["_rm"].isNull())
    return (marked.groupBy(id_col)
            .agg(F.count("_rm").cast("long").alias("n_removed"),
                 F.array_join(F.transform(kept, lambda x: x["tok"]), " ")
                 .alias("kept_text")))


def exact_substring_spans_incremental(corpus: DataFrame,
                                      increment: DataFrame,
                                      text_col: str = "text",
                                      id_col: str = "doc_id", k: int = 8,
                                      min_tokens: int = 25,
                                      max_df: int = 16,
                                      max_occ: int = 256) -> DataFrame:
    """Incremental ExactSubstr: spans between the NEW batch and the
    corpus only — increment windows join the corpus window index, the
    corpus is never re-paired against itself (the
    incremental_minhash_pairs / dedup_cascade discipline; at 100 TB
    the index is the persisted table and the increment is a
    micro-batch). Output: (corpus_id, inc_id, start_corpus, start_inc,
    span_tokens).

    Equivalent BY CONSTRUCTION to the batch exact_substring_spans over
    corpus ∪ increment restricted to cross pairs (test-pinned): the
    boilerplate df-filter counts distinct docs across BOTH sides —
    production maintains that as a per-hash doc-count column on the
    persisted index, incremented per batch — so a window that becomes
    boilerplate only once the increment lands is excluded exactly as
    the batch run would exclude it."""
    cw = _persist(_token_window_hashes(corpus, text_col, id_col, k))
    iw = _persist(_token_window_hashes(increment, text_col, id_col, k))
    good = _good_window_hashes(cw.unionByName(iw), id_col, max_df,
                               max_occ,
                               "exact_substring_spans_incremental")
    a = (cw.join(good, "wh", "left_semi")
         .select("wh", F.col(id_col).alias("corpus_id"),
                 F.col("pos").alias("pa")))
    b = (iw.join(good, "wh", "left_semi")
         .select("wh", F.col(id_col).alias("inc_id"),
                 F.col("pos").alias("pb")))
    return _merged_verified_spans(
        a.join(b, "wh"), k, min_tokens,
        "corpus_id", "inc_id", "start_corpus", "start_inc",
        _token_arrays(corpus, text_col, id_col, "corpus_id", "_wa"),
        _token_arrays(increment, text_col, id_col, "inc_id", "_wb"))


def _es_store_fs(spark, store_dir: str):
    """(Path-factory, FileSystem) for an ExactSubstr store dir — the
    Hadoop FileSystem API, so markers hold for non-local stores (the
    cascade_store_build convention)."""
    import os

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    mk = lambda *parts: jvm.org.apache.hadoop.fs.Path(  # noqa: E731
        os.path.join(store_dir, *parts))
    return mk, mk("_built").getFileSystem(conf)


def exact_substring_store_build(corpus: DataFrame, store_dir: str,
                                text_col: str = "text",
                                id_col: str = "doc_id", k: int = 8,
                                max_df: int = 16, max_occ: int = 256,
                                overwrite: bool = False) -> None:
    """Materialize the persisted ExactSubstr WINDOW INDEX — the
    store-mediated batch-incremental tier's corpus state (VERDICT r14
    item 1: `exact_substring_spans_incremental` re-hashes the corpus
    frame on every call; at 100 TB the index is the persisted table
    and the increment is a micro-batch — the `cascade_store_build`
    discipline, and the same store schema the streaming tier keeps):

    * ``windows``   — (doc_id, pos, wh): the k-token window-hash
      inverted index. Only the 60-bit hash is stored; window text
      never lands in the store.
    * ``hashstats`` — (wh, n_docs, n_occ): per-hash distinct-doc and
      occurrence counts — the per-hash doc-count column the
      incremental's df boilerplate filter reads instead of
      re-counting the corpus (production increments it per batch;
      see `exact_substring_store_append`).
    * ``tokens``    — (doc_id, toks array<string>): each document's
      token array, the byte-equal verify side. The verify JOIN reads
      only the documents that actually hold a candidate span (keyed
      semi-join) — the store keeps corpus bytes exactly once, like
      Lee et al.'s retained corpus, but the per-batch cost touches
      O(affected docs), never the corpus.
    * ``meta``      — 1-row (k, max_df, max_occ) plan sidecar: windows
      under different k are incommensurable, so reads take k FROM the
      store, and an ``overwrite=False`` re-build whose plan differs
      from the sidecar RAISES naming both (the r15 q-digest
      plan-sidecar discipline; silently reusing a store built under a
      different plan was review-r15's finding 3); max_df/max_occ ride
      along so the split guard contract (build-time vs
      increment-time, below) is explicit.
    * ``_built``    — the crash-safety marker, written LAST; an
      ``overwrite=True`` rebuild deletes it FIRST (a mid-rebuild
      crash leaves a rebuildable store, never a half-new one).

    The batch tier's max_occ guard SPLITS across tiers, and matches
    the recompute twin's ORDER (df filter FIRST — review r15 finding
    2: a license header in 300 docs has occ=300 but df=300 > max_df,
    so every tier df-filters it out and no guard should refuse it):
    this build raises only when a hash with corpus df <= max_df
    exceeds max_occ occurrences (corpus-only repetition the df filter
    would NOT remove); the incremental raises for hashes its
    increment touches whose TOTAL df passes the filter. Corpus df
    only grows with appends, so a hash df-excluded here can never
    re-enter the good set. The df boilerplate filter itself is an
    increment-time decision from hashstats + the batch's own
    counts."""
    spark = corpus.sparkSession
    mk, fs = _es_store_fs(spark, store_dir)
    if fs.exists(mk("_built")):
        if not overwrite:
            kk, kdf, kocc = _es_store_meta(spark, store_dir)
            if (kk, kdf, kocc) != (int(k), int(max_df), int(max_occ)):
                raise ValueError(
                    "exact_substring_store_build(overwrite=False): "
                    f"the existing store at {store_dir!r} was built "
                    f"under plan (k={kk}, max_df={kdf}, "
                    f"max_occ={kocc}) but this call asked for "
                    f"(k={int(k)}, max_df={int(max_df)}, "
                    f"max_occ={int(max_occ)}) — reusing it silently "
                    "would answer under a plan the caller never "
                    "chose; pass overwrite=True to rebuild, or the "
                    "stored plan to reuse")
            return
        fs.delete(mk("_built"), False)
    wins = _persist(_token_window_hashes(corpus, text_col, id_col, k))
    stats = wins.groupBy("wh").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"))
    worst = (stats.filter(F.col("n_docs") <= max_df)
             .agg(F.max("n_occ").alias("m")).collect()[0]["m"])
    if worst is not None and worst > max_occ:
        raise ValueError(
            f"exact_substring_store_build: a window hash within the "
            f"df <= {max_df} boilerplate bound occurs {worst} times "
            f"in the corpus (> max_occ={max_occ}) — the "
            "increment-side pair join would fan out quadratically on "
            "it; run the repetition filter (text_repetition_filter / "
            "remove_repeated_spans) over the corpus first, or raise "
            "max_occ deliberately")
    wins.write.mode("overwrite").parquet(str(mk("windows")))
    stats.write.mode("overwrite").parquet(str(mk("hashstats")))
    (_token_arrays(corpus, text_col, id_col, id_col, "toks")
     .write.mode("overwrite").parquet(str(mk("tokens"))))
    from airline_data_warehouse_spark.operators.frames import (
        jvm_local_frame,
    )
    (jvm_local_frame(spark, [(int(k), int(max_df), int(max_occ))],
                     "k int, max_df int, max_occ int")
     .coalesce(1).write.mode("overwrite").parquet(str(mk("meta"))))
    out = fs.create(mk("_built"), True)
    out.write(bytearray(b"ok\n"))
    out.close()
    release_caches()


def _es_store_meta(spark, store_dir: str) -> tuple[int, int, int]:
    """(k, max_df, max_occ) from the store's meta sidecar; raises on a
    store without its `_built` marker (half-built stores are rebuilt,
    never half-read — the cascade marker contract). Reads a pre-fix
    2-column sidecar (k, max_occ) with max_df defaulted to 16."""
    mk, fs = _es_store_fs(spark, store_dir)
    if not fs.exists(mk("_built")):
        raise ValueError(
            f"exact_substring store at {store_dir!r} has no _built "
            "marker — build it with exact_substring_store_build "
            "(a missing marker means a crashed or absent build)")
    row = spark.read.parquet(str(mk("meta"))).collect()[0]
    d = row.asDict()
    return (int(d["k"]), int(d.get("max_df", 16)), int(d["max_occ"]))


def exact_substring_spans_store(spark, store_dir: str,
                                increment: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                min_tokens: int = 25) -> DataFrame:
    """Store-mediated incremental ExactSubstr: spans between the NEW
    batch and the persisted corpus index — the production shape of
    `exact_substring_spans_incremental`, which re-derives the corpus
    windows per call. EQUAL BY CONSTRUCTION to the recompute twin
    (test-pinned both directions), with per-batch work proportional
    to the INCREMENT:

    * only increment text is tokenized and hashed (one pass over the
      micro-batch);
    * the df boilerplate filter reads the store's per-hash doc counts
      (``hashstats``) and adds the batch's own — the recompute twin
      counts distinct docs over corpus ∪ increment, and with disjoint
      doc ids the sum IS that count;
    * the pair join touches only store windows whose hash the
      increment shares (semi-join on the batch's good hashes);
    * the byte-equal verify reads token arrays for exactly the
      documents holding candidate spans (keyed join against the
      store's ``tokens``), increment side from the batch itself.

    ``k``, ``max_df``, and ``max_occ`` come from the store's meta
    sidecar (windows under different k are incommensurable — there is
    nothing correct a caller-supplied k could do; and the guard-split
    contract below only covers the PLAN the build checked under, so
    the read-time knobs are the stored ones too). The max_occ guard
    covers hashes this increment touches (accumulated store + batch
    occurrences, df-filtered first — the recompute twin's order); the
    store build already raised on corpus-only repetition within the
    df bound — between them, the recompute twin's guard set, split at
    the tier boundary (the streaming tier's batch-scoped guard
    discipline, ADVICE r14). Disjoint doc ids are the incremental
    contract (same as the recompute twin); an increment id already
    present in the store RAISES — the df sum would silently
    double-count it."""
    k, max_df, max_occ = _es_store_meta(spark, store_dir)
    mk, _ = _es_store_fs(spark, store_dir)
    # hashstats holds DELTA rows (one per hash per build/append) —
    # readers sum per hash, the linear-state convention; with the
    # disjoint-id contract the summed distinct-doc counts equal the
    # recompute twin's count over the unioned corpus
    stats = (spark.read.parquet(str(mk("hashstats")))
             .groupBy("wh").agg(F.sum("n_docs").alias("n_docs"),
                                F.sum("n_occ").alias("n_occ")))
    toks = spark.read.parquet(str(mk("tokens")))
    iw = _persist(_token_window_hashes(increment, text_col, id_col, k))
    clash = (toks.join(increment.select(F.col(id_col)).distinct(),
                       id_col, "left_semi")
             .limit(1).count())
    if clash:
        raise ValueError(
            "exact_substring_spans_store: the increment reuses doc "
            "ids already present in the store — the incremental df "
            "filter sums store and batch doc counts per hash, so an "
            "overlapping id would double-count; re-id the increment "
            "(the disjoint-ids incremental contract)")
    inc_stats = iw.groupBy("wh").agg(
        F.count_distinct(F.col(id_col)).alias("_nd"),
        F.count(F.lit(1)).alias("_no"))
    total = (inc_stats.join(stats, "wh", "left")
             .select("wh", "_no",
                     (F.col("_nd") + F.coalesce("n_docs", F.lit(0)))
                     .alias("_df"),
                     (F.col("_no") + F.coalesce("n_occ", F.lit(0)))
                     .alias("_occ")))
    good = _persist(total.filter(F.col("_df") <= max_df)
                    .select("wh", "_occ"))
    worst = good.agg(F.max("_occ").alias("m")).collect()[0]["m"]
    if worst is not None and worst > max_occ:
        raise ValueError(
            f"exact_substring_spans_store: a window hash this "
            f"increment touches has {worst} accumulated occurrences "
            f"(> max_occ={max_occ}) — the pair join fans out "
            "quadratically in a hash's occurrence count. "
            "Intra-document repetition: run the repetition filter "
            "on the increment; legitimate accumulation across "
            "<= max_df documents: raise max_occ deliberately")
    a = (spark.read.parquet(str(mk("windows")))
         .join(good.select("wh"), "wh", "left_semi")
         .select("wh", F.col(id_col).alias("corpus_id"),
                 F.col("pos").alias("pa")))
    b = (iw.join(good.select("wh"), "wh", "left_semi")
         .select("wh", F.col(id_col).alias("inc_id"),
                 F.col("pos").alias("pb")))
    return _merged_verified_spans(
        a.join(b, "wh"), k, min_tokens,
        "corpus_id", "inc_id", "start_corpus", "start_inc",
        toks.select(F.col(id_col).alias("corpus_id"),
                    F.col("toks").alias("_wa")),
        _token_arrays(increment, text_col, id_col, "inc_id", "_wb"))


def exact_substring_store_append(spark, store_dir: str,
                                 increment: DataFrame,
                                 text_col: str = "text",
                                 id_col: str = "doc_id") -> None:
    """Fold a processed increment INTO the store, so tomorrow's batch
    joins today's documents too — the daily-ingest loop's second half
    (`incremental_cascade`'s store is rebuilt wholesale by its
    caller; the window index is strictly append-able, so appending is
    the honest 100 TB shape): windows and token arrays append as new
    parquet files; hashstats appends the increment's per-hash counts
    as DELTA rows — readers SUM per hash (`exact_substring_spans_
    store` aggregates over the union), the streaming tier's linear
    hashstats-state convention, so no read-modify-write of the
    accumulated stats is ever needed. Disjoint-id contract as the
    join side (same raise).

    Crash contract (review r15 finding 1 — the three appends cannot
    be atomic in plain parquet): ``tokens`` is appended FIRST, so the
    disjoint-id guard — which reads tokens — turns a RETRY of a
    crashed append into a loud raise instead of silently
    double-appending windows/hashstats (duplicate (wh, doc, pos) rows
    would fragment the gaps-and-islands run merge and double-counted
    df deltas would mis-exclude hashes as boilerplate). The append
    ORDER also keeps concurrent readers consistent at every crash
    point: tokens-only = extra verify rows nothing references;
    tokens+hashstats = df counted for windows not yet visible, which
    can only DROP candidate spans (never invent — the family's
    collision direction); windows lands LAST and completes the
    increment. On a raise after a crash, re-id or rebuild the store
    (the error says so)."""
    k, _max_df, _max_occ = _es_store_meta(spark, store_dir)
    mk, _fs = _es_store_fs(spark, store_dir)
    clash = (spark.read.parquet(str(mk("tokens")))
             .join(increment.select(F.col(id_col)).distinct(), id_col,
                   "left_semi").limit(1).count())
    if clash:
        raise ValueError(
            "exact_substring_store_append: the increment reuses doc "
            "ids already present in the store — either re-id it (the "
            "disjoint-ids incremental contract) or, if a previous "
            "append of THIS increment crashed mid-way, rebuild the "
            "store (exact_substring_store_build(overwrite=True)): "
            "re-appending would duplicate window/stat rows and "
            "silently corrupt df counts and run merges")
    iw = _persist(_token_window_hashes(increment, text_col, id_col, k))
    # tokens FIRST (arms the retry guard), stats second, windows LAST
    # — see the crash contract above
    (_token_arrays(increment, text_col, id_col, id_col, "toks")
     .write.mode("append").parquet(str(mk("tokens"))))
    (iw.groupBy("wh").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"))
     .write.mode("append").parquet(str(mk("hashstats"))))
    iw.write.mode("append").parquet(str(mk("windows")))
    release_caches()


def remove_increment_spans_store(spark, store_dir: str,
                                 increment: DataFrame,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 min_tokens: int = 25) -> DataFrame:
    """The daily-ingest SCRUB composition: cut from each INCREMENT
    document every token range `exact_substring_spans_store` found
    verbatim in the persisted corpus, and reassemble the survivor
    text — the store-mediated form of `remove_cross_doc_spans`'
    keep-first rule with the corpus always the keeper (it was there
    first). Run it on a batch BEFORE `exact_substring_store_append`
    and the store accumulates deduplicated text only — the Lee et al.
    ExactSubstr training-corpus loop as one operator per batch.

    Output: (doc_id, n_removed, kept_text) for increment documents
    that lost at least one token (kept_text = '' marks a document
    wholly covered by corpus material). Equivalent by construction to
    `remove_cross_doc_spans` over corpus ∪ increment restricted to
    CROSS pairs (earlier side corpus AND later side increment) — the
    oracle replays that chain. Intra-increment duplication (two docs
    of the SAME batch sharing a span) is deliberately NOT scrubbed
    here: the store join never pairs increment against itself; run
    the batch removal over the silver table for that (the
    incremental family's standing contract). Scale shape: spans come from the increment-proportional
    store join; the removal explode/anti-mark/reassembly stages are
    linear in affected increment tokens (the batch removal twin's
    bounds), and the corpus store stays read-only."""
    spans = exact_substring_spans_store(spark, store_dir, increment,
                                        text_col, id_col, min_tokens)
    cross = spans.select(F.col("corpus_id").alias("doc_a"),
                         F.col("inc_id").alias("doc_b"),
                         F.col("start_corpus").alias("start_a"),
                         F.col("start_inc").alias("start_b"),
                         "span_tokens")
    return remove_cross_doc_spans(increment, text_col, id_col,
                                  min_tokens=min_tokens, spans=cross)
