"""Count-Min sketch: fixed-size frequency estimation (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications", J. Algorithms 2005).

Why it earns a place next to the exact token aggregates: the counter
table is depth × width CELLS no matter how large the vocabulary grows —
the shuffle that builds it is bounded by d·w keys, the per-executor
partial is a fixed-size array, and two sketches over disjoint corpus
halves MERGE by cell-wise addition (the property that makes it the
frequency state a streaming/incremental pipeline can actually keep,
where an exact per-token count table grows with Heaps' law forever).
The price is one-sided error: estimates only ever OVER-count
(collisions add, never subtract), with the classic ε·N bound at
w = ⌈e/ε⌉, failure probability e^-d.

Determinism discipline (the module rule shared with MinHash/SimHash):
the row hashes are the SAME pinned universal family
(a·h + b) mod p over the md5-prefix base hash that the dedup operators
use — integer arithmetic an oracle replays bit-for-bit, so even though
the sketch is approximate, its cells and its estimates are EXACTLY
reproducible in any engine. approx_distinct_count (HLL) is rows-only
by nature; this sketch is hash-certifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.hashing import (
    MERSENNE_P,
    MINHASH_PARAMS,
    base_hash,
)

CMS_DEPTH = 4     # rows — failure prob e^-4 ≈ 1.8%
CMS_WIDTH = 512   # buckets/row — ε ≈ e/512 ≈ 0.53% of total mass


def _row_buckets(token: Column, depth: int, width: int) -> Column:
    """array<struct<row,bucket>> — the cell each CMS row charges for
    ``token``: bucket_i = ((a_i·h + b_i) mod p) mod width over the
    60-bit md5-prefix base hash (h < 2³¹ and a_i < 2²⁸, so a_i·h + b_i
    stays well inside BIGINT). Same pinned (a, b) family as MinHash —
    part of the operator contract, replayed verbatim by the oracle."""
    h = base_hash(token)
    return F.array(*[
        F.struct(F.lit(i).cast("int").alias("row"),
                 (((F.lit(a) * h + F.lit(b)) % MERSENNE_P) % width)
                 .cast("int").alias("bucket"))
        for i, (a, b) in enumerate(MINHASH_PARAMS[:depth])])


def countmin_build(items: DataFrame, token_col: str = "token",
                   weight_col: str | None = None,
                   depth: int = CMS_DEPTH,
                   width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: (row int, bucket int, counter long), sparse —
    untouched cells are absent and read as 0.

    Scale shape: one explode (×depth) then ONE aggregation whose key
    space is ≤ depth·width cells — map-side partials collapse each
    executor's contribution to at most d·w rows regardless of corpus
    size, so the exchange is CONSTANT-bounded (the entire point of the
    sketch vs. a vocabulary-sized exact count shuffle). Sketches built
    over corpus shards union + re-aggregate to the merged sketch
    (cell-wise sum — see countmin_merge)."""
    if depth > len(MINHASH_PARAMS):
        raise ValueError(f"depth {depth} exceeds the pinned hash family "
                         f"({len(MINHASH_PARAMS)})")
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    return (items
            .select(F.explode(_row_buckets(F.col(token_col), depth, width))
                    .alias("rb"), w.alias("_w"))
            .groupBy(F.col("rb.row").alias("row"),
                     F.col("rb.bucket").alias("bucket"))
            .agg(F.sum("_w").alias("counter")))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    the mergeability that lets shards/micro-batches keep independent
    sketches and combine them exactly (CMS is a linear sketch)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("row", "bucket")
            .agg(F.sum("counter").alias("counter")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      token_col: str = "token",
                      depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> DataFrame:
    """(token, est_count) for each probe token: min over the depth
    cells the token hashes to; a cell absent from the sparse sketch is
    0 (the token was never seen — CMS never under-counts, so min with
    an untouched cell is exactly 0).

    The probe side is exploded ×depth and joined on (row, bucket) —
    the sketch side is ≤ d·w rows, always broadcastable; the join is
    probe-linear."""
    pb = (probes
          .select(F.col(token_col).alias("token"),
                  F.explode(_row_buckets(F.col(token_col), depth, width))
                  .alias("rb"))
          .select("token", "rb.row", "rb.bucket"))
    return (pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy("token")
            .agg(F.min(F.coalesce(F.col("counter"), F.lit(0)))
                 .alias("est_count")))
