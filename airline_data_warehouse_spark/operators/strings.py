"""String-similarity join with pigeonhole segment blocking (PassJoin-style).

The r01 implementation blocked on length-buckets, which degenerates to
near-all-pairs when many strings share a length. This module blocks on
exact substring segments instead — selectivity comes from string CONTENT,
not length:

For edit distance <= k, partition the canonical string into k+1 contiguous
segments. Any string within distance k must contain at least one segment
exactly (pigeonhole over the edit script: k edits cannot touch k+1
segments), shifted by at most k positions. So:

* canonical side emits k+1 blocking keys (target_len, seg_idx, seg_text);
* probe side emits, for each hypothetical target length within +-k of its
  own and each segment position window of +-k, the substring of matching
  length at that position — a fixed (2k+1)^2*(k+1) fan-out of highly
  selective keys;
* the equi-join on (target_len, seg_idx, seg_text) yields candidates,
  deduplicated BEFORE the levenshtein verify.

Blocking guarantees recall (every true pair is a candidate), so the final
verified result equals the plain theta-join semantics — the DuckDB oracle
can stay declarative. Reference behavior generalized: the fuzzy country /
email fixup joins (smartFileProcessor.js:283-287 fuzzy country repair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segment(col: Column, target_len: Column, i: int, parts: int) -> tuple[Column, Column]:
    """(start_1based, length) of even-partition segment i of a string of
    length target_len split into `parts` contiguous pieces."""
    base = F.floor(target_len / parts).cast("int")
    rem = (target_len % parts).cast("int")
    seg_len = base + F.when(F.lit(i) < rem, F.lit(1)).otherwise(F.lit(0))
    start = F.lit(i) * base + F.least(F.lit(i), rem) + F.lit(1)
    return start, seg_len


def edit_distance_join(probe: DataFrame, canon: DataFrame,
                       probe_col: str, canon_col: str, k: int = 2) -> DataFrame:
    """All (probe, canon) pairs with levenshtein(probe, canon) <= k.

    Output columns: every probe column, plus the canon columns, plus
    `distance` (int). Candidate generation is the segment equi-join above;
    the quadratic-risk surface is bounded by exact segment-text collisions
    rather than length-class sizes.
    """
    parts = k + 1
    p_col, c_col = F.col(probe_col), F.col(canon_col)

    c_len = F.length(c_col)
    canon_keys = []
    for i in range(parts):
        start, seg_len = _segment(c_col, c_len, i, parts)
        canon_keys.append(F.struct(
            c_len.cast("int").alias("tlen"), F.lit(i).alias("seg_idx"),
            c_col.substr(start, seg_len).alias("seg")))
    c_banded = (canon.withColumn("_bk", F.explode(F.array(*canon_keys)))
                     .select("*", "_bk.tlen", "_bk.seg_idx", "_bk.seg")
                     .drop("_bk"))

    p_len = F.length(p_col)
    probe_keys = []
    for dl in range(-k, k + 1):           # hypothetical canonical length
        tlen = p_len + F.lit(dl)
        for i in range(parts):
            start, seg_len = _segment(p_col, tlen, i, parts)
            for shift in range(-k, k + 1):  # segment position drift <= k
                probe_keys.append(F.struct(
                    tlen.cast("int").alias("tlen"), F.lit(i).alias("seg_idx"),
                    p_col.substr(start + F.lit(shift), seg_len).alias("seg")))
    p_banded = (probe.withColumn("_bk", F.explode(F.array(*probe_keys)))
                     .select("*", "_bk.tlen", "_bk.seg_idx", "_bk.seg")
                     .drop("_bk"))

    cand = (p_banded.join(c_banded, ["tlen", "seg_idx", "seg"])
                    .drop("tlen", "seg_idx", "seg")
                    .distinct())
    return (cand.filter(F.abs(F.length(p_col) - F.length(c_col)) <= k)
                .withColumn("distance", F.levenshtein(p_col, c_col).cast("int"))
                .filter(F.col("distance") <= k))
