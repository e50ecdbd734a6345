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

Codegen note (r03): the r02 version built the 75-key probe fan-out as 75
inline struct branches in one projection, which overflowed the JVM's 64 KB
generated-method limit (`CodeGenerator: Code grows beyond 64 KB`) and
silently fell back to interpreted execution. The fan-out is now DATA-driven:
a constant (dl, seg_idx, shift) parameter array is exploded first, and one
tiny substr expression computes the key from the exploded ints — the
generated method is the same size regardless of k.

Blocking guarantees recall (every true pair is a candidate), so the final
verified result equals the plain theta-join semantics — the DuckDB oracle
can stay declarative. Reference behavior generalized: the fuzzy country /
email fixup joins (smartFileProcessor.js:283-287 fuzzy country repair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segment(target_len: Column, i: Column, parts: int) -> tuple[Column, Column]:
    """(start_1based, length) of even-partition segment i of a string of
    length target_len split into `parts` contiguous pieces."""
    base = F.floor(target_len / parts).cast("int")
    rem = (target_len % parts).cast("int")
    seg_len = base + F.when(i < rem, F.lit(1)).otherwise(F.lit(0))
    start = i * base + F.least(i, rem) + F.lit(1)
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

    # --- canonical side: k+1 keys, parameterized on seg_idx only ---------
    c_len = F.length(c_col).cast("int")
    c_params = F.array(*[F.lit(i) for i in range(parts)])
    c_banded = canon.withColumn("seg_idx", F.explode(c_params))
    c_start, c_seg_len = _segment(c_len, F.col("seg_idx"), parts)
    c_banded = (c_banded
                .withColumn("tlen", c_len)
                .withColumn("seg", c_col.substr(c_start, c_seg_len)))

    # --- probe side: (2k+1)^2*(k+1) keys from an exploded constant array -
    # One struct column per (dl, seg_idx, shift) triple would regenerate the
    # r02 codegen blow-up; instead explode the parameter triples and compute
    # the single substr from the exploded ints. The constant array is one
    # parsed SQL expression — 75 struct/lit Column objects cost ~450 py4j
    # round trips (~1 s of driver time per plan construction, measured r06).
    p_params = F.expr("array(" + ",".join(
        f"named_struct('dl', {dl}, 'seg_idx', {i}, 'shift', {shift})"
        for dl in range(-k, k + 1)          # hypothetical canonical length
        for i in range(parts)
        for shift in range(-k, k + 1)       # segment position drift <= k
    ) + ")")
    p_len = F.length(p_col).cast("int")
    p_banded = probe.withColumn("_p", F.explode(p_params))
    tlen = (p_len + F.col("_p.dl")).cast("int")
    start, seg_len = _segment(tlen, F.col("_p.seg_idx"), parts)
    start = start + F.col("_p.shift")
    # A true segment occurrence is a real substring of the probe, so its
    # start is >= 1 and the hypothetical canon length >= 0. Negative starts
    # made Spark's substr count from the string END, inflating candidates
    # with spurious suffix keys — filter them; recall is unaffected.
    p_banded = (p_banded
                .filter((start >= 1) & (tlen >= 0))
                .withColumn("tlen", tlen)
                .withColumn("seg_idx", F.col("_p.seg_idx"))
                .withColumn("seg", p_col.substr(start, seg_len))
                .drop("_p"))

    cand = (p_banded.join(c_banded, ["tlen", "seg_idx", "seg"])
                    .drop("tlen", "seg_idx", "seg")
                    .distinct())
    return (cand.filter(F.abs(F.length(p_col) - F.length(c_col)) <= k)
                .withColumn("distance", F.levenshtein(p_col, c_col).cast("int"))
                .filter(F.col("distance") <= k))
