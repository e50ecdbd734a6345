"""Temporal joins Spark has no builtin for: as-of join and range join.

* ``asof_join`` — for each left row, the latest right row with
  right_ts ≤ left_ts on the same key (point-in-time enrichment: "the
  flight's status as of the sale"). Implemented with the union-window
  technique: tag both sides, union, one window per key ordered by
  (ts, side) carrying the last seen right values forward. ONE shuffle on
  the key — never a per-row subquery, never an inequality join, so it
  scales like any keyed window.
* ``range_join_binned`` — pairs of rows within a time tolerance.
  Naively this is an inequality join (cross-product per key); binning
  each row to ⌊ts/tolerance⌋ and joining on (key, bin±1) turns it into
  an equi-join whose cost tracks the true match count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    """unix_micros that tolerates TIMESTAMP_NTZ inputs (testdata parquet
    sometimes reads as NTZ under Spark 4; session tz is pinned UTC so the
    cast is value-identical)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_value_cols: list[str] | None = None) -> DataFrame:
    """Left rows enriched with the most recent right row at or before
    their timestamp (per key). Right side should be unique per
    (key, right_ts) — pre-aggregate if not; ties at equal timestamps
    resolve right-before-left (inclusive as-of, DuckDB ASOF semantics).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (key, right_ts)]
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("_r_ts"))
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("_r_ts"))
    unioned = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy(key).orderBy("_ts", "_side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        key, "_ts", "_side", "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
          for c in right_value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_matched_ts"))
    out = carried.filter(F.col("_side") == 1)
    left_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    right_cols = [F.col(f"_r_{c}").alias(f"asof_{c}") for c in right_value_cols]
    return out.select(*left_cols, *right_cols,
                      F.col("_matched_ts").alias("asof_ts"))


def range_join_binned(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      tolerance_seconds: int) -> DataFrame:
    """All (left, right) pairs on the same key whose timestamps differ by
    at most ``tolerance_seconds``. Bin width = tolerance: a match's
    partner is always in the same or adjacent bin, so three equi-join
    probes replace the inequality join."""
    tol_us = tolerance_seconds * 1_000_000
    l = left.withColumn("_bin", (_us(F.col(left_ts)) / tol_us).cast("long"))
    shifts = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    r = (right.withColumn("_rbin", (_us(F.col(right_ts)) / tol_us).cast("long"))
              .withColumn("_shift", shifts)
              .withColumn("_bin", F.col("_rbin") + F.col("_shift"))
              .drop("_rbin", "_shift"))
    joined = l.join(r, [key, "_bin"])
    in_range = (F.abs(_us(F.col(left_ts)) - _us(F.col(right_ts)))
                <= tol_us)
    return joined.filter(in_range).drop("_bin")
