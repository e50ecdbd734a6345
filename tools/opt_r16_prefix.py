"""r16 experiment: prefix_filter_jaccard_pairs variants, measured side
by side with identical-output assertion before any repo change (the
opt_experiments.py protocol). Variants:

  V0: registered implementation
  V1: verify-join computes the intersection ONCE per candidate pair
      (persist barrier between the join+project and the threshold
      filter, so Catalyst cannot push the jaccard predicate back into
      the join condition where it duplicates array_intersect)
  V2: V1 + Bayardo-asymmetric prefixes: pairs are ordered by (n, id);
      the smaller (indexed) side only needs prefix length
      n - ceil(2t/(1+t) * n) + 1 (its partner is at least as large, so
      the required overlap is >= ceil(2t/(1+t)*n)), the larger (probe)
      side keeps n - ceil(t*n) + 1. Candidate volume per token drops
      from plen_long^2 to plen_long * plen_short.

Usage: python tools/opt_r16_prefix.py [sf0.1]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decimal import Decimal  # noqa: E402

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402


def _spark():
    from airline_data_warehouse_spark.session import get_spark
    s = get_spark(app_name="opt-r16-prefix")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _time(df_builder, label: str, runs: int = 5) -> float:
    from airline_data_warehouse_spark.operators.dedup import release_caches
    samples = []
    for _ in range(runs):
        t0 = time.time()
        df_builder().write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        release_caches()
    med = statistics.median(samples)
    print(f"{label}: median {med:.3f}s  samples={[round(s, 3) for s in samples]}")
    return med


def _same(a: DataFrame, b: DataFrame) -> None:
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb, (
        f"MISMATCH rows {len(ra)} vs {len(rb)}; "
        f"first diff: {next(((x, y) for x, y in zip(ra, rb) if x != y), None)}")
    print(f"identical: {len(ra)} rows")


def prefix_v0(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              k: int = 9, threshold: float = 0.6) -> DataFrame:
    """The pre-r16 registered implementation, inlined verbatim:
    symmetric prefixes + verify with the threshold filter pushed into
    the join condition."""
    import airline_data_warehouse_spark.operators.dedup as dd

    t = F.lit(Decimal(str(threshold)).quantize(Decimal("0.000001")))
    sh = dd._persist(dd.shingled(df, text_col, id_col, k))
    tok = sh.select(F.col(id_col), F.size("hs").alias("n"),
                    F.explode("hs").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    pos = F.row_number().over(Window.partitionBy(id_col).orderBy("df_t", "t"))
    prefix = dd._persist(
        tok.join(freq.hint("shuffle_hash"), "t")
           .withColumn("pos", pos)
           .filter(F.col("pos") <= F.col("n") - F.ceil(t * F.col("n")) + 1)
           .select(id_col, "n", "t", "pos"))
    a = prefix.select(F.col(id_col).alias("id1"), F.col("n").alias("n1"),
                      F.col("pos").alias("p1"), "t")
    b = prefix.select(F.col(id_col).alias("id2"), F.col("n").alias("n2"),
                      F.col("pos").alias("p2"), "t")
    ub = F.lit(1) + F.least(F.col("n1") - F.col("p1"),
                            F.col("n2") - F.col("p2"))
    cand = (a.join(b, "t")
             .filter((F.col("id1") < F.col("id2"))
                     & (F.least("n1", "n2") >= t * F.greatest("n1", "n2"))
                     & (ub * (1 + t) >= t * (F.col("n1") + F.col("n2"))))
             .select("id1", "id2")
             .distinct())
    s1 = sh.select(F.col(id_col).alias("id1"),
                   dd._i32("hs").alias("sh1")).hint("shuffle_hash")
    s2 = sh.select(F.col(id_col).alias("id2"),
                   dd._i32("hs").alias("sh2")).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (cand.join(s1, "id1").join(s2, "id2")
                .withColumn("jaccard",
                            F.round(inter.cast("double") / union, 6))
                .filter(F.col("jaccard") >= threshold)
                .select("id1", "id2", "jaccard"))


def prefix_v1(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              k: int = 9, threshold: float = 0.6) -> DataFrame:
    """V0 candidate generation, barrier-verified."""
    import airline_data_warehouse_spark.operators.dedup as dd

    t = F.lit(Decimal(str(threshold)).quantize(Decimal("0.000001")))
    sh = dd._persist(dd.shingled(df, text_col, id_col, k))
    tok = sh.select(F.col(id_col), F.size("hs").alias("n"),
                    F.explode("hs").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    pos = F.row_number().over(Window.partitionBy(id_col).orderBy("df_t", "t"))
    prefix = dd._persist(
        tok.join(freq.hint("shuffle_hash"), "t")
           .withColumn("pos", pos)
           .filter(F.col("pos") <= F.col("n") - F.ceil(t * F.col("n")) + 1)
           .select(id_col, "n", "t", "pos"))
    a = prefix.select(F.col(id_col).alias("id1"), F.col("n").alias("n1"),
                      F.col("pos").alias("p1"), "t")
    b = prefix.select(F.col(id_col).alias("id2"), F.col("n").alias("n2"),
                      F.col("pos").alias("p2"), "t")
    ub = F.lit(1) + F.least(F.col("n1") - F.col("p1"),
                            F.col("n2") - F.col("p2"))
    cand = (a.join(b, "t")
             .filter((F.col("id1") < F.col("id2"))
                     & (F.least("n1", "n2") >= t * F.greatest("n1", "n2"))
                     & (ub * (1 + t) >= t * (F.col("n1") + F.col("n2"))))
             .select("id1", "id2")
             .distinct())
    return _barrier_verify(dd, sh, cand, id_col, threshold)


def _barrier_verify(dd, sh, cand, id_col, threshold):
    s1 = sh.select(F.col(id_col).alias("id1"),
                   dd._i32("hs").alias("sh1")).hint("shuffle_hash")
    s2 = sh.select(F.col(id_col).alias("id2"),
                   dd._i32("hs").alias("sh2")).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    scored = dd._persist(
        cand.join(s1, "id1").join(s2, "id2")
            .select("id1", "id2",
                    F.round(inter.cast("double") / union, 6)
                     .alias("jaccard")))
    return (scored.filter(F.col("jaccard") >= threshold)
                  .select("id1", "id2", "jaccard"))


def prefix_v2(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              k: int = 9, threshold: float = 0.6) -> DataFrame:
    """Bayardo-asymmetric prefixes + barrier verify."""
    import airline_data_warehouse_spark.operators.dedup as dd

    t = F.lit(Decimal(str(threshold)).quantize(Decimal("0.000001")))
    sh = dd._persist(dd.shingled(df, text_col, id_col, k))
    tok = sh.select(F.col(id_col), F.size("hs").alias("n"),
                    F.explode("hs").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
    pos = F.row_number().over(Window.partitionBy(id_col).orderBy("df_t", "t"))
    # probe prefix: n - ceil(t*n) + 1 (the long one); the indexed side
    # additionally filters to its first n - ceil(2t/(1+t)*n) + 1 tokens.
    # 2t/(1+t) in exact decimal: 2*t and 1+t are exact, their quotient
    # is NOT always finite-decimal, so express the bound multiplicatively:
    # pos <= n - ceil(2t*n/(1+t)) + 1  <=>  ceil-free exact form below.
    ranked = dd._persist(
        tok.join(freq.hint("shuffle_hash"), "t")
           .withColumn("pos", pos)
           .filter(F.col("pos") <= F.col("n") - F.ceil(t * F.col("n")) + 1)
           .select(id_col, "n", "t", "pos"))
    # ceil(2t*n/(1+t)) without a non-terminating decimal division:
    # ceil(p/q) = (p + q - 1) div q on positive integers; here p = 2t*n
    # and q = 1+t are DECIMALS with the same scale factor 1e6 —
    # 2t*n*1e6 and (1+t)*1e6 are exact integers, so compute in integer
    # units: ceil(2t*n/(1+t)) = floor((2*t*n*S + (1+t)*S - 1) / ((1+t)*S))
    # with S = 1e6.
    s_ = 10 ** 6
    p_int = (F.lit(2) * t * F.col("n") * s_).cast("decimal(38,0)")
    q_int = F.lit(int((Decimal("1") + Decimal(str(threshold))
                       .quantize(Decimal("0.000001"))) * s_)) \
        .cast("decimal(38,0)")
    alpha_min = ((p_int + q_int - F.lit(1).cast("decimal(38,0)"))
                 / q_int).cast("long")  # spark decimal div then floor?
    # NOTE: decimal division is not integer division; use explicit mod
    num = p_int + q_int - F.lit(1).cast("decimal(38,0)")
    alpha_min = ((num - num % q_int) / q_int).cast("long")
    short = ranked.filter(F.col("pos")
                          <= F.col("n") - alpha_min + 1)
    a = ranked.select(F.col(id_col).alias("id1"), F.col("n").alias("n1"),
                      F.col("pos").alias("p1"), "t")
    b = short.select(F.col(id_col).alias("id2"), F.col("n").alias("n2"),
                     F.col("pos").alias("p2"), "t")
    ub = F.lit(1) + F.least(F.col("n1") - F.col("p1"),
                            F.col("n2") - F.col("p2"))
    # pair order: (n2, id2) <lex (n1, id1) — the indexed side is the
    # smaller set; re-orient to (lesser id, greater id) after
    bigger = ((F.col("n2") < F.col("n1"))
              | ((F.col("n2") == F.col("n1"))
                 & (F.col("id2") < F.col("id1"))))
    cand = (a.join(b, "t")
             .filter(bigger
                     & (F.col("n2") >= t * F.col("n1"))
                     & (ub * (1 + t) >= t * (F.col("n1") + F.col("n2"))))
             .select(F.least("id1", "id2").alias("id1"),
                     F.greatest("id1", "id2").alias("id2"))
             .distinct())
    return _barrier_verify(dd, sh, cand, id_col, threshold)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    sf_dir = f"/root/testdata/{sf}"
    spark = _spark()
    from airline_data_warehouse_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        release_caches,
    )
    from airline_data_warehouse_spark.plans.llmops import _text_corpus

    def corpus():
        return _text_corpus(spark, sf_dir)

    print("== output identity ==")
    _same(prefix_v0(corpus()), prefix_filter_jaccard_pairs(corpus()))
    release_caches()
    print("== timing (A-B-A-B bracket: old impl measured before AND "
          "after the new one, so box-contention drift is visible) ==")
    _time(lambda: prefix_v0(corpus()), "OLD(1) symmetric+pushdown")
    _time(lambda: prefix_filter_jaccard_pairs(corpus()), "NEW(1) registered")
    _time(lambda: prefix_v0(corpus()), "OLD(2)")
    _time(lambda: prefix_filter_jaccard_pairs(corpus()), "NEW(2)")


if __name__ == "__main__":
    main()
