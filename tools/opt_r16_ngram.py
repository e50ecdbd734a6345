"""r16: ngram_jaccard_pairs OLD (inline verify, pushed filter) vs NEW
(registered, barrier verify) — in-session ABAB on the dedup_cascade
tier-2 corpus shape. Usage: python tools/opt_r16_ngram.py [sf0.1]"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _spark():
    from airline_data_warehouse_spark.session import get_spark
    s = get_spark(app_name="opt-r16-ngram")
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
    print(f"{label}: median {med:.3f}s  min {min(samples):.3f}s  "
          f"samples={[round(s, 3) for s in samples]}")
    return med


def ngram_old(df: DataFrame, threshold: float = 0.6) -> DataFrame:
    import airline_data_warehouse_spark.operators.dedup as dd

    sh = dd._persist(dd.shingled(df, "text", "doc_id", 9))
    cand = dd.minhash_lsh_candidates(df, "text", "doc_id", 9,
                                     shingle_sets=sh)
    s1 = sh.select(F.col("doc_id").alias("id1"),
                   dd._i32("hs").alias("sh1")).hint("shuffle_hash")
    s2 = sh.select(F.col("doc_id").alias("id2"),
                   dd._i32("hs").alias("sh2")).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (cand.join(s1, "id1").join(s2, "id2")
                .withColumn("jaccard",
                            F.round(inter.cast("double") / union, 6))
                .filter(F.col("jaccard") >= threshold)
                .select("id1", "id2", "jaccard"))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    sf_dir = f"/root/testdata/{sf}"
    spark = _spark()
    from airline_data_warehouse_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from airline_data_warehouse_spark.plans.registry import load

    def cascade_corpus():
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        copies = (docs.filter(F.col("doc_id") % 7 == 0)
                  .select((F.col("doc_id") + 2000000).alias("doc_id"),
                          "text"))
        trunc = (docs.filter((F.length("text") >= 100)
                             & (F.col("doc_id") % 3 == 0))
                 .select((F.col("doc_id") + 3000000).alias("doc_id"),
                         F.expr("substr(text, 1, (length(text) * 9) "
                                "div 10)").alias("text")))
        para = (docs.filter(F.col("doc_id") % 5 == 0)
                .select((F.col("doc_id") + 1000000).alias("doc_id"),
                        F.array_join(F.reverse(F.split(F.col("text"), " ")),
                                     " ").alias("text")))
        return docs.unionByName(copies).unionByName(trunc).unionByName(para)

    _time(lambda: ngram_old(cascade_corpus()), "OLD(1)")
    _time(lambda: ngram_jaccard_pairs(cascade_corpus(), threshold=0.6),
          "NEW(1)")
    _time(lambda: ngram_old(cascade_corpus()), "OLD(2)")
    _time(lambda: ngram_jaccard_pairs(cascade_corpus(), threshold=0.6),
          "NEW(2)")


if __name__ == "__main__":
    main()
