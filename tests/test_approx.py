"""Accuracy bound for the sketch-based operators (no SQL oracle — the
sketches are engine-specific, so the contract is an error bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airline_data_warehouse_spark.plans.registry import all_queries, load


def test_approx_count_distinct_accuracy(spark, sf_dir):
    approx = {r["o_orderpriority"]: r["approx_distinct_customers"]
              for r in all_queries()["approx_distinct_count"]
              .builder(spark, sf_dir).collect()}
    exact = {r["o_orderpriority"]: r["n"]
             for r in load(spark, sf_dir, "orders")
             .groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex < 0.02, (k, approx[k], ex)
