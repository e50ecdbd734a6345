"""Bucketed-table joins: pre-shuffled storage so repeated fact-to-fact
joins run with ZERO exchange — the co-location strategy for 100 TB
fact-fact joins that can't broadcast. Asserts the physical plan has no
Exchange on the bucketed join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airline_data_warehouse_spark.plans.registry import load
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def bucketed_session(spark):
    # warehouse dir is a static conf — the session default (./spark-warehouse,
    # gitignored) is fine for the two temp tables this test creates
    return spark


def test_bucketed_join_has_no_shuffle(bucketed_session, sf_dir):
    spark = bucketed_session
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
           .sortBy("o_orderkey").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
             .sortBy("l_orderkey").saveAsTable("lineitem_b"))
    # disable auto-broadcast so the join strategy decision is about
    # co-location, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("lineitem_b")
                  .join(spark.table("orders_b"),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(F.count("*").alias("n")))
        plan = plan_of(joined)
        # bucketed SMJ: sides are pre-partitioned on the join key — the
        # only Exchange allowed is the final small aggregation shuffle
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # results still correct
        n = sum(r["n"] for r in joined.collect())
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
