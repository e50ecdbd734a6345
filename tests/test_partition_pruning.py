"""Hive date-partitioned fact layout (sources/layout.py
write_date_partitioned): directory pruning for static date predicates
and DYNAMIC partition pruning when the dates arrive at runtime through
a filtered-dimension join — the two scan-elision mechanisms a
time-partitioned 100 TB fact relies on. Complements test_layout.py
(footer-stats skipping within files) and test_bucketing.py (shuffle
elision): partitioning prunes LISTINGS, before any footer is opened.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from airline_data_warehouse_spark.plans.registry import load
from airline_data_warehouse_spark.sources.layout import write_date_partitioned
from tests.test_plans import detailed_plan_of


@pytest.fixture(scope="module")
def part_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_day") / "events")
    write_date_partitioned(load(spark, sf_dir, "events"), path)
    return path


def test_layout_one_file_per_day_and_lossless(spark, sf_dir, part_path):
    day_dirs = [d for d in os.listdir(part_path) if d.startswith("event_date=")]
    assert len(day_dirs) >= 3, "fixture needs multiple day directories"
    for d in day_dirs:
        files = [f for f in os.listdir(os.path.join(part_path, d))
                 if f.endswith(".parquet")]
        # the repartition(day) before the write is what guarantees this:
        # without it every upstream task writes its own small file into
        # every day it touches
        assert len(files) == 1, f"{d} has {len(files)} files"
    src = load(spark, sf_dir, "events")
    assert spark.read.parquet(part_path).count() == src.count()


def test_static_date_predicate_prunes_directories(spark, sf_dir, part_path):
    full = spark.read.parquet(part_path)
    days = sorted(r["event_date"]
                  for r in full.select("event_date").distinct().collect())
    one = days[len(days) // 2]
    q = full.filter(F.col("event_date") == F.lit(one))
    plan = detailed_plan_of(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    # the date predicate must be a PARTITION filter (planning-time
    # directory pruning), not a pushed row-group filter
    assert "event_date" in m.group(1), plan
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "event_date" not in pushed.group(1), plan
    src = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    assert q.count() == src.filter(F.col("event_date") == F.lit(one)).count()


def test_dynamic_partition_pruning(spark, sf_dir, part_path):
    """The dates to scan are not known until the dim filter runs: a
    day-of-week predicate on a date dimension joined on the partition
    column. Spark's DPP turns the broadcast dim into a runtime partition
    filter (dynamicpruningexpression in the scan), so only the matching
    day directories are read — the declarative star-join plan degrades
    to a full scan NOWHERE as the fact grows, which is the whole point
    of partitioning the fact by date at 100 TB."""
    fact = spark.read.parquet(part_path)
    days = sorted(r["event_date"]
                  for r in fact.select("event_date").distinct().collect())
    dim = spark.createDataFrame(
        [(d, d.isoweekday()) for d in days], "event_date date, dow int")
    picked_dow = days[0].isoweekday()
    q = fact.join(dim.filter(F.col("dow") == picked_dow), "event_date")
    plan = detailed_plan_of(q)
    assert "dynamicpruning" in plan.lower(), plan
    want = sum(1 for d in days if d.isoweekday() == picked_dow)
    got = q.select("event_date").distinct().count()
    assert got == want
