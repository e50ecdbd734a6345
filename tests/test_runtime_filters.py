"""Runtime bloom-filter join pruning — the engine's declarative answer
to 'pre-filter a huge fact against a selective dimension before the
shuffle'. Spark injects a bloom_filter_agg on the selective (creation)
side and a might_contain probe into the fact scan, cutting shuffle
volume by the non-matching fraction with zero code in our plans. We
rely on it at scale, so this pins (a) the feature is ON in our
sessions, and (b) Spark 4 actually injects it for our join shapes when
the size thresholds are met.

The size thresholds exist because the bloom build costs a pass over the
creation side: by default the application side must scan >10 GB before
the build pays for itself. The test drops that threshold to 0 — the
fixture is tiny — to exercise the mechanism, not the cost model.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from airline_data_warehouse_spark.plans.registry import load


def _full_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_runtime_bloom_filter_enabled_by_default(spark):
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir):
    # isolated runtime-conf scope: newSession shares the context but not
    # SQL confs, so the shared test session keeps its thresholds
    s = spark.newSession()
    # force a shuffle join — with a broadcast join the probe side is
    # already filtered by the broadcast hash relation; bloom pruning is
    # the strategy for dims too big (or joins too late) to broadcast
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter."
               "applicationSideScanSizeThreshold", "0")
    li = load(s, sf_dir, "lineitem")
    orders = (load(s, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = _full_plan(j)
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan

    # semantics unchanged: bloom is a pre-filter, never a substitute
    plain = spark.newSession()
    li2 = load(plain, sf_dir, "lineitem")
    o2 = (load(plain, sf_dir, "orders")
          .filter(F.col("o_orderpriority") == "1-URGENT"))
    assert j.count() == li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()
