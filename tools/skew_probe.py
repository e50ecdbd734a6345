"""Zipfian skew stress (VERDICT r06 item 7): the scale probe replicates
data uniformly, which never exercises the straggler path — this probe
builds a zipf-keyed events table (top key ≈ 29 % of all rows, the
hot-key shape salting exists for) at ~16× sf0.1 volume and measures
PER-STAGE task-time balance (max task / median task executorRunTime,
from the Spark UI REST API) for the groupBy/join heavyweights:

  agg_plain     groupBy(user_id) distinct-set aggregate, no mitigation
  agg_salted    skew.salted_agg two-stage (key, salt) aggregate
  join_plain    events ⋈ customer shuffle join
  join_salted   skew.salted_join (skewed side salted, small replicated)

The aggregate is collect_set-shaped (distinct event ids per user) on
purpose: sum/count skew is already absorbed by map-side partial
aggregation, but set/list-building partials stay proportional to the
hot key's rows — the aggregate shape that actually straggles at 100 TB.
The probe session disables AQE partition coalescing: at sf0.1 the whole
shuffle fits one AQE-coalesced task, which HIDES the imbalance this
probe exists to measure; at 100 TB the hot partition exceeds any
coalesce target and runs alone regardless.

Pass criterion (asserted): no stage of a SALTED job exceeds
max/median ≈ 4× on stages with meaningful work (≥4 tasks and median
≥50 ms — below that, constant task overhead dominates and the ratio is
noise). Plain variants are reported for contrast, not asserted — AQE
can split skewed JOIN partitions at runtime (size-thresholded, so not
at probe scale), but a skewed AGGREGATE's hot key cannot be split
without changing semantics, which is exactly why salted_agg exists.

Usage: python tools/skew_probe.py [zipf_s] (default 1.5)
Prints one JSON line per job with the worst qualifying stage.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
REPLICATE = 64


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}",
                                timeout=30) as r:
        return json.load(r)


def _stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in _api(spark, "/stages")}


def stage_balance(spark, before: set[int]) -> list[dict]:
    """max/median executorRunTime per completed stage not in `before`.
    Stages with median < 50 ms are reported (down to 20 ms) but marked
    ``noise_floor`` — constant task overhead dominates there, so they
    are excluded from the pass/fail assertion; a salted job whose every
    stage lands under the floor has spread the hot key so evenly that
    no task does measurable excess work, which is the success case."""
    out = []
    for s in _api(spark, "/stages?status=COMPLETE"):
        if s["stageId"] in before or s["numCompleteTasks"] < 4:
            continue
        q = _api(spark, f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                        "?quantiles=0.0,0.5,1.0")
        lo, med, hi = q["executorRunTime"]
        if med < 20:
            continue
        out.append({"stage": s["stageId"], "tasks": s["numCompleteTasks"],
                    "median_ms": round(med), "max_ms": round(hi),
                    "ratio": round(hi / max(med, 1e-9), 2),
                    "noise_floor": med < 50})
    return out


def build_zipf_events(spark, out_path: str, s: float) -> None:
    """Events replicated 16× with zipf(s) user keys: u = deterministic
    per-row uniform, k = ceil(u^(-1/(s-1))) → P(k) ∝ k^-s; k capped at
    the customer key range so the join probe keeps matching."""
    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.plans.registry import load

    ev = load(spark, BASE, "events").select("event_id", "value")
    reps = spark.range(REPLICATE).select(F.col("id").alias("_rep"))
    big = ev.crossJoin(F.broadcast(reps))
    u = (F.pmod(F.xxhash64("event_id", "_rep"), F.lit(1_000_000)) + 1) / 1_000_000.0
    k = F.least(F.ceil(F.pow(u, F.lit(-1.0 / (s - 1.0)))).cast("long"),
                F.lit(14_999))
    (big.select((F.col("event_id") * REPLICATE + F.col("_rep")).alias("event_id"),
                k.alias("user_id"), "value")
        # even out the files: the crossJoin's output partitioning is
        # lopsided, and uneven INPUT splits would show up as map-stage
        # imbalance unrelated to the key skew being measured
        .repartition(32)
        .write.mode("overwrite").parquet(out_path))


def main() -> int:
    s = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.operators.skew import salted_agg, salted_join
    from airline_data_warehouse_spark.plans.registry import load
    from airline_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # probe-only: coalescing folds the whole sf0.1 shuffle into one task,
    # hiding the per-partition imbalance being measured (see module doc)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    zipf_path = "/tmp/adw_zipf_events"
    build_zipf_events(spark, zipf_path, s)
    ev = spark.read.parquet(zipf_path)
    n = ev.count()
    top = (ev.groupBy("user_id").count().orderBy(F.col("count").desc())
             .limit(1).collect()[0])
    print(f"zipf s={s}: {n} rows, hottest key {top['user_id']} holds "
          f"{top['count']} rows ({100.0 * top['count'] / n:.1f}%)", flush=True)
    cust = (load(spark, BASE, "customer")
            .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))

    jobs = {
        "agg_plain": lambda: ev.groupBy("user_id").agg(
            F.size(F.collect_set("event_id")).alias("n_distinct")),
        "agg_salted": lambda: salted_agg(
            ev, ["user_id"],
            partial_aggs=[F.collect_set("event_id").alias("_s")],
            final_aggs=[F.size(F.array_distinct(
                F.flatten(F.collect_list("_s")))).alias("n_distinct")]),
        "join_plain": lambda: ev.join(cust.hint("shuffle_hash"), "user_id")
            .groupBy("c_mktsegment").count(),
        "join_salted": lambda: salted_join(ev, cust, "user_id")
            .groupBy("c_mktsegment").count(),
    }
    failures = []
    results = {}
    for name, job in jobs.items():
        before = _stage_ids(spark)
        job().write.format("noop").mode("overwrite").save()
        stages = stage_balance(spark, before)
        solid = [x for x in stages if not x["noise_floor"]]
        worst = max(solid, key=lambda x: x["ratio"]) if solid else \
            (max(stages, key=lambda x: x["ratio"]) if stages else None)
        results[name] = {"worst_stage": worst, "n_stages_measured": len(stages)}
        print(json.dumps({name: results[name]}), flush=True)
        if name.endswith("_salted") and worst \
                and not worst["noise_floor"] and worst["ratio"] > 4.0:
            failures.append((name, worst))
    if failures:
        print(f"SKEW FAIL: {failures}")
        return 1
    print("SKEW OK: all salted stages max/median <= 4x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
