"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end via the `noop` sink (full plan runs, no
driver-side collection skew). A small warm-up action amortizes JVM/codegen
startup out of the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_star_revenue",
    "role_playing_dim_join",
    "cube_region_priority",
    "revenue_rollup",
    "latest_event_per_key",
    "topk_per_group",
    "std_amount",
    "std_date_multiformat",
    "text_quality_score",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "text_lang_id",
    "multimodal_decode_fake",
    "event_sessionization",
    "salted_aggregation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airline_data_warehouse_spark.plans.registry import all_queries
    from airline_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="adw-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm-up: JVM, parquet footer reads, codegen
    registry["flagship_star_revenue"].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    from airline_data_warehouse_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        registry[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        release_caches()  # per-query cache lifetime: no cross-query memory creep

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }))


if __name__ == "__main__":
    main()
