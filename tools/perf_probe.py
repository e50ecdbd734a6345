"""Ad-hoc perf probe: time registry queries (or experimental variants)
at a given SF with warm JVM, N runs, median — the bench.py measurement
protocol without the full headline sweep. Usage:

    python tools/perf_probe.py sf0.1 name [name ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    names = sys.argv[2:]
    sf_dir = f"/root/testdata/{sf}"
    from airline_data_warehouse_spark.operators.dedup import release_caches
    from airline_data_warehouse_spark.plans.registry import all_queries
    from airline_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    for name in names:
        # warm-up at tiny sf
        try:
            registry[name].builder(spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {name}: {exc}")
        release_caches()
        samples = []
        for _ in range(runs):
            t0 = time.time()
            registry[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            release_caches()
        print(f"{name}: median={statistics.median(samples)} runs={samples}")


if __name__ == "__main__":
    main()
