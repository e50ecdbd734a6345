"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE on (runtime join
re-selection + skew-join splitting), broadcast threshold sized so every
warehouse dimension broadcasts, shuffle partitions sized for the local
harness (cluster deployments override via ``spark-defaults``), and
Arrow enabled for the few Pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the test harness (local[32], 128 GiB). On a real
# cluster, shuffle.partitions should be ~2-3x total cores (or left to
# AQE coalescing with a high initial value); everything else carries over.
_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
    # Parquet scans: keep row-group filter pushdown on (default, pinned
    # here because quarantine/dirty-split correctness relies on reading
    # raw values, never on parse-time coercion).
    "spark.sql.parquet.filterPushdown": "true",
    # Write timestamps as INT64 micros, not legacy INT96: INT96 columns
    # carry NO footer min/max statistics, so every time predicate over
    # engine-written parquet would read every row group — the dominant
    # filter in this warehouse (warehouse.py layout notes, sources/
    # layout.py z-order tiles) would never skip. Micros match the
    # engine's unix_micros arithmetic exactly.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.ansi.enabled": "false",
    # PySpark 4 captures the Python call site for EVERY DataFrame/Column
    # API call (an extra py4j round trip each) to enrich error messages.
    # Across this engine's expression-heavy plan builders that's ~20-30%
    # of plan-construction time (measured r06); errors still carry the
    # full JVM analysis message without it.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(app_name: str = "airline-dw-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to local[$SPARK_GRAFT_CPUS]."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
