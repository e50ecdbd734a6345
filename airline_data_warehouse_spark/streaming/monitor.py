"""Continuous data-quality monitoring: the streaming face of the batch
`data_quality_report` — every micro-batch of an event stream is scored
against the accepted-values / non-null / non-negative checks and ONE
row per (batch, check) is appended to a metrics table, giving the
ops-side a queryable violation time series instead of a point-in-time
report.

foreachBatch is the right tool (not a windowed aggregate): the grain is
the MICRO-BATCH, an operational unit with no event-time meaning, and
the sink append must be atomic-per-batch for exactly-once metrics under
retries — foreachBatch gives both (epoch id + idempotent overwrite of
the batch's partition directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACCEPTED_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def batch_quality_counts(batch: DataFrame) -> DataFrame:
    """One row per check for one (micro-)batch of events:
    (check_name, n_rows, n_violations). Pure aggregation — shared by
    the stream monitor and any backfill over historical partitions."""
    total = F.count(F.lit(1))
    bad_type = F.sum((~F.col("event_type").isin(*ACCEPTED_EVENT_TYPES)
                      | F.col("event_type").isNull()).cast("long"))
    null_user = F.sum(F.col("user_id").isNull().cast("long"))
    neg_value = F.sum(((F.col("value") < 0)
                       | F.col("value").isNull()).cast("long"))
    agg = batch.agg(total.alias("n_rows"),
                    bad_type.alias("accepted_event_types"),
                    null_user.alias("non_null_user"),
                    neg_value.alias("nonneg_value"))
    long = agg.unpivot("n_rows", ["accepted_event_types", "non_null_user",
                                  "nonneg_value"],
                       "check_name", "n_violations")
    return long.select("check_name", F.col("n_rows").cast("long"),
                       F.coalesce(F.col("n_violations"), F.lit(0))
                        .cast("long").alias("n_violations"))


def start_quality_monitor(events: DataFrame, dest: str,
                          checkpoint: str):
    """Attach the quality monitor to an event stream: per micro-batch,
    append (batch_id, check_name, n_rows, n_violations) rows to the
    parquet metrics table at ``dest``, partitioned by batch_id so a
    retried epoch overwrites ITS OWN partition (idempotent
    exactly-once metrics) instead of double-appending."""

    def write_metrics(batch: DataFrame, batch_id: int) -> None:
        counts = (batch_quality_counts(batch)
                  .withColumn("batch_id", F.lit(batch_id).cast("long")))
        (counts.coalesce(1).write.mode("overwrite")
               .option("partitionOverwriteMode", "dynamic")
               .partitionBy("batch_id").parquet(dest))

    return (events.writeStream.foreachBatch(write_metrics)
            .option("checkpointLocation", checkpoint).start())
