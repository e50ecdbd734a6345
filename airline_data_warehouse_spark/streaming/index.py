"""Continuous embedding-index maintenance: keep a persisted IVFADC
index (`operators.similarity.ivfpq_index_build`) current against a
stream of new vectors — the live form of the daily
`ivfpq_index_append` loop, completing the index lifecycle
(build → query → append → STREAM) the way streaming/dedup.py's cascade
ingest completes the dedup cascade's.

Every micro-batch is frozen-quantizer encoded (assign to the stored
coarse centroids, residual-PQ against the stored codebook — NO
retraining on the hot path) and MERGEd into its list partitions
through sources/atomic.py's crash-safe stage-then-swap; foreachBatch's
at-least-once retries converge because the MERGE is keyed on the
vector id. Each batch's drift report (increment reconstruction error
vs the build-time baseline) is appended to ``{index_dir}/append_log``
so an operator — or a scheduled job reading the log — can decide when
to schedule the offline `ivfpq_index_build` rebuild; appends stay
CORRECT under drift (codes are exact under the frozen quantizers),
only ADC resolution (recall) degrades.

Scale posture: per-batch cost is increment-proportional — n_lists
broadcast centroids, m×codes_k broadcast codebook, and directory
rewrites bounded by the touched lists — never corpus-proportional;
the index itself grows only by the appended codes (+ vectors when the
index stores them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_log(spark: SparkSession, index_dir: str) -> DataFrame:
    """The per-batch drift log the ingest writes: (batch_id, appended,
    mean_d2, baseline_mean_d2, retrain_recommended). The retrain
    scheduler's input."""
    return spark.read.parquet(f"{index_dir}/append_log")


def start_index_ingest(stream: DataFrame, index_dir: str,
                       checkpoint_dir: str | None = None,
                       m: int = 4, dims: int = 64,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       drift_factor: float = 1.5):
    """foreachBatch loop: frozen-quantizer append of each micro-batch
    into the persisted index, plus one drift-log row per batch. The
    index must already exist (`ivfpq_index_build`) — an index is
    trained offline by contract; a stream that starts before the build
    fails its first batch loudly rather than inventing quantizers."""
    from airline_data_warehouse_spark.operators.similarity import (
        ivfpq_index_append,
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rep = ivfpq_index_append(spark, index_dir, batch_df, m=m,
                                 dims=dims, id_col=id_col,
                                 vec_col=vec_col,
                                 drift_factor=drift_factor)
        (spark.createDataFrame(
            [(int(batch_id), rep["appended"], rep["mean_d2"],
              rep["baseline_mean_d2"], rep["retrain_recommended"])],
            "batch_id long, appended long, mean_d2 double, "
            "baseline_mean_d2 double, retrain_recommended boolean")
         .coalesce(1).write.mode("append")
         .parquet(f"{index_dir}/append_log"))

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
