"""Streaming exact deduplication: drop already-seen document payloads at
INGEST time, across micro-batches, with state bounded by a watermark —
the streaming twin of ``operators.dedup.exact_dedup`` and the first
stage a continuously-fed training corpus runs before anything else
touches the data.

Built on ``dropDuplicatesWithinWatermark`` (content hash as the dedup
key): two payloads whose arrival times fall within the watermark delay
of each other dedup exactly, and state for hashes older than the
watermark is evicted — so state size is O(ingest rate × delay), not
O(corpus). That trade is the only scalable one for an unbounded stream;
re-deduplicating against the historical corpus is the batch
``incremental_minhash_pairs`` / ``exact_dedup`` job's role (run them
downstream on the silver table — same hash column, so the work
composes).

Batch parity: ``dedup_batch_exact`` is the same keep-first-by-hash
semantics expressed declaratively, used by the equivalence test to
replay a stream's input and assert the streaming path kept an identical
payload set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 payload hash — the dedup key. One narrow column so the
    streaming state stores 32 bytes per kept doc, never the payload."""
    return df.withColumn("text_hash", F.md5(F.col(text_col)))


def dedup_stream_exact(stream: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "10 minutes") -> DataFrame:
    """Keep the first arrival of each distinct payload within the
    watermark horizon; evict state as event time advances."""
    return (with_content_hash(stream, text_col)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def dedup_batch_exact(df: DataFrame, text_col: str = "text",
                      ts_col: str = "ts", id_col: str = "doc_id") -> DataFrame:
    """Batch replay twin: first row per payload hash by (event time, id)
    — what the stream keeps when every duplicate arrives within the
    watermark."""
    w = Window.partitionBy("text_hash").orderBy(ts_col, id_col)
    return (with_content_hash(df, text_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))
