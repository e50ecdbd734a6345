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


def start_neardup_ingest(stream: DataFrame, store_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         checkpoint_dir: str | None = None,
                         threshold: float = 0.6):
    """Continuous near-duplicate ingest: every micro-batch is MinHash-
    banded and joined against the ACCUMULATED corpus band store, flagged
    near-dups are appended to ``{store_dir}/pairs``, and the batch's own
    bands are appended to ``{store_dir}/bands`` — the
    ``incremental_minhash_pairs`` daily-ingest shape run continuously
    via foreachBatch.

    The store is the persisted signature state the batch operators
    describe (minhash_band_table docstring): ``bands`` (LSH_BANDS rows ×
    ~50 bytes per document) for candidate generation and ``shingles``
    (the 31-bit hash sets) for the exact-Jaccard verify — both orders of
    magnitude smaller than text, plain parquet that a 100 TB deployment
    swaps for a Delta/Iceberg table (append semantics are identical).
    The join is band-keyed — per-batch cost scales with |batch| ×
    collision rate, never corpus² — and only band-collision candidates
    ever touch the shingle sets.

    Exactly-once note: foreachBatch gives at-least-once sinks on
    retry; the pairs/bands appends are idempotent-by-content (dedup on
    read via DISTINCT, or MERGE on a transactional table). Batch-side
    near-dups WITHIN one micro-batch are reported by the batch
    ``ngram_jaccard_pairs`` over the silver table, matching the batch
    operator's contract.
    """
    import os

    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.operators.dedup import (
        minhash_band_table,
        release_caches,
        shingled,
    )

    bands_dir = os.path.join(store_dir, "bands")
    shingles_dir = os.path.join(store_dir, "shingles")
    pairs_dir = os.path.join(store_dir, "pairs")

    def store_exists(spark) -> bool:
        # Explicit existence probe via the Hadoop FileSystem API, instead
        # of read-and-swallow: a transient/corrupt-store READ failure must
        # fail the micro-batch (structured streaming retries it) rather
        # than silently skipping near-dup detection for the whole batch
        # while still appending its bands — which would lose that batch's
        # pairs permanently (ADVICE r06).
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(bands_dir)
        return path.getFileSystem(conf).exists(path)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh = shingled(batch_df, text_col, id_col).persist()
        new_bands = minhash_band_table(sh, id_col).persist()
        try:
            # first batch: no store yet → skip the corpus join only then
            corpus_bands = (spark.read.parquet(bands_dir)
                            if store_exists(spark) else None)
            if corpus_bands is not None:
                cand = (new_bands.alias("i")
                        .join(corpus_bands.alias("c"), ["band", "band_key"])
                        .filter(F.col(f"i.{id_col}") != F.col(f"c.{id_col}"))
                        .select(F.col(f"i.{id_col}").alias("inc_id"),
                                F.col(f"c.{id_col}").alias("corpus_id"))
                        .distinct())
                s1 = sh.select(F.col(id_col).alias("inc_id"),
                               F.col("hs").alias("sh1"))
                s2 = (spark.read.parquet(shingles_dir)
                      .select(F.col(id_col).alias("corpus_id"),
                              F.col("hs").alias("sh2")))
                inter = F.size(F.array_intersect("sh1", "sh2"))
                union = F.size("sh1") + F.size("sh2") - inter
                verified = (cand.join(s1, "inc_id").join(s2, "corpus_id")
                            .withColumn("jaccard",
                                        F.round(inter.cast("double") / union, 6))
                            .filter(F.col("jaccard") >= threshold)
                            .select("inc_id", "corpus_id", "jaccard"))
                (verified.withColumn("batch_id", F.lit(batch_id))
                         .write.mode("append").parquet(pairs_dir))
            new_bands.write.mode("append").parquet(bands_dir)
            sh.write.mode("append").parquet(shingles_dir)
        finally:
            new_bands.unpersist()
            sh.unpersist()
            release_caches()

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
