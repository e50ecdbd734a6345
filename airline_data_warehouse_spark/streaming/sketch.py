"""Continuous Count-Min maintenance: keep a persisted CMS current
against a token stream — the live form of `operators.sketches`, and
the reason the sketch earned its place (a LINEAR sketch is the
frequency state a stream can actually keep: per-batch sketches merge
into the running one by cell-wise addition, where an exact per-token
count table grows with Heaps' law forever and every merge is
vocabulary-sized).

Exactly-once accounting on top of foreachBatch's at-least-once
replays, WITHOUT a keyed idempotent merge (cell-wise ADD double-counts
on a blind retry):

* Each micro-batch writes its OWN sketch to
  ``{store}/batches/batch_id=N`` with per-partition overwrite — the
  Structured Streaming contract replays a failed batch with the same
  batch_id and the same data, so the retry overwrites the partition
  with identical content instead of adding to it.
* A maintenance fold (every ``fold_every`` batches, inside the
  foreachBatch thread — single-maintenance-process, the index-ingest
  convention) aggregates base + new batch partitions into a fresh base
  carrying a ``folded_through`` WATERMARK column, swapped in atomically
  (sources/atomic.replace_directory). Batch partitions ≤ the watermark
  are garbage from that instant: readers IGNORE them (the watermark,
  not directory presence, is truth), so the post-swap cleanup can crash
  or race a retry re-creating a folded partition without ever
  double-counting.
* Read = base cells + batch partitions ABOVE the watermark, cell-wise
  sum — ≤ (1 + batches-since-fold)·depth·width rows, always tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    countmin_build,
    countmin_estimate,
)

_BASE_SCHEMA = ("row int, bucket int, counter long, "
                "folded_through long")


def _base_dir(store_dir: str) -> str:
    return f"{store_dir}/base"


def _batches_dir(store_dir: str) -> str:
    return f"{store_dir}/batches"


def read_countmin_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged sketch (row, bucket, counter): base cells + the batch
    partitions the watermark says are NOT yet folded. Heals a base
    stranded mid-swap first (the store-reader convention). Partitions
    at/below the watermark are ignored even when their directories
    exist — they are either post-fold garbage awaiting cleanup or a
    replayed batch's re-creation; counting them would double-add."""
    from airline_data_warehouse_spark.sources.atomic import (
        _fs,
        recover_directory,
    )

    base_path = _base_dir(store_dir)
    recover_directory(spark, base_path)
    hpath, fs = _fs(spark, store_dir)  # Hadoop FS API: non-local stores
    watermark = -1
    parts = []
    if fs.exists(hpath(base_path)):
        base = spark.read.schema(_BASE_SCHEMA).parquet(base_path)
        head = base.select("folded_through").first()
        if head is not None:
            watermark = head["folded_through"]
        parts.append(base.select("row", "bucket", "counter"))
    bdir = _batches_dir(store_dir)
    if fs.exists(hpath(bdir)):
        # explicit schema: a post-fold batches dir is EMPTY (every
        # partition swept), where inference would throw; batch_id is
        # the directory-derived partition column
        inc = (spark.read
               .schema("row int, bucket int, counter long, batch_id long")
               .parquet(bdir)
               .filter(F.col("batch_id") > watermark)
               .select("row", "bucket", "counter"))
        parts.append(inc)
    if not parts:
        return spark.createDataFrame([], "row int, bucket int, counter long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.groupBy("row", "bucket")
            .agg(F.sum("counter").alias("counter")))


def countmin_store_estimate(spark: SparkSession, store_dir: str,
                            probes: DataFrame, token_col: str = "token",
                            depth: int = CMS_DEPTH,
                            width: int = CMS_WIDTH) -> DataFrame:
    """(token, est_count) for the probes against the store's current
    merged sketch — the query surface a monitoring/quality loop hits
    between folds."""
    return countmin_estimate(read_countmin_store(spark, store_dir),
                             probes, token_col, depth, width)


def fold_countmin_store(spark: SparkSession, store_dir: str,
                        depth: int = CMS_DEPTH,
                        width: int = CMS_WIDTH) -> int:
    """Fold every batch partition above the current watermark into the
    base: aggregate (base ∪ new batches) cell-wise, stamp
    folded_through = max folded batch_id, swap the base directory in
    atomically, THEN delete the folded partitions (safe at any point —
    readers trust the watermark, not directory presence; a crash
    between swap and cleanup leaves ignorable garbage the next fold's
    cleanup sweeps). Returns the new watermark (-1 if nothing to fold).

    Scale shape: the fold reads ≤ (1 + batches-since-fold)·d·w rows and
    writes ≤ d·w — constant-bounded, like everything else the sketch
    touches."""
    from airline_data_warehouse_spark.sources.atomic import (
        _fs,
        recover_directory,
        replace_directory,
    )

    base_path = _base_dir(store_dir)
    recover_directory(spark, base_path)
    hpath, fs = _fs(spark, store_dir)  # Hadoop FS API: non-local stores
    watermark = -1
    if fs.exists(hpath(base_path)):
        head = (spark.read.schema(_BASE_SCHEMA).parquet(base_path)
                .select("folded_through").first())
        if head is not None:
            watermark = head["folded_through"]
    bdir = _batches_dir(store_dir)
    if not fs.exists(hpath(bdir)):
        return watermark
    batch_ids = [int(s.getPath().getName().split("=", 1)[1])
                 for s in fs.listStatus(hpath(bdir))
                 if s.isDirectory()
                 and s.getPath().getName().startswith("batch_id=")]
    new_ids = [b for b in batch_ids if b > watermark]
    if not new_ids:
        # nothing to fold, but sweep pre-watermark garbage (a replayed
        # batch re-created after its fold, or a crash between a prior
        # fold's swap and cleanup) — readers already ignore it
        for b in batch_ids:
            fs.delete(hpath(f"{bdir}/batch_id={b}"), True)
        return watermark
    new_mark = max(new_ids)
    merged = (read_countmin_store(spark, store_dir)
              .withColumn("folded_through", F.lit(new_mark).cast("long")))
    replace_directory(spark, merged, base_path)
    for b in batch_ids:          # includes pre-watermark garbage
        if b <= new_mark:
            fs.delete(hpath(f"{bdir}/batch_id={b}"), True)
    return new_mark


def start_countmin_ingest(stream: DataFrame, store_dir: str,
                          checkpoint_dir: str | None = None,
                          token_col: str = "token",
                          weight_col: str | None = None,
                          depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                          fold_every: int | None = 8):
    """foreachBatch loop: sketch each micro-batch
    (operators.sketches.countmin_build — the ≤ d·w-cell aggregation)
    into its own ``batch_id=N`` partition, folding into the watermarked
    base every ``fold_every`` batches. Retries converge by
    per-partition overwrite + the read-side watermark rule; fold runs
    inside this thread (single-maintenance-process). None disables
    folding (the read path still sums, just over more partitions)."""

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cells = countmin_build(batch_df, token_col=token_col,
                               weight_col=weight_col,
                               depth=depth, width=width)
        (cells.coalesce(1).write.mode("overwrite")
         .parquet(f"{_batches_dir(store_dir)}/batch_id={int(batch_id)}"))
        if fold_every and batch_id > 0 and batch_id % fold_every == 0:
            fold_countmin_store(spark, store_dir, depth, width)

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_bloom_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """The accumulated Bloom bit set (bit int, distinct) — heals a
    store stranded mid-compaction first (the store-reader convention),
    then de-duplicates across batch appends at read time."""
    from airline_data_warehouse_spark.sources.atomic import (
        _fs,
        recover_directory,
    )

    bdir = f"{store_dir}/bits"
    recover_directory(spark, bdir)
    hpath, fs = _fs(spark, bdir)
    if not fs.exists(hpath(bdir)):
        return spark.createDataFrame([], "bit int")
    return (spark.read.schema("bit int").parquet(bdir)
            .select("bit").distinct())


def start_bloom_ingest(stream: DataFrame, store_dir: str,
                       checkpoint_dir: str | None = None,
                       hash_col: str = "sh",
                       hashes: int | None = None,
                       bits: int | None = None,
                       compact_every: int | None = 8):
    """foreachBatch loop: accumulate a growing Bloom blocklist from a
    member stream (new benchmark n-grams, newly revoked content) — the
    filter every decontamination probe then reads with
    read_bloom_store + operators.sketches.bloom_probe.

    Unlike the Count-Min store, NO watermark machinery is needed: a
    bit set is idempotent under union, so an at-least-once replay
    appending the same bits twice changes nothing the read-time
    DISTINCT doesn't absorb. Every ``compact_every`` batches the
    accumulated appends are rewritten as one de-duplicated file
    (replace_directory stage-then-swap) — bounding both file count
    and row count at ≤ ``bits`` (the r10 unbounded-log lesson)."""
    from airline_data_warehouse_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_build,
    )
    from airline_data_warehouse_spark.sources.atomic import (
        replace_directory,
    )

    k = BLOOM_HASHES if hashes is None else hashes
    m = BLOOM_BITS if bits is None else bits
    bdir = f"{store_dir}/bits"

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        (bloom_build(batch_df, hash_col, hashes=k, bits=m)
         .coalesce(1).write.mode("append").parquet(bdir))
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            replace_directory(spark, read_bloom_store(spark, store_dir),
                              bdir)

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


_QD_BASE_SCHEMA = "id long, cnt long, folded_through long"


def read_qdigest_leaves(spark: SparkSession, store_dir: str) -> DataFrame:
    """The accumulated LEAF-COUNT state (id, cnt): base + the batch
    partitions above the watermark, summed per value — same
    watermark-not-directory truth as the Count-Min store (the fold/
    retry reasoning transfers verbatim because both states are LINEAR:
    per-batch frames merge by keyed addition).

    The store keeps LEAF COUNTS, not compressed digests, on purpose:
    a compressed q-digest depends on the batch split (compression
    states differ), but leaf counts are a pure function of the row
    multiset — so the store stays bit-certifiable against a batch
    oracle AND any read can compress at whatever k it wants. Rows are
    bounded by the value DOMAIN (≤ 2^(branch_bits·levels)), not the
    stream length."""
    from airline_data_warehouse_spark.sources.atomic import (
        _fs,
        recover_directory,
    )

    base_path = _base_dir(store_dir)
    recover_directory(spark, base_path)
    hpath, fs = _fs(spark, store_dir)
    watermark = -1
    parts = []
    if fs.exists(hpath(base_path)):
        base = spark.read.schema(_QD_BASE_SCHEMA).parquet(base_path)
        head = base.select("folded_through").first()
        if head is not None:
            watermark = head["folded_through"]
        parts.append(base.select("id", "cnt"))
    bdir = _batches_dir(store_dir)
    if fs.exists(hpath(bdir)):
        # explicit schema: a post-fold batches dir is EMPTY
        inc = (spark.read.schema("id long, cnt long, batch_id long")
               .parquet(bdir)
               .filter(F.col("batch_id") > watermark)
               .select("id", "cnt"))
        parts.append(inc)
    if not parts:
        return spark.createDataFrame([], "id long, cnt long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("id").agg(F.sum("cnt").alias("cnt"))


def fold_qdigest_store(spark: SparkSession, store_dir: str) -> int:
    """Fold batch partitions above the watermark into the base — the
    Count-Min fold's reasoning verbatim (linear state, per-partition
    overwrite retries, watermark truth, crash-safe replace_directory
    swap, post-swap cleanup safe at any point). Returns the new
    watermark (-1 if nothing to fold)."""
    from airline_data_warehouse_spark.sources.atomic import (
        _fs,
        recover_directory,
        replace_directory,
    )

    base_path = _base_dir(store_dir)
    recover_directory(spark, base_path)
    hpath, fs = _fs(spark, store_dir)
    watermark = -1
    if fs.exists(hpath(base_path)):
        head = (spark.read.schema(_QD_BASE_SCHEMA).parquet(base_path)
                .select("folded_through").first())
        if head is not None:
            watermark = head["folded_through"]
    bdir = _batches_dir(store_dir)
    if not fs.exists(hpath(bdir)):
        return watermark
    batch_ids = [int(s.getPath().getName().split("=", 1)[1])
                 for s in fs.listStatus(hpath(bdir))
                 if s.isDirectory()
                 and s.getPath().getName().startswith("batch_id=")]
    new_ids = [b for b in batch_ids if b > watermark]
    if not new_ids:
        for b in batch_ids:
            fs.delete(hpath(f"{bdir}/batch_id={b}"), True)
        return watermark
    new_mark = max(new_ids)
    merged = (read_qdigest_leaves(spark, store_dir)
              .withColumn("folded_through", F.lit(new_mark).cast("long")))
    replace_directory(spark, merged, base_path)
    for b in batch_ids:
        if b <= new_mark:
            fs.delete(hpath(f"{bdir}/batch_id={b}"), True)
    return new_mark


def start_qdigest_ingest(stream: DataFrame, store_dir: str,
                         checkpoint_dir: str | None = None,
                         value_col: str = "v",
                         fold_every: int | None = 8):
    """foreachBatch loop: per-batch leaf counts of an integer value
    stream into their own ``batch_id=N`` partition, folded into the
    watermarked base every ``fold_every`` batches — the quantile
    member of the streaming sketch-store family (CMS folds / Bloom
    appends). Any reader compresses the accumulated leaves at read
    time (operators/sketches._qd_compress via qdigest_store_quantiles)
    — so the stream maintains ONE linear state serving every k."""

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        leaves = (batch_df
                  .select(F.col(value_col).cast("long").alias("id"))
                  .filter(F.col("id").isNotNull())
                  .groupBy("id")
                  .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
        (leaves.coalesce(1).write.mode("overwrite")
         .parquet(f"{_batches_dir(store_dir)}/batch_id={int(batch_id)}"))
        if fold_every and batch_id > 0 and batch_id % fold_every == 0:
            fold_qdigest_store(spark, store_dir)

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def qdigest_store_quantiles(spark: SparkSession, store_dir: str,
                            pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
                            k: int | None = None) -> DataFrame:
    """Quantile estimates off the accumulated store: compress the leaf
    state with the standard tree parameters (at read-time ``k``), then
    the canonical rank read — (pct, rnk, est_value). Because the leaf
    state ≡ the batch leaf counts of all streamed rows, this result is
    BIT-IDENTICAL to qdigest_build + qdigest_quantiles over the same
    rows, whatever the batch split or fold timing was (the property
    the stream_quantile_read certificate pins)."""
    from airline_data_warehouse_spark.operators.sketches import (
        QD_BRANCH_BITS,
        QD_K,
        QD_LEVELS,
        _qd_compress,
        qdigest_quantiles,
    )

    kk = QD_K if k is None else k
    leaves = (read_qdigest_leaves(spark, store_dir)
              .withColumn("lvl", F.lit(0).cast("int")))
    nrow = leaves.agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    if not nrow:
        return spark.createDataFrame(
            [], "pct int, rnk long, est_value long")
    n = int(nrow)
    dig = _qd_compress(leaves, max(1, n // kk), QD_LEVELS, QD_BRANCH_BITS)
    return qdigest_quantiles(dig, n, pcts)
