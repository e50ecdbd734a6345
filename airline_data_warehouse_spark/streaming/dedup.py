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



def _store_dir_exists(spark, path: str) -> bool:
    # Explicit existence probe via the Hadoop FileSystem API, instead of
    # read-and-swallow: a transient/corrupt-store READ failure must fail
    # the micro-batch (structured streaming retries it) rather than
    # silently skipping near-dup detection for the whole batch while
    # still appending its signatures — which would lose that batch's
    # pairs permanently (ADVICE r06).
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf).exists(hpath)


def _read_store(spark, path: str, empty_like: DataFrame, batch_id: int,
                retention_batches: int | None) -> DataFrame:
    """Read ONE signature store dir for classification, independently of
    its siblings. Three contracts in one place:

    * MISSING dir → empty frame with ``empty_like``'s schema. Batch 0's
      appends are sequential, so a crash between them strands a
      partially-present store; probing a single representative dir and
      then reading all siblings (the pre-r09 shape) made every retry
      fail on the missing-path read before any append could create it —
      permanently wedging the stream (ADVICE r08 medium). A store dir
      is only ever absent before its first successful append, so empty
      IS its true content.
    * EXISTING-but-corrupt dir → the read raises and the micro-batch
      fails; structured streaming retries it (test
      test_stream_neardup_corrupt_store_fails_batch pins this).
    * rows with ``batch_id >= `` the current batch are excluded: under
      foreachBatch's at-least-once retry they can only be a crashed
      attempt of THIS batch, and matching a batch against its own
      partial appends would flag every retried doc as a duplicate of
      itself. Normal operation appends strictly after classification,
      so the filter is a no-op there. It also makes retried verdicts
      byte-identical to the crashed attempt's, keeping the
      dedup-on-read story for the verdicts/pairs sinks honest.

    ``retention_batches`` applies the same horizon the compactor
    enforces (see start_neardup_ingest).
    """
    if not _store_dir_exists(spark, path):
        return empty_like.limit(0)
    # explicit schema (empty_like's plus the batch_id every store row
    # carries): spark.read.parquet() otherwise EAGERLY opens a footer
    # per call for schema inference — five driver-side reads per
    # micro-batch that were part of the measured ~5 s/batch cascade
    # floor (VERDICT r09 item 5). recursiveFileLookup serves the
    # TIERED layout (_tier_compact: b{N}/ + c{lo}_{hi}/ subdirs) and
    # is a no-op on the flat cascade stores; Spark's path filter
    # hides in-flight .c*.staging writes.
    schema = empty_like.withColumn("batch_id", F.lit(int(batch_id))).schema
    df = (spark.read.schema(schema)
          .option("recursiveFileLookup", "true").parquet(path)
          .filter(F.col("batch_id") < F.lit(batch_id)))
    if retention_batches is not None:
        df = df.filter(F.col("batch_id") > batch_id - retention_batches)
    return df



def _tier_list(spark, path: str):
    """(hpath-factory, fs, {batch_id: b-dir name}, tier watermark,
    [(lo, hi, c-dir name)]) for a TIERED store dir — the layout
    `_tier_compact` maintains: per-batch appends land in ``b{N}/``
    subdirs, consolidated tiers in ``c{lo}_{hi}/``, and readers list
    both via one recursive scan (Spark hides dot/underscore-prefixed
    paths, so in-flight ``.c*.staging`` writes are invisible)."""
    from airline_data_warehouse_spark.sources.atomic import _fs

    hpath, fs = _fs(spark, path)
    bdirs, tiers, cmax = {}, [], -1
    if fs.exists(hpath(path)):
        for st in fs.listStatus(hpath(path)):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            if name.startswith("b") and name[1:].isdigit():
                bdirs[int(name[1:])] = name
            elif name.startswith("c") and "_" in name:
                lo, _, hi = name[1:].partition("_")
                if lo.isdigit() and hi.isdigit():
                    tiers.append((int(lo), int(hi), name))
                    cmax = max(cmax, int(hi))
    return hpath, fs, bdirs, cmax, tiers


def _tier_compact(spark, path: str, batch_id: int,
                  retention_batches: int | None = None,
                  retain: bool = True,
                  max_tiers: int | None = 8) -> None:
    """TIERED compaction for the streaming signature/span stores —
    ExactSubstr (VERDICT r14 item 2), and since r15 the neardup,
    semantic, and cascade stores too: consolidate ONLY the per-batch
    ``b{N}`` appends above
    the tier watermark into one new ``c{lo}_{hi}`` tier dir — existing
    tiers are never re-read and never rewritten, so bytes rewritten
    per compaction are proportional to the ACTIVE tier (the appends
    since the last compaction), not the accumulated store. The old
    protocol re-read and re-wrote the WHOLE dir every compact_every
    batches: O(N²/compact_every) cumulative write volume on an
    unbounded-retention stream whose state is itself O(corpus tokens).

    Crash story (simpler than the swap protocol it replaces — no
    rename ever hides the only copy of anything):
    * staging writes go to a dot-prefixed ``.c{lo}_{hi}.staging`` dir
      Spark's reader-side path filter hides; a crash mid-write leaves
      hidden garbage this function deletes on the next call (its
      source b-dirs are still intact);
    * the finished tier lands with ONE rename; a crash between that
      rename and the b-dir deletes leaves rows duplicated between the
      new tier and its consumed b-dirs — reads dedup (DISTINCT, the
      at-least-once convention), and the next call sweeps b-dirs at or
      below the watermark WITHOUT merging them (their content is in a
      tier; merging would re-duplicate it);
    * replayed batches re-creating an already-folded ``b{N}`` are the
      same sweep case.

    ``retain=False`` (the spans OUTPUT): no retention filtering — the
    horizon applies to STATE, findings stand (review r14). With
    ``retain=True`` and a horizon, rows below it drop from the new
    tier and WHOLE tiers strictly below it are garbage-collected at
    dir granularity; a tier straddling the horizon stays until it
    falls entirely below (reads filter rows, so overhang is storage,
    never wrong answers).

    ``max_tiers`` bounds TIER-COUNT growth (one new tier per
    compact_every batches would otherwise grow the read-side listing
    linearly in stream lifetime): above the bound, the adjacent tier
    pair with the smallest combined bytes folds into one — the
    size-tiered LSM trade, amortized O(N log N) total write volume,
    one bounded merge per call. None disables folding."""
    hpath, fs, bdirs, cmax, tiers = _tier_list(spark, path)
    if not bdirs and not tiers:
        return
    # sweep crashed staging writes (recreatable — sources intact)
    for st in fs.listStatus(hpath(path)):
        name = st.getPath().getName()
        if name.startswith(".c") and name.endswith(".staging"):
            fs.delete(st.getPath(), True)
    # b-dirs at/below the watermark: replay re-creations or the
    # tail of a crashed previous compaction — content already in a
    # tier, so delete without merging
    for i, name in list(bdirs.items()):
        if i <= cmax:
            fs.delete(hpath(f"{path}/{name}"), True)
            del bdirs[i]
    horizon = (batch_id - retention_batches
               if retain and retention_batches is not None else None)
    if horizon is not None:
        for lo, hi, name in tiers:
            if hi <= horizon:
                fs.delete(hpath(f"{path}/{name}"), True)
    # tiers fully CONTAINED in another tier's range are fold-crash
    # leftovers (the merged tier renamed in, its sources not yet
    # deleted) — their content is in the container; delete, never
    # re-merge (reads deduped the overlap meanwhile)
    tiers = sorted(t for t in tiers
                   if horizon is None or t[1] > horizon)
    contained = [t for t in tiers
                 if any(o[0] <= t[0] and t[1] <= o[1] and o != t
                        for o in tiers)]
    for lo, hi, name in contained:
        fs.delete(hpath(f"{path}/{name}"), True)
    tiers = [t for t in tiers if t not in contained]

    def _write_tier(df, lo: int, hi: int) -> None:
        n_files = max(1, spark.sparkContext.defaultParallelism // 4)
        staging = f"{path}/.c{lo}_{hi}.staging"
        df.coalesce(n_files).write.mode("overwrite").parquet(staging)
        if not fs.rename(hpath(staging), hpath(f"{path}/c{lo}_{hi}")):
            raise IOError(
                f"tier compaction: rename {staging} -> c{lo}_{hi} failed")

    active = sorted(i for i in bdirs if i <= batch_id)
    if active:
        lo, hi = active[0], active[-1]
        df = (spark.read.option("recursiveFileLookup", "true")
              .parquet(*[f"{path}/{bdirs[i]}" for i in active])
              .dropDuplicates())
        if horizon is not None:
            df = df.filter(F.col("batch_id") > horizon)
        _write_tier(df, lo, hi)
        for i in active:
            fs.delete(hpath(f"{path}/{bdirs[i]}"), True)
        tiers.append((lo, hi, f"c{lo}_{hi}"))

    # SIZE-TIERED FOLD (the LSM completion of the tiered protocol):
    # single-level tiering caps per-compaction I/O but lets the TIER
    # COUNT grow one per compact_every batches — at stream lifetimes
    # the read-side listing and per-tier open costs grow linearly.
    # When the count exceeds max_tiers, merge the ADJACENT pair with
    # the smallest combined bytes — one merge per call, so each call's
    # extra I/O is bounded by the smallest pair while repeated folds
    # give the geometric tier-size ladder (amortized O(N log N) total
    # write volume, the classic size-tiered trade; a full fold-to-one
    # would be the O(N²) rewrite this protocol replaced). Same
    # staging/rename crash story; a crash between the merged tier's
    # rename and the source deletes leaves CONTAINED tiers the next
    # call sweeps (above).
    if max_tiers is not None and len(tiers) > max_tiers:
        tiers.sort()
        sizes = [fs.getContentSummary(hpath(f"{path}/{name}")).getLength()
                 for _, _, name in tiers]
        j = min(range(len(tiers) - 1),
                key=lambda i: sizes[i] + sizes[i + 1])
        (alo, _ahi, aname), (_blo, bhi, bname) = tiers[j], tiers[j + 1]
        merged = (spark.read.option("recursiveFileLookup", "true")
                  .parquet(f"{path}/{aname}", f"{path}/{bname}")
                  .dropDuplicates())
        if horizon is not None:
            merged = merged.filter(F.col("batch_id") > horizon)
        _write_tier(merged, alo, bhi)
        fs.delete(hpath(f"{path}/{aname}"), True)
        fs.delete(hpath(f"{path}/{bname}"), True)


def start_neardup_ingest(stream: DataFrame, store_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         checkpoint_dir: str | None = None,
                         threshold: float = 0.6,
                         retention_batches: int | None = None,
                         compact_every: int | None = 16):
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
    read via DISTINCT, or MERGE on a transactional table) and retry
    duplicates are physically removed at the next compaction. Batch-side
    near-dups WITHIN one micro-batch are reported by the batch
    ``ngram_jaccard_pairs`` over the silver table, matching the batch
    operator's contract.

    State story (r07, measured in SCALING.md "Streaming near-dup
    state"): every store row carries its ``batch_id``, and two knobs
    bound the two growth axes —

    * ``retention_batches``: only bands/shingles from the last N
      batches are matched against AND retained at compaction. This is
      the same trade ``dedup_stream_exact``'s watermark makes: state
      becomes O(rate × horizon) instead of O(corpus), and near-dups
      are only detected against the horizon. ``None`` (default) keeps
      the full corpus — the store is signatures, orders of magnitude
      smaller than text, so full-corpus state is usually the RIGHT
      trade; the real per-batch latency driver is file count, which
      compaction bounds independently.
    * ``compact_every``: every N batches the bands/shingles appends
      since the LAST compaction consolidate into a new tier
      (`_tier_compact`, r15 — existing tiers are never rewritten, so
      compaction I/O ∝ the active tier, and the crash story is one
      rename of a dot-hidden staging dir instead of the old
      whole-store swap). Without it, one parquet file per partition
      per batch makes the corpus-side read cost grow linearly in
      BATCH COUNT even when state bytes are flat.
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

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh = shingled(batch_df, text_col, id_col).persist()
        new_bands = minhash_band_table(sh, id_col).persist()
        try:
            # each store dir probed INDIVIDUALLY; a dir missing because
            # batch 0 crashed between the sequential appends reads as
            # empty instead of wedging every retry (_read_store)
            # the gate is a cheap FS probe — batch 0 (no store at all)
            # skips the corpus join; any partially-present sibling on a
            # retry reads as empty through _read_store instead
            if _store_dir_exists(spark, bands_dir):
                corpus_bands = _read_store(spark, bands_dir, new_bands,
                                           batch_id, retention_batches)
                cand = (new_bands.alias("i")
                        .join(corpus_bands.alias("c"), ["band", "band_key"])
                        .filter(F.col(f"i.{id_col}") != F.col(f"c.{id_col}"))
                        .select(F.col(f"i.{id_col}").alias("inc_id"),
                                F.col(f"c.{id_col}").alias("corpus_id"))
                        .distinct())
                # 31-bit hashes ride as array<int> through the verify
                # join (half the shuffle bytes — dedup._i32)
                s1 = sh.select(F.col(id_col).alias("inc_id"),
                               F.col("hs").cast("array<int>").alias("sh1"))
                # corpus shingle store: shuffle_hash, never broadcast —
                # it grows with the accumulated corpus and its array
                # payload's in-heap expansion defeats AQE's size check
                # (same rule as the batch operators, r07)
                s2 = (_read_store(spark, shingles_dir, sh, batch_id,
                                  retention_batches)
                      .select(F.col(id_col).alias("corpus_id"),
                              F.col("hs").cast("array<int>").alias("sh2"))
                      .hint("shuffle_hash"))
                inter = F.size(F.array_intersect("sh1", "sh2"))
                union = F.size("sh1") + F.size("sh2") - inter
                # compute-once barrier before the threshold filter
                # (r16, dedup._verified_jaccard_pairs rationale);
                # released by the finally-block release_caches
                from airline_data_warehouse_spark.operators.dedup import (
                    _persist,
                )
                scored = _persist(
                    cand.join(s1, "inc_id").join(s2, "corpus_id")
                        .select("inc_id", "corpus_id",
                                F.round(inter.cast("double") / union, 6)
                                 .alias("jaccard")))
                verified = scored.filter(F.col("jaccard") >= threshold)
                (verified.withColumn("batch_id", F.lit(batch_id))
                         .write.mode("append").parquet(pairs_dir))
            # coalesce the appends: a micro-batch's signatures are small,
            # and writing one file per shuffle partition per batch is
            # where baseline file-count growth (and with it corpus-read
            # latency) came from in the 50-batch probe. The coalesce
            # reads the PERSISTED frames, so the corpus join above keeps
            # its full parallelism.
            bid = int(batch_id)
            (new_bands.withColumn("batch_id", F.lit(batch_id))
                      .coalesce(4).write.mode("append")
                      .parquet(f"{bands_dir}/b{bid}"))
            (sh.withColumn("batch_id", F.lit(batch_id))
               .coalesce(4).write.mode("append")
               .parquet(f"{shingles_dir}/b{bid}"))
            if compact_every and batch_id > 0 and batch_id % compact_every == 0:
                _tier_compact(spark, bands_dir, bid, retention_batches)
                _tier_compact(spark, shingles_dir, bid, retention_batches)
        finally:
            new_bands.unpersist()
            sh.unpersist()
            release_caches()

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def start_semantic_ingest(stream: DataFrame, store_dir: str,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          checkpoint_dir: str | None = None,
                          threshold: float = 0.99,
                          retention_batches: int | None = None,
                          compact_every: int | None = 16):
    """Continuous SEMANTIC near-duplicate ingest — the embedding twin of
    `start_neardup_ingest`: every micro-batch of (id, vector) rows is
    hyperplane-banded (4 bands × 8 Gaussian sign bits, the
    embedding_near_dup_pairs family) and joined against the ACCUMULATED
    corpus band store; band-collision candidates are verified with
    exact cosine against the accumulated vector store, pairs at/above
    ``threshold`` are appended to ``{store_dir}/pairs``, and the
    batch's own bands/vectors are appended — closing the tier the text
    stream variant lacks (the streaming counterpart of
    operators/dedup.incremental_cascade's tier 3; the store layout is
    cascade_store_build's emb_bands/vectors, so a nightly batch build
    and a continuous ingest can share state).

    Same 100 TB contract as the text twin: per-batch cost ∝ |batch| ×
    band collision rate, never corpus²; non-finite / zero-norm vectors
    are excluded at entry (similarity._finite_ok — one NaN shard must
    not poison every later batch's verify); vector frames are hinted
    shuffle_hash (corpus-proportional array payloads never reach a
    broadcast build); the corpus store appears only through band-keyed
    or id-keyed joins. ``retention_batches`` / ``compact_every`` bound
    the state and file-count growth axes exactly as documented on
    `start_neardup_ingest`, via the same tiered compaction
    (`_tier_compact`, r15); a corrupt store READ fails the micro-batch
    (structured streaming retries) rather than being mistaken for the
    first batch.
    """
    import os

    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.operators import similarity as sim
    from airline_data_warehouse_spark.operators.dedup import release_caches

    bands_dir = os.path.join(store_dir, "emb_bands")
    vectors_dir = os.path.join(store_dir, "vectors")
    pairs_dir = os.path.join(store_dir, "pairs")

    keys = sim.hyperplane_band_keys_sql("v", bands=4, rows_per_band=8)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ev = (batch_df.filter(sim._finite_ok(F.col(vec_col)))
              .select(F.col(id_col),
                      F.transform(F.col(vec_col), lambda x: x.cast("double"))
                       .alias("v")))
        new_vecs = ev.select(id_col, "v", sim._norm(F.col("v")).alias("n")) \
                     .persist()
        new_bands = (ev.select(id_col, F.posexplode(F.array(*keys))
                               .alias("band", "band_key"))
                     .select(id_col, F.col("band").cast("int").alias("band"),
                             "band_key")
                     .persist())
        try:
            # cheap FS probe gates batch 0 only; a vectors dir stranded
            # missing by a crash between the two appends reads as empty
            # on retry instead of wedging the stream (_read_store,
            # ADVICE r08 medium)
            if _store_dir_exists(spark, bands_dir):
                corpus_bands = _read_store(spark, bands_dir, new_bands,
                                           batch_id, retention_batches)
                cand = (new_bands.alias("i")
                        .join(corpus_bands.alias("c"), ["band", "band_key"])
                        .filter(F.col(f"i.{id_col}") != F.col(f"c.{id_col}"))
                        .select(F.col(f"i.{id_col}").alias("inc_id"),
                                F.col(f"c.{id_col}").alias("corpus_id"))
                        .distinct())
                v1 = (new_vecs.select(F.col(id_col).alias("inc_id"),
                                      F.col("v").alias("v1"),
                                      F.col("n").alias("n1"))
                      .hint("shuffle_hash"))
                v2 = (_read_store(spark, vectors_dir, new_vecs, batch_id,
                                  retention_batches)
                      .select(F.col(id_col).alias("corpus_id"),
                              F.col("v").alias("v2"), F.col("n").alias("n2"))
                      .hint("shuffle_hash"))
                score = F.round(sim._dot(F.col("v1"), F.col("v2"))
                                / (F.col("n1") * F.col("n2")), 6)
                # compute-once barrier (r16): pushed into the join
                # condition the 64-mult dot would evaluate twice per
                # candidate; released by the finally-block release_caches
                from airline_data_warehouse_spark.operators.dedup import (
                    _persist,
                )
                scored = _persist(
                    cand.join(v1, "inc_id").join(v2, "corpus_id")
                        .select("inc_id", "corpus_id",
                                score.alias("score")))
                flagged = scored.filter(F.col("score") >= threshold)
                (flagged.withColumn("batch_id", F.lit(batch_id))
                        .write.mode("append").parquet(pairs_dir))
            bid = int(batch_id)
            (new_bands.withColumn("batch_id", F.lit(batch_id))
                      .coalesce(4).write.mode("append")
                      .parquet(f"{bands_dir}/b{bid}"))
            (new_vecs.withColumn("batch_id", F.lit(batch_id))
                     .coalesce(4).write.mode("append")
                     .parquet(f"{vectors_dir}/b{bid}"))
            if compact_every and batch_id > 0 and batch_id % compact_every == 0:
                _tier_compact(spark, bands_dir, bid, retention_batches)
                _tier_compact(spark, vectors_dir, bid, retention_batches)
        finally:
            new_vecs.unpersist()
            new_bands.unpersist()
            release_caches()

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def start_cascade_ingest(stream: DataFrame, store_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         vec_col: str = "embedding",
                         checkpoint_dir: str | None = None,
                         threshold: float = 0.6,
                         cos_threshold: float = 0.99,
                         retention_batches: int | None = None,
                         compact_every: int | None = 16):
    """The full three-tier cascade, CONTINUOUSLY: every micro-batch of
    (id, text, embedding) rows is classified against the accumulated
    corpus state — exact (md5 hash store) → lexical near-dup (MinHash
    band + shingle stores) → semantic (hyperplane band + vector stores)
    — and per-doc verdicts land in ``{store_dir}/verdicts`` while the
    batch's own signatures append to the same five stores
    `cascade_store_build` writes, so a nightly batch build, a daily
    `incremental_cascade` run, and this stream can hand the SAME state
    to each other. Classification is `operators.dedup.cascade_classify`
    — the identical frame-level core the certified batch key runs, so
    stream-vs-batch parity is structural, not reimplemented.

    First batch (no store yet): every doc is ``kept`` — the corpus is
    empty; within-batch duplicates are NOT classified against each
    other (the text/semantic twins' contract: run the batch operators
    over the silver table for intra-batch pairs). The ``hashes`` store
    appends one (text_md5, keeper=min id) row per batch per hash;
    `cascade_classify` takes the min over matching rows, so replayed
    or cross-batch keepers resolve deterministically.

    Scale/state posture identical to `start_neardup_ingest` /
    `start_semantic_ingest` (shared retention/compaction knobs, tiered
    compaction — `_tier_compact`, r15 — corrupt-read-fails-the-batch,
    shuffle_hash on every corpus-proportional side, finite-guarded
    vectors)."""
    import os

    from pyspark.sql import functions as F

    from airline_data_warehouse_spark.operators import similarity as sim
    from airline_data_warehouse_spark.operators.dedup import (
        _i32,
        cascade_classify,
        minhash_band_table,
        release_caches,
        shingled,
    )

    dirs = {name: os.path.join(store_dir, name)
            for name in ("hashes", "bands", "shingles", "emb_bands",
                         "vectors", "verdicts")}

    emb_keys = sim.hyperplane_band_keys_sql("v", bands=4, rows_per_band=8)

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select(id_col, text_col).persist()
        emb = batch_df.select(F.col(id_col).alias("vec_id"),
                              F.col(vec_col)).persist()
        sh = shingled(docs.filter(F.col(text_col).isNotNull()),
                      text_col, id_col).persist()
        ev = (batch_df.filter(sim._finite_ok(F.col(vec_col)))
              .select(F.col(id_col).alias("vec_id"),
                      F.transform(F.col(vec_col), lambda x: x.cast("double"))
                       .alias("v"))
              .persist())
        # the batch's own signature frames — appended to the five stores
        # below, and (as .limit(0)) the schema templates _read_store
        # substitutes for a sibling dir stranded missing by a crash
        # between the sequential appends (ADVICE r08 medium)
        new_hashes = (docs.filter(F.col(text_col).isNotNull())
                      .select(F.md5(text_col).alias("text_md5"),
                              F.col(id_col))
                      .groupBy("text_md5").agg(F.min(id_col).alias("keeper")))
        new_bands = minhash_band_table(sh, id_col)
        new_shingles = sh.select(id_col, _i32("hs").alias("hs"))
        new_emb_bands = (ev.select("vec_id",
                                   F.posexplode(F.array(*emb_keys))
                                    .alias("band", "band_key"))
                         .select("vec_id",
                                 F.col("band").cast("int").alias("band"),
                                 "band_key"))
        new_vectors = ev.select("vec_id", "v", sim._norm(F.col("v")).alias("n"))
        empty_like = {"hashes": new_hashes, "bands": new_bands,
                      "shingles": new_shingles, "emb_bands": new_emb_bands,
                      "vectors": new_vectors}
        try:
            # gate on the FIRST-appended store only to detect a truly
            # fresh stream; each of the five reads probes its own dir
            # (crash-stranded siblings → empty, never a wedged retry)
            if _store_dir_exists(spark, dirs["hashes"]):
                verdicts = cascade_classify(
                    docs, emb,
                    *(_read_store(spark, dirs[n], empty_like[n], batch_id,
                                  retention_batches)
                      for n in ("hashes", "bands", "shingles", "emb_bands",
                                "vectors")),
                    threshold=threshold, cos_threshold=cos_threshold,
                    text_col=text_col, id_col=id_col, vec_col=vec_col)
            else:
                verdicts = docs.select(
                    id_col, F.lit("kept").alias("verdict"),
                    F.lit(None).cast("long").alias("partner_id"))
            # all six writes run CONCURRENTLY (VERDICT r09 item 5): each
            # is a tiny job whose cost is scheduling, not data — run
            # sequentially they were ~60% of the measured ~5 s/batch
            # floor; submitted together the wall-clock is max(job), not
            # sum. Ordering is correctness-free by construction: the
            # verdicts plan reads stores through _read_store's
            # batch_id < current filter (its file index was also listed
            # before any append lands), and signature appends commute
            # with each other. Crash semantics are unchanged — ANY
            # subset of the six may land before a crash, exactly as any
            # prefix could before; retries re-append (duplicates removed
            # at compaction / deduped on read) and re-classify
            # identically. The first failure fails the micro-batch.
            bid = F.lit(batch_id)
            bsub = f"b{int(batch_id)}"
            writes = [
                (verdicts.withColumn("batch_id", bid), dirs["verdicts"]),
                (new_hashes.withColumn("batch_id", bid),
                 f"{dirs['hashes']}/{bsub}"),
                (new_bands.withColumn("batch_id", bid),
                 f"{dirs['bands']}/{bsub}"),
                (new_shingles.withColumn("batch_id", bid),
                 f"{dirs['shingles']}/{bsub}"),
                (new_emb_bands.withColumn("batch_id", bid),
                 f"{dirs['emb_bands']}/{bsub}"),
                (new_vectors.withColumn("batch_id", bid),
                 f"{dirs['vectors']}/{bsub}"),
            ]
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=len(writes)) as pool:
                futs = [pool.submit(
                    lambda frame, path: frame.coalesce(4).write
                    .mode("append").parquet(path), f, p)
                    for f, p in writes]
                for fut in futs:
                    fut.result()   # propagate the first failure
            if compact_every and batch_id > 0 and batch_id % compact_every == 0:
                for name in ("hashes", "bands", "shingles", "emb_bands",
                             "vectors"):
                    _tier_compact(spark, dirs[name], int(batch_id),
                                  retention_batches)
        finally:
            docs.unpersist()
            emb.unpersist()
            sh.unpersist()
            ev.unpersist()
            release_caches()

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def start_exact_substring_ingest(stream: DataFrame, store_dir: str,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 checkpoint_dir: str | None = None,
                                 k: int = 8, min_tokens: int = 25,
                                 max_df: int = 16, max_occ: int = 256,
                                 retention_batches: int | None = None,
                                 compact_every: int | None = 16):
    """Continuous cross-document exact-substring detection — the
    STREAMING tier of the ExactSubstr family (batch =
    operators.dedup.exact_substring_spans, micro-batch =
    exact_substring_spans_incremental; this completes the
    batch/incremental/streaming cascade the MinHash family has).
    Every micro-batch's k-token window hashes join the ACCUMULATED
    window index; merged cross-document spans land in
    ``{store_dir}/spans``, the batch's windows and its per-hash
    distinct-doc counts append to ``{store_dir}/windows`` /
    ``{store_dir}/hashstats``.

    Three deliberate contracts, each mirrored from a sibling:

    * UNVERIFIED spans (unlike the batch tier): the window index
      stores hashes, never text, so the byte-equal verify-join is the
      downstream batch job's role (run exact_substring_spans over the
      flagged pairs' silver rows). The run merge itself is the
      amplifier — a ≥ min_tokens span is min_tokens − k + 1
      CONSECUTIVE 60-bit collisions, so a false span's odds are
      (2^-60)^(run), far below the single-hash tail.
    * EMIT-TIME boilerplate filter: the df count a window is judged by
      is the accumulated count as of this batch (hashstats is a
      LINEAR state — per-batch distinct-doc counts sum to the global
      count while doc ids are unique across batches, the CMS-cell
      convention). A window that becomes boilerplate later stops
      MATCHING from then on; spans it emitted earlier stand. The batch
      tier judges by final corpus df — the two agree exactly whenever
      no window's df crosses max_df mid-stream (the certificate
      fixture's case, and the common one: boilerplate is boilerplate
      early). A crossing by a hash that could already have matched
      (prior df >= 2) now raises a runtime ``warnings.warn`` naming
      the batch, so the divergence from a final-corpus batch run is
      observable instead of a silent prose assumption (ADVICE r14).
    * cross-BATCH pairs only, strictly-earlier matching: the corpus
      side is filtered to batch_id < current, so an at-least-once
      replay recomputes exactly the original batch's pairs (no
      self-batch matches through the replay's own appended windows);
      same-batch pairs are the batch operator's job over the silver
      table (the start_neardup_ingest contract).

    State story: the window index is O(corpus tokens) — ~24 bytes per
    token, the same order as the suffix array the reference method
    builds, and the honest price of exact spans (signatures cannot
    answer substring questions). ``retention_batches`` bounds it to a
    horizon (the dedup_stream_exact watermark trade);
    ``compact_every`` bounds file count and drops retry duplicates
    (reads dedup via DISTINCT meanwhile) via TIERED compaction
    (`_tier_compact`, VERDICT r14 item 2): each compaction
    consolidates only the b{N} appends since the last one into a new
    c{lo}_{hi} tier — bytes rewritten per compaction ∝ the active
    tier, never the accumulated store (the old whole-dir rewrite was
    O(N²/compact_every) cumulative write volume on an
    unbounded-retention stream)."""
    import os

    from airline_data_warehouse_spark.operators.dedup import (
        _merged_spans,
        _token_window_hashes,
        release_caches,
    )

    windows_dir = os.path.join(store_dir, "windows")
    stats_dir = os.path.join(store_dir, "hashstats")
    spans_dir = os.path.join(store_dir, "spans")

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bw = _token_window_hashes(batch_df, text_col, id_col,
                                  k).persist()
        bstats = (bw.groupBy("wh")
                  .agg(F.count_distinct(F.col(id_col)).alias("n_docs"),
                       F.count(F.lit(1)).alias("n_occ"))
                  .persist())
        try:
            # no up-front recovery pass: the tiered protocol
            # (_tier_compact) never renames an existing dir away, so
            # there is no crash window in which the only copy of prior
            # state sits in a hidden backup — the failure mode the old
            # whole-dir swap needed _recover_store_dir for (review
            # r14). Crashed staging writes are dot-hidden from readers
            # and swept at the next compaction.
            prior = (_read_store(spark, stats_dir, bstats, batch_id,
                                 retention_batches)
                     .distinct().drop("batch_id")
                     .groupBy("wh").agg(F.sum("n_docs").alias("_pd"),
                                        F.sum("n_occ").alias("_po")))
            total = (bstats.select("wh",
                                   F.col("n_docs").alias("_nd"),
                                   F.col("n_occ").alias("_no"))
                     .join(prior, "wh", "full")
                     .select("wh", "_nd", "_pd",
                             (F.coalesce("_nd", F.lit(0))
                              + F.coalesce("_pd", F.lit(0))).alias("_df"),
                             (F.coalesce("_no", F.lit(0))
                              + F.coalesce("_po", F.lit(0)))
                             .alias("_occ"))
                     .persist())
            # one scalar pass serves BOTH stream-health checks
            # (ADVICE r14, both lows on this function):
            # * worst: the batch tier's max_occ contract, streamed —
            #   but scoped to hashes THIS batch touches (_nd non-null);
            #   an accumulated high-occ hash the batch never joins
            #   cannot blow up the batch's pair join, and under a
            #   retention horizon a boilerplate hash re-entering the
            #   good set used to wedge every subsequent batch with
            #   remediation advice no upstream filter could satisfy.
            # * crossed: hashes whose ACCUMULATED df crossed max_df at
            #   this batch after previously sitting at >= 2 docs (i.e.
            #   they could already have matched) — exactly the case
            #   where the emit-time filter diverges from a final-corpus
            #   batch oracle (spans emitted before the crossing stand;
            #   the batch tier would have excluded them). Loud warning,
            #   not an error: the contract documents the divergence,
            #   the signal makes it observable instead of silent.
            head = total.agg(
                F.max(F.when((F.col("_df") <= max_df)
                             & F.col("_nd").isNotNull(), F.col("_occ")))
                 .alias("worst"),
                F.count(F.when((F.col("_df") > max_df)
                               & (F.col("_pd") >= 2)
                               & (F.col("_pd") <= max_df), F.lit(1)))
                 .alias("crossed")).collect()[0]
            if head["crossed"]:
                import warnings
                warnings.warn(
                    f"start_exact_substring_ingest: {head['crossed']} "
                    f"window hash(es) crossed max_df={max_df} at batch "
                    f"{int(batch_id)} after previously matching — "
                    "spans they emitted in earlier batches stand, but "
                    "a final-corpus batch run (the oracle shape) would "
                    "exclude them; reconcile via the downstream batch "
                    "verify job if exact batch parity matters",
                    stacklevel=2)
            if head["worst"] is not None and head["worst"] > max_occ:
                raise ValueError(
                    f"start_exact_substring_ingest: a window hash in "
                    f"batch {int(batch_id)} has {head['worst']} "
                    f"accumulated occurrences (> max_occ={max_occ}) — "
                    "the pair join fans out quadratically in a hash's "
                    "occurrence count. Intra-document repetition: run "
                    "the repetition filter upstream; legitimate "
                    "accumulation across <= max_df documents: raise "
                    "max_occ deliberately")
            good = total.filter(F.col("_df") <= max_df)
            cw = (_read_store(spark, windows_dir, bw, batch_id,
                              retention_batches)
                  .distinct().drop("batch_id"))
            a = (cw.join(good.select("wh"), "wh", "left_semi")
                 .select("wh", F.col(id_col).alias("corpus_id"),
                         F.col("pos").alias("pa")))
            b = (bw.join(good.select("wh"), "wh", "left_semi")
                 .select("wh", F.col(id_col).alias("inc_id"),
                         F.col("pos").alias("pb")))
            spans = _merged_spans(
                a.join(b, "wh")
                .filter(F.col("corpus_id") != F.col("inc_id")),
                k, min_tokens, "corpus_id", "inc_id",
                "start_corpus", "start_inc")
            # per-batch appends land in b{N} subdirs of the tiered
            # layout (append mode: a replayed batch re-appends into
            # its own b-dir; reads DISTINCT, compaction dropDuplicates)
            bid = int(batch_id)
            (spans.withColumn("batch_id", F.lit(batch_id))
             .coalesce(4).write.mode("append")
             .parquet(f"{spans_dir}/b{bid}"))
            (bw.withColumn("batch_id", F.lit(batch_id))
             .coalesce(4).write.mode("append")
             .parquet(f"{windows_dir}/b{bid}"))
            (bstats.withColumn("batch_id", F.lit(batch_id))
             .coalesce(1).write.mode("append")
             .parquet(f"{stats_dir}/b{bid}"))
            if compact_every and batch_id > 0 \
                    and batch_id % compact_every == 0:
                _tier_compact(spark, windows_dir, bid, retention_batches)
                _tier_compact(spark, stats_dir, bid, retention_batches)
                _tier_compact(spark, spans_dir, bid, retain=False)
        finally:
            try:
                total.unpersist()
            except NameError:
                pass
            bstats.unpersist()
            bw.unpersist()
            release_caches()

    writer = stream.writeStream.foreachBatch(ingest_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_exact_substring_spans(spark, store_dir: str) -> DataFrame:
    """The accumulated streaming span findings, ORDER-NORMALIZED:
    which side was 'corpus' vs 'increment' depends on arrival order,
    so rows re-orient to (doc_a = lesser id, doc_b = greater, starts
    mapped to match) — the batch operator's canonical orientation,
    which is what makes the unordered pair set arrival-order-invariant
    (every cross-batch pair is found exactly once, by whichever side
    arrived later). DISTINCT drops at-least-once replay duplicates
    between compactions."""
    import os

    spans_dir = os.path.join(store_dir, "spans")
    # explicit schema: a store can legitimately hold zero spans, and
    # schema inference dies on file-less tier dirs; recursive lookup
    # reads the tiered layout (b{N}/ + c{lo}_{hi}/, plus any flat
    # files — Spark's path filter hides in-flight .staging writes)
    raw = (spark.read
           .schema("corpus_id long, inc_id long, start_corpus long, "
                   "start_inc long, span_tokens long, batch_id long")
           .option("recursiveFileLookup", "true").parquet(spans_dir)
           .select("corpus_id", "inc_id", "start_corpus", "start_inc",
                   "span_tokens")
           .distinct())
    flip = F.col("corpus_id") > F.col("inc_id")
    return raw.select(
        F.when(flip, F.col("inc_id")).otherwise(F.col("corpus_id"))
         .alias("doc_a"),
        F.when(flip, F.col("corpus_id")).otherwise(F.col("inc_id"))
         .alias("doc_b"),
        F.when(flip, F.col("start_inc")).otherwise(F.col("start_corpus"))
         .alias("start_a"),
        F.when(flip, F.col("start_corpus")).otherwise(F.col("start_inc"))
         .alias("start_b"),
        "span_tokens")


def verify_spans_against_silver(spans: DataFrame, docs: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """The downstream batch VERIFY job the streaming tier's contract
    names (start_exact_substring_ingest: "the byte-equal verify-join
    is the downstream batch job's role" — the window index stores
    hashes, never text, so streamed spans are unverified by design):
    re-extract each span's text from BOTH documents in the silver
    corpus and keep only byte-equal spans — the batch tier's exact
    verify (operators.dedup._merged_verified_spans' filter), applied
    to already-merged runs. A window-hash collision can at worst have
    DROPPED a span upstream, never invented one that survives this;
    composing stream spans with this verify therefore reproduces the
    batch operator's answer exactly on cross-batch pairs (certified:
    the stream_exact_substring_verified registry key's oracle IS the
    batch chain with its verify kept).

    Scale shape: the silver corpus is SEMI-JOINED down to the
    documents that actually hold a candidate span before any
    tokenization (review r15 finding 4 — the join alone prunes output
    rows, not the corpus-wide split work), then tokenized ONCE and
    aliased for both sides — per-run cost is span-proportional, never
    docs × docs and never a full-corpus tokenize."""
    from airline_data_warehouse_spark.operators.dedup import (
        _token_arrays,
    )

    touched = (spans.select(F.col("doc_a").alias(id_col))
               .unionByName(spans.select(F.col("doc_b").alias(id_col)))
               .distinct())
    affected = docs.join(touched, id_col, "left_semi")
    arr = _token_arrays(affected, text_col, id_col, id_col, "_w")
    arr_a = arr.select(F.col(id_col).alias("doc_a"),
                       F.col("_w").alias("_wa"))
    arr_b = arr.select(F.col(id_col).alias("doc_b"),
                       F.col("_w").alias("_wb"))
    return (spans.join(arr_a, "doc_a").join(arr_b, "doc_b")
            .filter(F.expr(
                "array_join(slice(_wa, int(start_a), "
                "int(span_tokens)), ' ') = "
                "array_join(slice(_wb, int(start_b), "
                "int(span_tokens)), ' ')"))
            .select("doc_a", "doc_b", "start_a", "start_b",
                    "span_tokens"))
