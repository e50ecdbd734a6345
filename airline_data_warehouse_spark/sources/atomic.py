"""Crash-safe plain-parquet table mutation: partition-scoped
stage-then-swap, shared by the streaming eligibility merge
(streaming/status.py) and the generalized batch upsert below.

Protocol (per partition directory): the replacement is fully written to
a SIBLING staging directory while the destination is still only being
read, then swapped in with two renames — dest → hidden
``.name.replaced`` backup, staging → dest. Renames are atomic on HDFS
and local filesystems and dot-prefixed directories are invisible to
Spark's parquet reader, so at every instant each partition is either
completely-old or completely-new. `recover_partitions` rolls back any
partition a crash stranded between the two renames; mutation bodies are
idempotent, so a checkpointed/driver retry after recovery converges.
Object stores without atomic rename (S3) should use a transactional
format (Delta/Iceberg MERGE) instead — these helpers are the
plain-parquet path for real filesystems, and a Delta MERGE drops in
where they are called.

Reference parity: the reference upserts through PostgREST with
per-table conflict columns (smartFileProcessor.js:167-174,
getConflictColumn :202-211) — Postgres gives it atomicity for free;
this module is what the same guarantee costs on raw parquet.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    return hpath, hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())


def recover_partitions(spark: SparkSession, dest_root: str,
                       partition_col: str) -> None:
    """Roll back any partition stranded mid-swap by a crash.

    A crash in the window between `swap_partitions`' two renames leaves
    the partition's ONLY copy in the hidden backup — invisible to
    Spark's reader, so a retry that reads the table before recovery
    would treat those rows as gone. Run this before any read that
    precedes a swap: a backup whose destination is missing is renamed
    back (rollback to the old, complete partition); a backup whose
    destination exists is a leftover from a crash after the second
    rename and is safely deleted (dest already holds the new data).
    Rollback is CONSERVATIVE for deletions too: a partition the crashed
    run had emptied comes back whole, and the idempotent retry
    re-empties it.
    """
    hpath, fs = _fs(spark, dest_root)
    root = hpath(dest_root)
    if not fs.exists(root):
        return
    prefix = "." + partition_col + "="
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)
                and name.endswith(".replaced")):
            continue
        dest = hpath(dest_root, name[1:-len(".replaced")])
        if fs.exists(dest):
            fs.delete(status.getPath(), True)  # new data already in place
        elif not fs.rename(status.getPath(), dest):
            raise IOError(f"partition recovery: rename {name} -> {dest} failed")


def swap_partitions(spark: SparkSession, staging: str, dest_root: str,
                    partition_col: str,
                    drop_partitions: list[str] | None = None) -> None:
    """Swap every fully-written staging partition directory into the
    destination (two atomic renames each, see module docstring), then
    remove ``drop_partitions`` (directory names like ``col=value``) that
    the mutation emptied — same backup-then-delete protocol, so a crash
    mid-removal is rolled back conservatively by `recover_partitions`.
    A crash between partitions leaves a mixed but internally-consistent
    table which the idempotent retry converges.
    """
    recover_partitions(spark, dest_root, partition_col)
    hpath, fs = _fs(spark, dest_root)
    prefix = partition_col + "="
    seen = set()
    for status in fs.listStatus(hpath(staging)):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue  # _SUCCESS and friends
        seen.add(name)
        dest = hpath(dest_root, name)
        backup = hpath(dest_root, f".{name}.replaced")
        if fs.exists(backup):
            fs.delete(backup, True)  # leftover from a crashed prior swap
        if fs.exists(dest) and not fs.rename(dest, backup):
            raise IOError(f"partition swap: rename {dest} -> {backup} failed")
        if not fs.rename(status.getPath(), dest):
            raise IOError(f"partition swap: rename into {dest} failed")
        fs.delete(backup, True)
    for name in drop_partitions or []:
        if name in seen or not name.startswith(prefix):
            continue
        dest = hpath(dest_root, name)
        backup = hpath(dest_root, f".{name}.replaced")
        if fs.exists(backup):
            fs.delete(backup, True)
        if fs.exists(dest):
            if not fs.rename(dest, backup):
                raise IOError(f"partition drop: rename {dest} -> {backup} failed")
            fs.delete(backup, True)
    fs.delete(hpath(staging), True)


def upsert_parquet(spark: SparkSession, source: DataFrame, dest_path: str,
                   key: str, partition_col: str,
                   sort_within: list[str] | None = None) -> None:
    """Crash-safe generalized keyed upsert into a partitioned parquet
    table: MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT with
    source-wins, the durable twin of `sinks.upsert` (which returns the
    merged DataFrame and leaves persistence to the caller).

    Partition-scoped: only partitions that hold a matched key or
    receive a source row are re-derived — (target rows there whose key
    is NOT in the source) ∪ (all source rows) — staged to a sibling
    directory, and swapped in per partition. A key whose partition
    value CHANGES is handled: its old partition is affected (holds the
    matched key, so it is rewritten without the row — or dropped
    outright if that empties it) and its new partition receives it. A
    100 TB fact takes a few directory rewrites per delta, not a table
    rewrite, and the table stays readable and whole at every instant.
    Crash at any point → `recover_partitions` (run here before reading)
    rolls the table back to a consistent state and the idempotent retry
    converges.
    """
    merge_parquet(spark, source, dest_path, key, partition_col,
                  delete_condition=None, sort_within=sort_within)


def merge_parquet(spark: SparkSession, source: DataFrame, dest_path: str,
                  key: str, partition_col: str,
                  delete_condition=None,
                  sort_within: list[str] | None = None) -> None:
    """Full MERGE with delete support — upsert_parquet's machinery plus
    WHEN MATCHED AND <delete_condition> THEN DELETE. Per-source-row
    clause semantics (like SQL MERGE): a source row where the condition
    holds removes the target row with its key and inserts nothing; every
    other source row upserts source-wins. The targeted-delete path is
    the right-to-be-forgotten / tombstone operation a long-lived corpus
    needs: partition-scoped directory rewrites (a partition emptied by
    deletes is dropped atomically in the swap), never a table rewrite,
    with the same recover-then-idempotent-retry crash contract.

    ``delete_condition``: Column or SQL string evaluated against SOURCE
    rows; None degrades to plain upsert.
    """
    def _sorted(df: DataFrame) -> DataFrame:
        return df.sortWithinPartitions(*sort_within) if sort_within else df

    if isinstance(delete_condition, str):
        delete_condition = F.expr(delete_condition)

    hpath, fs = _fs(spark, dest_path)
    recover_partitions(spark, dest_path, partition_col)
    if delete_condition is not None:
        inserts = source.filter(~F.coalesce(delete_condition, F.lit(False)))
    else:
        inserts = source
    if not fs.exists(hpath(dest_path)):
        # bootstrap guard: a delete-only source against a missing table
        # has nothing to insert — writing it anyway would create a
        # directory holding only _SUCCESS, and every later read of the
        # "table" would fail schema inference (a permanently poisoned
        # path). Nothing to do is a no-op, not an empty write.
        if inserts.limit(1).count() == 0:
            return
        _sorted(inserts).write.partitionBy(partition_col).parquet(dest_path)
        return
    target = spark.read.parquet(dest_path)
    source = source.select(*target.columns)
    inserts = inserts.select(*target.columns)
    # the delta-key joins are left to AQE: a typical delta's key set is
    # broadcast-sized and AQE picks that at runtime, but a large backfill
    # delta would make a FORCED key broadcast the OOM-at-scale hazard
    # (same class as the ngram_overlap_join holdout fix, r07). The
    # affected-partitions frame is bounded by the table's partition count
    # and stays hinted.
    keys = source.select(key).distinct()
    affected = (target.join(keys, key, "left_semi")
                      .select(partition_col)
                      .unionByName(inserts.select(partition_col))
                      .distinct())
    affected_vals = [r[0] for r in affected.collect()]
    if not affected_vals:
        return
    # the swap's drop list is built from str(value), so values whose
    # directory name Spark would ESCAPE (Hive-encoded %XX for '/', ':',
    # '=', '#', space …) or encode specially (NULL →
    # __HIVE_DEFAULT_PARTITION__) would produce names that match no
    # directory — the emptied partition would silently SURVIVE with its
    # old rows. Refuse such values loudly; the staging-side swap is
    # immune (its names come from listing real directories).
    _check_partition_values_droppable(partition_col, affected_vals)
    # rebuild the affected frame from the values just collected instead
    # of re-evaluating the two-join lineage a second time inside the
    # staging write (cheaper, and immune to a non-deterministic source
    # making the drop list diverge from what was staged)
    part_field = target.schema[partition_col]
    from airline_data_warehouse_spark.operators.frames import (
        jvm_local_frame,
    )
    aff_lit = jvm_local_frame(spark, [(v,) for v in affected_vals],
                              T.StructType([part_field]))
    surviving = (target
                 .join(F.broadcast(aff_lit), partition_col, "left_semi")
                 .join(keys, key, "left_anti"))
    merged = surviving.unionByName(inserts)
    staging = f"{dest_path.rstrip('/')}__upsert_staging"
    if fs.exists(hpath(staging)):
        fs.delete(hpath(staging), True)  # crashed prior attempt, pre-swap
    (_sorted(merged).write.mode("overwrite")
                    .partitionBy(partition_col).parquet(staging))
    drop = [f"{partition_col}={v}" for v in affected_vals]
    swap_partitions(spark, staging, dest_path, partition_col,
                    drop_partitions=drop)


# characters Spark writes VERBATIM into a partition directory name —
# everything else is Hive-%XX-escaped (ExternalCatalogUtils), and NULL
# becomes __HIVE_DEFAULT_PARTITION__, so str(value) would not name the
# real directory
_DROP_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789_-.+@")


def _check_partition_values_droppable(partition_col: str,
                                      vals: list) -> None:
    """Fail fast when a partition value's str() form cannot be trusted
    to equal its on-disk directory name (see merge_parquet). Integers
    and plain identifier-ish strings — every value this repo's tables
    partition by — pass; NULLs and escape-needing strings raise with
    the reason instead of leaving ghost partitions behind."""
    for v in vals:
        if v is None:
            raise ValueError(
                f"merge_parquet: NULL {partition_col} value — its "
                "directory is __HIVE_DEFAULT_PARTITION__, which the "
                "drop list cannot address; filter NULL partitions "
                "upstream")
        if isinstance(v, bool) or not isinstance(
                v, (int, str, datetime.date)):
            # datetime.date is safe: Spark's partition-type inference
            # yields date values for yyyy-MM-dd directories, and
            # str(date) is exactly that form (all _DROP_SAFE chars) —
            # rejecting it broke merge_parquet on date-partitioned
            # tables (ADVICE r13-low). datetime.datetime subclasses
            # date but its str() has spaces/colons Spark escapes, so
            # exclude it explicitly.
            raise ValueError(
                f"merge_parquet: {partition_col} value {v!r} of type "
                f"{type(v).__name__} — only int, plain-string, and "
                "date partition values round-trip to directory names; "
                "cast upstream")
        if isinstance(v, datetime.datetime):
            raise ValueError(
                f"merge_parquet: {partition_col} value {v!r} is a "
                "timestamp — its str() form contains characters Spark "
                "Hive-escapes in directory names; partition by a date "
                "or string key instead")
        if isinstance(v, str) and (not v or set(v) - _DROP_SAFE):
            raise ValueError(
                f"merge_parquet: {partition_col} value {v!r} contains "
                "characters Spark Hive-escapes in directory names — "
                "the emptied-partition drop would silently miss; use "
                "an escaped-safe partition key")


def compact_partitions(spark: SparkSession, dest_path: str,
                       partition_col: str, target_files: int = 1,
                       max_files_ok: int | None = None) -> list[str]:
    """Small-file compaction with the same crash-safe stage-then-swap:
    every partition directory holding more parquet files than
    ``max_files_ok`` (default: ``target_files``) is rewritten to
    ``target_files`` files and atomically swapped in. Readers see each
    partition either pre- or post-compaction at every instant; a crash
    mid-compaction rolls back via `recover_partitions` and the retry is
    idempotent (compaction changes layout, never rows).

    This is the maintenance job a 100 TB ingest needs: streaming
    appends and per-delta upserts accrete files per partition, and scan
    cost grows with file COUNT (task scheduling, footer reads, open
    costs) even when bytes are constant — the same pathology the
    streaming band store hit (SCALING.md: 2,540 files → 41 % latency
    growth; compaction flattened it). Returns the partition names it
    rewrote, so callers/tests can assert scope.
    """
    recover_partitions(spark, dest_path, partition_col)
    hpath, fs = _fs(spark, dest_path)
    root = hpath(dest_path)
    if not fs.exists(root):
        return []
    limit = target_files if max_files_ok is None else max_files_ok
    prefix = partition_col + "="
    crowded = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue
        n = sum(1 for f in fs.listStatus(status.getPath())
                if f.getPath().getName().endswith(".parquet"))
        if n > limit:
            crowded.append(name)
    if not crowded:
        return []
    staging = dest_path.rstrip("/") + ".compacting"
    if fs.exists(hpath(staging)):
        fs.delete(hpath(staging), True)
    # repartition BY THE PARTITION COLUMN (plus a salt when target_files
    # > 1): all rows of one partition value land in exactly target_files
    # tasks, so the partitioned write emits exactly that many files per
    # directory — coalesce would interleave partitions across tasks and
    # write tasks×partitions files, recreating the problem being fixed
    sub = (spark.read.option("basePath", dest_path)
           .parquet(*[f"{dest_path}/{name}" for name in crowded]))
    if target_files == 1:
        sub = sub.repartition(len(crowded), F.col(partition_col))
    else:
        salt = (F.abs(F.xxhash64(*[F.col(c) for c in sub.columns]))
                % target_files)
        sub = sub.repartition(len(crowded) * target_files,
                              F.col(partition_col), salt)
    sub.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    # swap_partitions deletes the staging directory as its last step
    swap_partitions(spark, staging, dest_path, partition_col)
    return sorted(crowded)


def recover_directory(spark: SparkSession, dest_path: str) -> None:
    """Heal a directory stranded by a crash between compact_directory's
    two renames — same hidden-backup convention as the streaming
    stores' _recover_store_dir, at whole-directory granularity: a
    backup whose destination is missing is the data's only copy (crash
    after rename 1) and is renamed back; a backup whose destination
    exists is a post-swap leftover (crash after rename 2) and is
    deleted."""
    import os

    hpath, fs = _fs(spark, dest_path)
    parent, name = os.path.split(dest_path.rstrip("/"))
    backup = hpath(parent, f".{name}.replaced")
    if not fs.exists(backup):
        return
    if fs.exists(hpath(dest_path)):
        fs.delete(backup, True)
    elif not fs.rename(backup, hpath(dest_path)):
        # Benign race (ADVICE r11-low): a LIVE compactor's second rename
        # (staging -> dest) can land between our existence check and
        # this rename — dest now exists and the backup is an ordinary
        # post-swap leftover, not a stranded sole copy. Only a rename
        # failure with dest STILL missing is real corruption.
        if fs.exists(hpath(dest_path)):
            fs.delete(backup, True)
        else:
            raise IOError(f"directory recovery: rename {backup} -> "
                          f"{dest_path} failed")


def compact_directory(spark: SparkSession, dest_path: str,
                      target_files: int = 1,
                      max_files_ok: int | None = None) -> bool:
    """Small-file compaction for an UNPARTITIONED parquet directory —
    the append-log twin of compact_partitions: when the directory holds
    more ``.parquet`` files than ``max_files_ok`` (default:
    ``target_files``), rewrite its rows to ``target_files`` files in a
    sibling staging dir and swap the whole directory in with two atomic
    renames (dest → hidden ``.name.replaced`` backup, staging → dest).
    Readers see the old or the new directory at every instant; a crash
    between the renames is healed by `recover_directory` (run here
    first, and by readers before reads). Layout-only: rows unchanged.

    Single-maintenance-process contract (the cascade-store compactor's):
    an APPEND racing the swap window can land in the backup and be
    deleted with it — call from the thread that owns the table's writes
    (a foreachBatch loop, a scheduled maintenance job), never
    concurrently with appenders. Returns True when a rewrite happened.
    """
    recover_directory(spark, dest_path)
    hpath, fs = _fs(spark, dest_path)
    root = hpath(dest_path)
    if not fs.exists(root):
        return False
    limit = target_files if max_files_ok is None else max_files_ok
    n = sum(1 for f in fs.listStatus(root)
            if f.getPath().getName().endswith(".parquet"))
    if n <= limit:
        return False
    staging = dest_path.rstrip("/") + ".compacting"
    if fs.exists(hpath(staging)):
        fs.delete(hpath(staging), True)  # crashed prior attempt, pre-swap
    (spark.read.parquet(dest_path).coalesce(target_files)
          .write.mode("overwrite").parquet(staging))
    import os

    parent, name = os.path.split(dest_path.rstrip("/"))
    backup = hpath(parent, f".{name}.replaced")
    if fs.exists(backup):
        fs.delete(backup, True)
    if not fs.rename(root, backup):
        raise IOError(f"directory compact: rename {dest_path} -> "
                      f"{backup} failed")
    if not fs.rename(hpath(staging), root):
        # The mirror of recover_directory's benign race: a concurrent
        # reader's recover saw dest missing mid-swap and renamed the
        # backup back. The table is then fully restored to its
        # pre-compaction contents — drop the staged copy and report no
        # rewrite instead of failing the owning foreachBatch mid-flight.
        # (The documented contract is still single-maintenance-process;
        # this just makes the reader-side heal convergent, ADVICE
        # r11-low.)
        if fs.exists(root) and not fs.exists(backup):
            fs.delete(hpath(staging), True)
            return False
        raise IOError(f"directory compact: rename {staging} -> "
                      f"{dest_path} failed")
    fs.delete(backup, True)
    return True


def replace_directory(spark: SparkSession, source: DataFrame,
                      dest_path: str, target_files: int = 1) -> bool:
    """Atomically replace an UNPARTITIONED parquet directory's CONTENT
    with ``source`` — compact_directory's protocol (stage to a sibling,
    two renames, recover_directory healing) generalized from
    layout-only rewrites to new content. The building block for small
    derived state a maintenance loop folds wholesale (a Count-Min base
    sketch, a watermark table): the directory is schema-bounded, so a
    full rewrite is cheap, and readers see the old or the new content
    at every instant — never a mix, never a torn window.

    ``source`` is fully materialized into the staging directory BEFORE
    the first rename, so it may (and typically does) read from
    ``dest_path`` itself. Same single-maintenance-process contract and
    reader-race convergence as compact_directory.

    Returns True when the new content is in place, False when the
    reader-heal race restored the OLD content instead (the benign
    no-op branch below). Callers whose follow-up work assumes the swap
    happened — a fold deleting the batch partitions it just absorbed —
    MUST check this: treating the no-op as success would destroy the
    only copy of the unfolded state."""
    recover_directory(spark, dest_path)
    hpath, fs = _fs(spark, dest_path)
    root = hpath(dest_path)
    staging = dest_path.rstrip("/") + ".replacing"
    if fs.exists(hpath(staging)):
        fs.delete(hpath(staging), True)  # crashed prior attempt, pre-swap
    (source.coalesce(target_files)
           .write.mode("overwrite").parquet(staging))
    import os

    parent, name = os.path.split(dest_path.rstrip("/"))
    backup = hpath(parent, f".{name}.replaced")
    if fs.exists(backup):
        fs.delete(backup, True)
    if fs.exists(root) and not fs.rename(root, backup):
        raise IOError(f"directory replace: rename {dest_path} -> "
                      f"{backup} failed")
    if not fs.rename(hpath(staging), root):
        if fs.exists(root) and not fs.exists(backup):
            # reader-heal race (the compact_directory convergence): the
            # old content is fully back — drop the staged copy; the
            # idempotent maintenance retry re-derives it
            fs.delete(hpath(staging), True)
            return False
        raise IOError(f"directory replace: rename {staging} -> "
                      f"{dest_path} failed")
    fs.delete(backup, True)
    return True
