"""Deduplication operators for large-scale text corpora.

Exact dedup here; MinHash/SimHash/n-gram-Jaccard/embedding near-dup in
this module too (added incrementally). Design rules for 100 TB:

* group/shuffle on fixed-width digests (md5 → 2×64-bit halves), never on
  raw document text;
* candidate generation is always index-based (banding / shared-shingle
  inverted index), never an all-pairs cross join;
* everything is a declarative plan — AQE handles skewed bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct text value.

    Shuffles on md5(text) (fixed 32-byte key), computes min(id) per group
    map-side-partially, then a semi-join back — two narrow shuffles, no
    window over the full corpus. Returns (id_col, text_hash).
    """
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    keepers = hashed.groupBy("text_hash").agg(F.min(id_col).alias(id_col))
    return keepers.select(id_col, "text_hash")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All rows that belong to a duplicate group, tagged with the group's
    representative (lowest id) — the audit-report companion to exact_dedup."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return (hashed
            .withColumn("group_size", F.count("*").over(w))
            .withColumn("representative", F.min(id_col).over(w))
            .filter(F.col("group_size") > 1))
