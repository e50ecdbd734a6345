"""Training-data-pipeline operators (BASELINE.json north star): dedup,
similarity search, text analysis over the `documents` / `embeddings`
tables. These are first-class components alongside SURVEY §2 — each is a
distributed DataFrame plan with no driver-side collection, sized for the
100 TB posture (hash-partitioned group-bys, broadcast candidate maps,
banded LSH instead of all-pairs where quadratic blowup threatens).

Implementations live in operators/{dedup,similarity,text}.py; this module
registers their query/oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airline_data_warehouse_spark.operators import dedup as dd
from airline_data_warehouse_spark.operators import text as tx
from airline_data_warehouse_spark.plans.registry import load, register


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_hash
    FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    """,
    operators="DEDUP-exact,A3",
    description="Exact dedup via hash-groupBy: keep the lowest doc_id per "
                "distinct text (content-hash grouping scales to 100 TB — the "
                "shuffle key is the 128-bit digest, never the text).",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(load(spark, sf_dir, "documents"), text_col="text", id_col="doc_id")


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(length(regexp_split_to_array(trim(text), '[ \t\n]+')) AS INT) AS n_tokens,
           CAST(length(regexp_split_to_array(trim(text), '[ \t\n]+')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS token_density
    FROM documents WHERE length(trim(text)) > 0
    """,
    operators="TEXT-tokens",
    description="Whitespace token counting + density (text-analysis suite).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_stats(load(spark, sf_dir, "documents"), text_col="text", id_col="doc_id")


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
           CASE WHEN n_tokens >= 20 AND n_stop > 0 THEN 'keep' ELSE 'filter' END AS verdict
    FROM (SELECT doc_id,
                 CAST(length(text) AS INT) AS n_chars,
                 CAST(length(regexp_split_to_array(trim(text), '[ \t\n]+')) AS INT) AS n_tokens,
                 CAST(length(list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n]+'),
                      t -> t IN ('the','a','of','and','to'))) AS INT) AS n_stop,
                 CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT) AS n_alpha
          FROM documents WHERE length(trim(text)) > 0)
    """,
    operators="TEXT-quality",
    description="Quality scoring: stopword ratio, alpha ratio, length gate "
                "(training-data filter heuristics).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_score(load(spark, sf_dir, "documents"), text_col="text", id_col="doc_id")
