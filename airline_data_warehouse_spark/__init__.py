"""airline_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference repo ``ctrl-gee/airline-data-warehouse`` (a Postgres/Supabase
star-schema warehouse with a Node.js ETL + Kafka streaming layer),
re-expressed Spark-first:

* dimensional model + denormalized analytics view  → DataFrame star joins
* CSV → clean ETL with dirty-row quarantine        → single-pass Column
  predicates + filter split (no row-at-a-time loops)
* keyed upsert / dimension repair                  → anti-join + unionByName
* flight-status stream + insurance eligibility     → Structured Streaming
* plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) designed for 100 TB scale.

All operators are declarative DataFrame/SQL plans so Catalyst handles
pushdown, pruning, join selection and whole-stage codegen. No RDDs, no
row-at-a-time Python UDFs in any hot path.
"""

from airline_data_warehouse_spark.session import get_spark

__all__ = ["get_spark"]
