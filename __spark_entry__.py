"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-revenue query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``airline_data_warehouse_spark.plans`` (one entry per SURVEY.md §2 row).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from airline_data_warehouse_spark.plans.registry import all_queries
    return all_queries()["flagship_star_revenue"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from airline_data_warehouse_spark.plans.registry import all_queries
    return {name: qd.builder for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    from airline_data_warehouse_spark.plans.registry import all_queries
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}
