"""Generated dimensions: the date dimension (SURVEY F13/F14).

Reference: ``for supabase/dim date:15-33`` — generate_series over
2023-01-01..2024-12-31 with EXTRACTed parts; DOW is Postgres ``EXTRACT(DOW)+1``
i.e. Sunday=1, which is exactly Spark's ``dayofweek``. Postgres
``TO_CHAR(d,'Day')`` blank-pads names to 9 chars; we emit unpadded names
(documented divergence — padding is a formatting artifact, not semantics).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airline_data_warehouse_spark.functions.cleaning import date_key_of

DEFAULT_START = dt.date(2023, 1, 1)
DEFAULT_END = dt.date(2024, 12, 31)


def build_dim_date(spark: SparkSession, start: dt.date = DEFAULT_START,
                   end: dt.date = DEFAULT_END) -> DataFrame:
    """731-row (default span) date dimension, built with sequence+explode —
    no driver-side loop, so an arbitrary span stays distributed."""
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start.isoformat()}'), "
        f"to_date('{end.isoformat()}'), interval 1 day)) AS full_date"
    )
    return days.select(
        date_key_of(F.col("full_date")).alias("date_key"),
        F.col("full_date"),
        F.dayofmonth("full_date").alias("day_of_month"),
        F.date_format("full_date", "EEEE").alias("day_name"),
        F.dayofweek("full_date").alias("day_of_week"),
        F.month("full_date").alias("month"),
        F.date_format("full_date", "MMMM").alias("month_name"),
        F.quarter("full_date").alias("quarter"),
        F.year("full_date").alias("year"),
    )


# The reference trigger's literal known-country set (`for supabase/trigger
# hierarchy:6`). Quirk preserved: the list holds RAW spellings (USA, UK)
# while inserts carry standardized names (United States, ...), so in the
# reference every insert raises the NOTICE; we compare against both raw
# and standardized spellings to implement the evident intent.
KNOWN_COUNTRIES = ("USA", "UK", "UAE", "Canada", "Australia", "Japan",
                   "United States", "United Kingdom",
                   "United Arab Emirates")


def unknown_country_reviews(dim_airport: DataFrame,
                            known: tuple[str, ...] = KNOWN_COUNTRIES) -> DataFrame:
    """Trigger parity (`for supabase/trigger hierarchy:14-17`): every
    distinct dim_airport country outside the known set becomes a review
    row — the RAISE NOTICE 'New country added: %' becomes an appendable
    ``new_countries`` table instead of a log line."""
    return (dim_airport
            .select("country").distinct()
            .filter(~F.col("country").isin(*known))
            .select(F.col("country").alias("country_name"),
                    F.concat(F.lit("New country added: "), F.col("country"))
                     .alias("notice")))
