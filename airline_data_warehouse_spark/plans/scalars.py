"""Scalar-function queries (SURVEY §2.8 F1-F17): the cleaning library
applied over testdata columns, each with an independently-written DuckDB
oracle reproducing the reference's JS semantics.

Dirty inputs are derived deterministically from testdata columns (the
driver's rule: don't synthesize your own tables) — e.g. passenger-key
strings built from c_custkey, currency strings from exact-decimal
renderings of l_extendedprice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airline_data_warehouse_spark.dimensions import build_dim_date
from airline_data_warehouse_spark.functions import cleaning as C
from airline_data_warehouse_spark.plans.registry import load, register


@register(
    "std_passenger_key",
    oracle="""
    SELECT c_custkey, raw_key,
           CASE WHEN raw_key LIKE '%P%'
                     AND length(regexp_replace(raw_key, '[^0-9]', '', 'g')) >= 3
                THEN 'P' || right(regexp_replace(raw_key, '[^0-9]', '', 'g'), 3)
           END AS passenger_key
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN CAST(c_custkey AS VARCHAR)
                      WHEN c_custkey % 10 = 1 THEN 'P' || CAST(c_custkey % 100 AS VARCHAR)
                      ELSE 'P' || lpad(CAST(c_custkey AS VARCHAR), 5, '0')
                 END AS raw_key
          FROM customer)
    """,
    operators="F1",
    description="standardizePassengerKey: P + last-3-digits, NULL on no-'P' "
                "or <3 digits (smartFileProcessor.js:294-300).",
)
def std_passenger_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    raw = (F.when(F.col("c_custkey") % 10 == 0, F.col("c_custkey").cast("string"))
            .when(F.col("c_custkey") % 10 == 1,
                  F.concat(F.lit("P"), (F.col("c_custkey") % 100).cast("string")))
            .otherwise(F.concat(F.lit("P"), F.lpad(F.col("c_custkey").cast("string"), 5, "0"))))
    return (customer.select("c_custkey", raw.alias("raw_key"))
                    .select("c_custkey", "raw_key",
                            C.standardize_passenger_key(F.col("raw_key")).alias("passenger_key")))


@register(
    "std_email",
    oracle="""
    SELECT c_custkey, full_name, raw_email,
           CASE WHEN raw_email IS NOT NULL
                     AND regexp_matches(raw_email, '^[^ @\t\n]+@[^ @\t\n]+\\.[^ @\t\n]+$')
                THEN lower(raw_email)
                WHEN length(trim(full_name)) > 0
                     AND length(string_split(trim(full_name), ' ')) > 1
                THEN lower(string_split(trim(full_name), ' ')[1]) || '.' ||
                     lower(string_split(trim(full_name), ' ')[-1]) || '@example.com'
                WHEN length(trim(full_name)) > 0
                THEN lower(trim(full_name)) || '@example.com'
                ELSE 'user@example.com'
           END AS email
    FROM (SELECT c_custkey, replace(c_name, '#', ' ') AS full_name,
                 CASE WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '') || '@Example.ORG'
                      WHEN c_custkey % 3 = 1 THEN 'not an email'
                 END AS raw_email
          FROM customer)
    """,
    operators="F2,F12",
    description="standardizeEmail: keep valid (lowercased) else synthesize "
                "first.last@example.com (smartFileProcessor.js:303-316).",
)
def std_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    full_name = F.replace(F.col("c_name"), F.lit("#"), F.lit(" "))
    raw_email = (F.when(F.col("c_custkey") % 3 == 0,
                        F.concat(F.replace(F.col("c_name"), F.lit("#"), F.lit("")),
                                 F.lit("@Example.ORG")))
                  .when(F.col("c_custkey") % 3 == 1, F.lit("not an email")))
    return (customer.select("c_custkey", full_name.alias("full_name"),
                            raw_email.alias("raw_email"))
                    .select("c_custkey", "full_name", "raw_email",
                            C.standardize_email(F.col("full_name"),
                                                F.col("raw_email")).alias("email")))


@register(
    "std_country",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE lower(trim(n_name))
                WHEN 'us' THEN 'United States'
                WHEN 'usa' THEN 'United States'
                WHEN 'united states' THEN 'United States'
                WHEN 'u.s.a.' THEN 'United States'
                WHEN 'u.s.' THEN 'United States'
                WHEN 'uk' THEN 'United Kingdom'
                WHEN 'united kingdom' THEN 'United Kingdom'
                WHEN 'great britain' THEN 'United Kingdom'
                WHEN 'england' THEN 'United Kingdom'
                WHEN 'uae' THEN 'United Arab Emirates'
                WHEN 'united arab emirates' THEN 'United Arab Emirates'
                WHEN 'u.a.e.' THEN 'United Arab Emirates'
                ELSE upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
           END AS country
    FROM nation
    """,
    operators="F3,F9",
    description="standardizeCountry: alias map + title-case fallback "
                "(smartFileProcessor.js:318-348).",
)
def std_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    return nation.select("n_nationkey", "n_name",
                         C.standardize_country(F.col("n_name")).alias("country"))


@register(
    "std_amount",
    oracle="""
    SELECT l_orderkey, l_linenumber, raw_amount,
           CAST(CAST(COALESCE(TRY_CAST(regexp_extract(
                    regexp_replace(raw_amount, '[^0-9.\\-]', '', 'g'),
                    '^[+-]?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)') AS DECIMAL(28,10)),
                 0) AS DECIMAL(10,2)) AS DOUBLE) AS amount
    FROM (SELECT l_orderkey, l_linenumber,
                 CASE WHEN l_linenumber % 3 = 0
                      THEN '$' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)
                      WHEN l_linenumber % 3 = 1
                      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || ' USD'
                      ELSE 'garbage'
                 END AS raw_amount
          FROM lineitem)
    """,
    operators="F4,F12",
    description="Amount standardizer: strip currency junk, parseFloat-prefix "
                "semantics, bad → 0.00 (smartFileProcessor.js:391-394). "
                "Internal math stays DECIMAL; the final column is cast to "
                "DOUBLE per the registry decimal→DOUBLE output convention.",
)
def std_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec_str = F.col("l_extendedprice").cast("decimal(18,2)").cast("string")
    raw = (F.when(F.col("l_linenumber") % 3 == 0, F.concat(F.lit("$"), dec_str))
            .when(F.col("l_linenumber") % 3 == 1, F.concat(dec_str, F.lit(" USD")))
            .otherwise(F.lit("garbage")))
    return (li.select("l_orderkey", "l_linenumber", raw.alias("raw_amount"))
              .select("l_orderkey", "l_linenumber", "raw_amount",
                      C.standardize_amount(F.col("raw_amount"))
                       .cast("double").alias("amount")))


@register(
    "std_date_multiformat",
    oracle="""
    SELECT o_orderkey, raw_date,
           CAST(parsed AS DATE) AS order_date,
           CAST(strftime(parsed, '%Y%m%d') AS INT) AS date_key
    FROM (SELECT o_orderkey, raw_date,
                 COALESCE(try_strptime(raw_date, '%Y-%m-%d'),
                          try_strptime(raw_date, '%m/%d/%Y'),
                          try_strptime(raw_date, '%d-%b-%y')) AS parsed
          FROM (SELECT o_orderkey,
                       CASE WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                            WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
                            WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%d-%b-%y')
                            ELSE 'not a date'
                       END AS raw_date
                FROM orders))
    """,
    operators="F5,F6",
    description="Multi-format date parse (ISO / US / dd-MMM-yy, unparseable → "
                "NULL) + yyyyMMdd date_key encode (smartFileProcessor.js:416-424, :383).",
)
def std_date_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    raw = (F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
            .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
            .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "dd-MMM-yy"))
            .otherwise(F.lit("not a date")))
    parsed = C.standardize_date(F.col("raw_date"))
    return (orders.select("o_orderkey", raw.alias("raw_date"))
                  .select("o_orderkey", "raw_date",
                          parsed.alias("order_date"),
                          C.date_key_of(parsed).alias("date_key")))


@register(
    "synth_transaction_id",
    oracle="""
    SELECT o_orderkey,
           (CASE WHEN o_orderkey % 2 = 0 THEN 'TA' ELSE 'CO' END) ||
           (CASE WHEN length(digits) >= 6 THEN digits ELSE lpad(digits, 6, '0') END)
             AS transaction_id
    FROM (SELECT o_orderkey,
                 regexp_replace(CAST(o_orderkey AS VARCHAR), '[^0-9]', '', 'g') AS digits
          FROM orders)
    """,
    operators="F7",
    description="Transaction-id synthesis: digits-only, padStart(6), source "
                "prefix (smartFileProcessor.js:385-389).",
)
def synth_transaction_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    ta = C.synth_transaction_id(F.col("o_orderkey"), "TA")
    co = C.synth_transaction_id(F.col("o_orderkey"), "CO")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, ta).otherwise(co).alias("transaction_id"))


@register(
    "std_loyalty_status",
    oracle="""
    SELECT c_custkey, raw_status,
           CASE WHEN upper(trim(raw_status)) LIKE '%PLATINUM%'
                     OR upper(trim(raw_status)) = 'PLAT' THEN 'Platinum'
                WHEN upper(trim(raw_status)) LIKE '%GOLD%' THEN 'Gold'
                WHEN upper(trim(raw_status)) LIKE '%SILVER%'
                     OR upper(trim(raw_status)) = 'SILV' THEN 'Silver'
                ELSE 'Bronze'
           END AS loyalty_status
    FROM (SELECT c_custkey,
                 CASE c_custkey % 5 WHEN 0 THEN 'PLAT'
                                    WHEN 1 THEN 'gold member'
                                    WHEN 2 THEN 'SILV'
                                    WHEN 3 THEN '  bronze '
                                    ELSE c_mktsegment
                 END AS raw_status
          FROM customer)
    """,
    operators="F8",
    description="Loyalty fuzzy mapping, default Bronze "
                "(scripts/uploadPassengers.js:39-51).",
)
def std_loyalty_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    raw = (F.when(F.col("c_custkey") % 5 == 0, F.lit("PLAT"))
            .when(F.col("c_custkey") % 5 == 1, F.lit("gold member"))
            .when(F.col("c_custkey") % 5 == 2, F.lit("SILV"))
            .when(F.col("c_custkey") % 5 == 3, F.lit("  bronze "))
            .otherwise(F.col("c_mktsegment")))
    return (customer.select("c_custkey", raw.alias("raw_status"))
                    .select("c_custkey", "raw_status",
                            C.standardize_loyalty_status(F.col("raw_status"))
                             .alias("loyalty_status")))


@register(
    "na_null_and_trim",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN trim(raw_alliance) = 'N/A' THEN NULL
                ELSE trim(raw_alliance) END AS alliance
    FROM (SELECT s_suppkey,
                 CASE s_suppkey % 3 WHEN 0 THEN 'N/A'
                                    WHEN 1 THEN '  ' || s_name || ' '
                                    ELSE '' END AS raw_alliance
          FROM supplier)
    """,
    operators="F9,F10",
    description="N/A→NULL + trim (alliance handling, smartFileProcessor.js:446-448).",
)
def na_null_and_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier")
    raw = (F.when(F.col("s_suppkey") % 3 == 0, F.lit("N/A"))
            .when(F.col("s_suppkey") % 3 == 1,
                  F.concat(F.lit("  "), F.col("s_name"), F.lit(" ")))
            .otherwise(F.lit("")))
    return (supplier.select("s_suppkey", raw.alias("raw_alliance"))
                    .select("s_suppkey", C.na_to_null(F.col("raw_alliance")).alias("alliance")))


@register(
    "carrier_prefix_extract",
    oracle="""
    SELECT p_brand, substr(p_brand, 1, 2) AS brand_prefix, COUNT(*) AS n_parts
    FROM part GROUP BY 1, 2
    """,
    operators="F11",
    description="LEFT(key, 2) prefix extraction (carrier-from-flight-key, "
                "denorm view:41).",
)
def carrier_prefix_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "part")
            .groupBy("p_brand", C.carrier_of_flight(F.col("p_brand")).alias("brand_prefix"))
            .agg(F.count("*").alias("n_parts")))


@register(
    "date_parts_extraction",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS day_of_month,
           CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS day_of_week,
           dayname(o_orderdate) AS day_name,
           monthname(o_orderdate) AS month_name
    FROM orders
    """,
    operators="F13",
    description="Date-part + name derivation (dim date:19-28; Sunday=1 DOW).",
)
def date_parts_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("day_of_month"),
        F.dayofweek("o_orderdate").alias("day_of_week"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
        F.date_format("o_orderdate", "MMMM").alias("month_name"))


@register(
    "generate_date_dimension",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           CAST(d AS DATE) AS full_date,
           CAST(EXTRACT(day FROM d) AS INT) AS day_of_month,
           dayname(d) AS day_name,
           CAST(EXTRACT(dow FROM d) + 1 AS INT) AS day_of_week,
           CAST(EXTRACT(month FROM d) AS INT) AS month,
           monthname(d) AS month_name,
           CAST(EXTRACT(quarter FROM d) AS INT) AS quarter,
           CAST(EXTRACT(year FROM d) AS INT) AS year
    FROM generate_series(DATE '2023-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)
    """,
    operators="F13,F14",
    description="dim_date generation via sequence+explode (dim date:15-33).",
)
def generate_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_dim_date(spark)


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
    operators="F15,T2",
    description="JSON decode of message payloads (kafkaConfig.js:51, "
                "dirty-row JSONB).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("int").alias("prop_k")))


@register(
    "delay_arithmetic",
    oracle="""
    SELECT event_id, delay_min,
           CAST(delay_min // 60 AS INT) AS delay_hours,
           CAST(delay_min % 60 AS INT) AS delay_rem_minutes
    FROM (SELECT event_id, CAST(round(value, 0) AS INT) AS delay_min FROM events)
    """,
    operators="F17",
    description="Delay h/m arithmetic (public/index.html:921).",
)
def delay_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    delay = F.round(F.col("value"), 0).cast("int")
    return (events.select("event_id", delay.alias("delay_min"))
                  .select("event_id", "delay_min",
                          F.floor(F.col("delay_min") / 60).cast("int").alias("delay_hours"),
                          (F.col("delay_min") % 60).cast("int").alias("delay_rem_minutes")))
