"""Relational operator queries (SURVEY §2.1-2.7) over the testdata star.

The reference's warehouse shapes transfer onto the TPC-H-ish testdata:
orders/lineitem play fact_sales, customer/nation/region/supplier/part play
the dimensions, events plays flight_status_updates. Every query is a
declarative DataFrame plan — filters push into the parquet scans and
aggregation stays partial (map-side).

Broadcast contract (r08, shared with plans/olap.py — see its module
docstring for the full rationale): explicit F.broadcast() hints are
reserved for schema-bounded sides (nation 25 rows, region 5, 1-row
scalars, fixed lookup maps, per-column profiling stats bounded by the
schema width). customer / supplier / part grow with the business and
carry NO pinned hint — AQE converts to a runtime broadcast when the
actual size permits and degrades to a shuffle join when it doesn't,
which a pinned hint cannot do at a 100M-row dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from airline_data_warehouse_spark.plans.registry import load, register

D182 = DecimalType(18, 2)


def dec2(c) -> F.Column:
    return F.col(c).cast(D182) if isinstance(c, str) else c.cast(D182)


# ---------------------------------------------------------------------------
# Star joins (J1-J6) + aggregation over dim attributes (A5)
# ---------------------------------------------------------------------------

@register(
    "flagship_star_revenue",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           r_name AS region_name,
           o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3
    """,
    operators="J1-J5,A5,E3",
    description="Denormalized star view aggregated by dim attributes — the "
                "v_airline_analytics analog (for supabase/denorm view:2-41).",
)
def flagship_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    customer, nation, region = (load(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(customer, orders.o_custkey == customer.c_custkey)
          .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .groupBy(
              F.year("o_orderdate").alias("order_year"),
              F.col("r_name").alias("region_name"),
              "o_orderpriority")
          .agg(
              F.sum(dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount")))
               .cast("double").alias("revenue"),
              F.count("*").alias("n_items"),
              F.countDistinct("l_orderkey").alias("n_orders"))
    )


@register(
    "role_playing_dim_join",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    """,
    operators="J4,J5",
    description="Role-playing dimension joined twice under different aliases "
                "(dim_airport as origin/dest, denorm view:39-40).",
)
def role_playing_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    customer, supplier = load(spark, sf_dir, "customer"), load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cn, sn = nation.alias("cn"), nation.alias("sn")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(customer, orders.o_custkey == customer.c_custkey)
          .join(supplier, li.l_suppkey == supplier.s_suppkey)
          .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
          .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
          .groupBy(F.col("cn.n_name").alias("cust_nation"),
                   F.col("sn.n_name").alias("supp_nation"))
          .agg(F.count("*").alias("n_items"),
               F.sum(dec2("l_extendedprice")).cast("double").alias("gross"))
    )


@register(
    "expression_left_join",
    oracle="""
    SELECT n_name AS derived_nation, COUNT(*) AS n_customers
    FROM customer LEFT JOIN nation ON c_custkey % 30 = n_nationkey
    GROUP BY 1
    """,
    operators="J6,F11",
    description="LEFT OUTER equi-join on a computed key — the "
                "LEFT(flight_key,2)=airline_key carrier join (denorm view:41).",
)
def expression_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation = load(spark, sf_dir, "customer"), load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation),
                      customer.c_custkey % 30 == nation.n_nationkey, "left")
                .groupBy(F.col("n_name").alias("derived_nation"))
                .agg(F.count("*").alias("n_customers"))
    )


@register(
    "semi_join_existence",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    operators="P8,J8",
    description="Existence probe as a semi-join (airport-exists check, "
                "scripts/uploadFlights.js:20-29).",
)
def semi_join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
                    .select("c_custkey", "c_name", "c_mktsegment"))


@register(
    "anti_join_fk_violations",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    operators="J8",
    description="FK-violation detection as an anti-join "
                "(scripts/uploadFlights.js:106-135).",
)
def anti_join_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
                    .select("c_custkey", "c_name"))


@register(
    "dimension_repair_placeholders",
    oracle="""
    WITH event_users AS (SELECT DISTINCT user_id FROM events),
    known AS (
      SELECT c_custkey AS user_key, c_name AS user_name, c_mktsegment AS segment
      FROM customer WHERE c_custkey IN (SELECT user_id FROM event_users)
    ),
    missing AS (
      SELECT user_id AS user_key,
             'User ' || CAST(user_id AS VARCHAR) || ' (placeholder)' AS user_name,
             'Unknown' AS segment
      FROM event_users
      WHERE user_id NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT * FROM known UNION ALL SELECT * FROM missing
    """,
    operators="J9,J8,U1",
    description="Insert-if-absent dimension repair: synthesize placeholder "
                "rows for missing keys (getOrCreateAirport, "
                "scripts/uploadFlights.js:15-50).",
)
def dimension_repair_placeholders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, customer = load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    users = events.select("user_id").distinct()
    known = (customer.join(users, customer.c_custkey == users.user_id, "left_semi")
                     .select(F.col("c_custkey").alias("user_key"),
                             F.col("c_name").alias("user_name"),
                             F.col("c_mktsegment").alias("segment")))
    missing = (users.join(customer, users.user_id == customer.c_custkey, "left_anti")
                    .select(F.col("user_id").alias("user_key"),
                            F.concat(F.lit("User "), F.col("user_id").cast("string"),
                                     F.lit(" (placeholder)")).alias("user_name"),
                            F.lit("Unknown").alias("segment")))
    return known.unionByName(missing)


@register(
    "lookup_join_with_fuzzy_fallback",
    oracle="""
    WITH lang_map(code, lang_name) AS (
      VALUES ('en','English'), ('es','Spanish'), ('de','German'), ('fr','French')
    )
    SELECT d.lang, COALESCE(m.lang_name, 'Unknown (' || d.lang || ')') AS lang_name,
           COUNT(*) AS n_docs
    FROM documents d LEFT JOIN lang_map m ON lower(trim(d.lang)) = m.code
    GROUP BY 1, 2
    """,
    operators="J7,P3",
    description="Broadcast lookup join with a synthesized fallback value — "
                "the country-hierarchy lookup (smartFileProcessor.js:272-276, "
                "341-345) without per-row network calls.",
)
def lookup_join_with_fuzzy_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    from airline_data_warehouse_spark.operators.frames import (
        jvm_local_frame,
    )
    lang_map = jvm_local_frame(
        spark,
        [("en", "English"), ("es", "Spanish"), ("de", "German"), ("fr", "French")],
        "code string, lang_name string")
    return (
        docs.join(F.broadcast(lang_map),
                  F.lower(F.trim(docs.lang)) == lang_map.code, "left")
            .groupBy("lang",
                     F.coalesce("lang_name",
                                F.concat(F.lit("Unknown ("), F.col("lang"), F.lit(")")))
                      .alias("lang_name"))
            .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Windows (W1-W2 + extensions) and sorts/limits (O1-O3)
# ---------------------------------------------------------------------------

@register(
    "latest_event_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type, value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    operators="W1,T4",
    description="Latest-status-per-flight generalization: top-1 per key by "
                "event time (server.js:153-158).",
)
def latest_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (events.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("user_id",
                          F.col("event_id").alias("last_event_id"),
                          F.col("ts").alias("last_ts"),
                          F.col("event_type").alias("last_type"),
                          F.col("value").alias("last_value")))


@register(
    "keep_first_within_order",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts ASC, event_id ASC) AS rn
          FROM events) WHERE rn = 1
    """,
    operators="W2,A3",
    description="Keep-first dedup with deterministic input order "
                "(passengerMap first-wins, scripts/uploadPassengers.js:143-154).",
)
def keep_first_within_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (events.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("user_id", "event_type",
                          F.col("event_id").alias("first_event_id"),
                          F.col("ts").alias("first_ts")))


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rank_in_priority
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn <= 3
    """,
    operators="W1,O1",
    description="Top-k per group ('top routes by revenue' shape, SURVEY §2.5).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(),
                                                      F.col("o_orderkey").asc())
    return (orders.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 3)
                  .select("o_orderpriority", "o_orderkey", "o_totalprice",
                          F.col("rn").cast("int").alias("rank_in_priority")))


@register(
    "lag_delta_per_key",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
    operators="W-ext",
    description="lag/lead over event time per key (SURVEY §2.5 extension).",
)
def lag_delta_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select("event_id", "user_id", "value",
                         F.lag("value").over(w).alias("prev_value"))


@register(
    "running_total_per_key",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
    operators="W-ext",
    description="Running total per key — exact decimal accumulation so the "
                "result is engine-independent.",
)
def running_total_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select("event_id", "user_id",
                         F.sum(dec2("value")).over(w).cast("double").alias("running_value"))


@register(
    "segment_spend_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS customer_key,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c.c_mktsegment AS segment, s.customer_key,
             CAST(s.spend AS DOUBLE) AS total_spend,
             NTILE(10) OVER (PARTITION BY c.c_mktsegment
                             ORDER BY s.spend DESC, s.customer_key) AS decile,
             ROUND(PERCENT_RANK() OVER (PARTITION BY c.c_mktsegment
                             ORDER BY s.spend DESC, s.customer_key), 6) AS pct_rank,
             ROUND(CUME_DIST() OVER (PARTITION BY c.c_mktsegment
                             ORDER BY s.spend DESC, s.customer_key), 6) AS cume
      FROM spend s JOIN customer c ON c.c_custkey = s.customer_key
    )
    SELECT * FROM ranked WHERE decile <= 2
    """,
    operators="W-analytic",
    description="Distribution-ranking analytics (ntile / percent_rank / "
                "cume_dist): per-segment customer-value deciles, top-20% "
                "band returned. Deterministic because the window orders by "
                "(exact-decimal spend, customer_key) — a total order, so "
                "ntile's bucket boundaries can't wobble between engines.",
)
def segment_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    spend = (orders.groupBy(F.col("o_custkey").alias("customer_key"))
                   .agg(F.sum(dec2("o_totalprice")).alias("spend")))
    w = (Window.partitionBy("segment")
               .orderBy(F.col("spend").desc(), F.col("customer_key")))
    return (spend.join(customer,
                       spend.customer_key == customer.c_custkey)
                 .select(F.col("c_mktsegment").alias("segment"),
                         "customer_key", "spend")
                 .withColumn("decile", F.ntile(10).over(w))
                 .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
                 .withColumn("cume", F.round(F.cume_dist().over(w), 6))
                 .filter(F.col("decile") <= 2)
                 .select("segment", "customer_key",
                         F.col("spend").cast("double").alias("total_spend"),
                         "decile", "pct_rank", "cume"))


@register(
    "global_latest_event",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    operators="O1,W1",
    description="Order-by-desc + limit 1 (latest status update, server.js:157-158).",
)
def global_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .select("event_id", "user_id", "event_type", "ts", "value")
            .limit(1))


@register(
    "newest_100_monitor",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
    operators="O2",
    description="Dirty-data monitor page: newest 100 rows (server.js:214-218).",
)
def newest_100_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .select("event_id", "user_id", "event_type", "ts")
            .limit(100))


# ---------------------------------------------------------------------------
# Aggregations (A1-A6) incl. rollup/cube
# ---------------------------------------------------------------------------

@register(
    "exact_counts",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
           (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
           (SELECT COUNT(*) FROM customer) AS n_customers
    """,
    operators="A1",
    description="Exact table counts for verification "
                "(scripts/uploadPassengers.js:293-304).",
)
def exact_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").agg(F.count("*").alias("n_orders"))
    l = load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_lineitems"))
    c = load(spark, sf_dir, "customer").agg(F.count("*").alias("n_customers"))
    return o.crossJoin(l).crossJoin(c)


@register(
    "grouped_duplicate_report",
    oracle="""
    SELECT text, COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc_id
    FROM documents GROUP BY text HAVING COUNT(*) > 1
    """,
    operators="A2",
    description="Duplicate-key audit report (scripts/checkDuplicates.js:10-47).",
)
def grouped_duplicate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "documents")
            .groupBy("text")
            .agg(F.count("*").alias("n_occurrences"), F.min("doc_id").alias("first_doc_id"))
            .filter(F.col("n_occurrences") > 1))


@register(
    "distinct_dimension_values",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    operators="A3",
    description="Distinct-by-key (order-free dedup).",
)
def distinct_dimension_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "group_tallies",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    operators="A4",
    description="Clean/dirty/total tallies shape (server.js:94-100).",
)
def group_tallies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(dec2("value")).cast("double").alias("total_value")))


@register(
    "revenue_rollup",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS INT)) AS INT) AS g_year,
           CAST(GROUPING(CAST(EXTRACT(quarter FROM o_orderdate) AS INT)) AS INT) AS g_quarter,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP(1, 2)
    """,
    operators="A5",
    description="Hierarchical rollup over date-dim attributes (SURVEY §2.4 — "
                "free via Spark rollup).",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        dec2("o_totalprice").alias("price"))
    return (orders.rollup("order_year", "order_quarter")
                  .agg(F.grouping("order_year").cast("int").alias("g_year"),
                       F.grouping("order_quarter").cast("int").alias("g_quarter"),
                       F.count("*").alias("n_orders"),
                       F.sum("price").cast("double").alias("revenue"))
                  .select("order_year", "order_quarter", "g_year", "g_quarter",
                          "n_orders", "revenue"))


@register(
    "cube_region_priority",
    oracle="""
    SELECT r_name AS region_name, o_orderpriority,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE(r_name, o_orderpriority)
    """,
    operators="A5",
    description="Cube over two dim attributes.",
)
def cube_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    nation, region = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    joined = (orders.join(customer, orders.o_custkey == customer.c_custkey)
                    .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
                    .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
                    .select(F.col("r_name").alias("region_name"), "o_orderpriority",
                            dec2("o_totalprice").alias("price")))
    return (joined.cube("region_name", "o_orderpriority")
                  .agg(F.grouping("region_name").cast("int").alias("g_region"),
                       F.grouping("o_orderpriority").cast("int").alias("g_priority"),
                       F.count("*").alias("n_orders"),
                       F.sum("price").cast("double").alias("revenue"))
                  .select("region_name", "o_orderpriority", "g_region", "g_priority",
                          "n_orders", "revenue"))


@register(
    "distinct_count_by_group",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_distinct_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    operators="A-ext",
    description="Exact distinct aggregate per group.",
)
def distinct_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_distinct_customers"),
                 F.count("*").alias("n_orders")))


@register(
    "segment_stats",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
           MIN(c_acctbal) AS min_acctbal, MAX(c_acctbal) AS max_acctbal
    FROM customer GROUP BY 1
    """,
    operators="A-ext",
    description="Per-group stats; avg computed as exact-sum / count so both "
                "engines produce identical doubles.",
)
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    sum_dec = F.sum(dec2("c_acctbal")).cast("double")
    return (load(spark, sf_dir, "customer")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"),
                 sum_dec.alias("sum_acctbal"),
                 (sum_dec / F.count("*")).alias("avg_acctbal"),
                 F.min("c_acctbal").alias("min_acctbal"),
                 F.max("c_acctbal").alias("max_acctbal")))


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    operators="T6-ext,A5",
    description="Tumbling event-time window aggregate (batch twin of the "
                "streaming delay-stats extension, SURVEY §2.9 T6).",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(dec2("value")).cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "n_events", "total_value"))


# ---------------------------------------------------------------------------
# Projections / filters / predicates (P1-P7)
# ---------------------------------------------------------------------------

@register(
    "projection_rename",
    oracle="""
    SELECT c_custkey AS customer_key, c_name AS full_name, c_mktsegment AS segment
    FROM customer
    """,
    operators="P1,S5",
    description="Projection + snake_case rename (CSV col → table col, "
                "smartFileProcessor.js:241-246).",
)
def projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("full_name"),
        F.col("c_mktsegment").alias("segment"))


@register(
    "filter_equality",
    oracle="SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'",
    operators="P2",
    description="Equality filter (.eq pushdown, server.js:156).",
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value"))


@register(
    "filter_ilike_contains",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE lower(p_type) LIKE '%promo%'
    """,
    operators="P3",
    description="Case-insensitive contains filter (.ilike fallback, "
                "smartFileProcessor.js:344).",
)
def filter_ilike_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "part")
            .filter(F.lower(F.col("p_type")).contains("promo"))
            .select("p_partkey", "p_name", "p_type"))


@register(
    "clean_dirty_split",
    oracle="""
    SELECT doc_id,
           COALESCE(CASE WHEN length(text) < 40 THEN 'too_short'
                         WHEN lang NOT IN ('en','es','de','fr','zh') THEN 'unknown_language'
                    END, 'clean') AS status
    FROM documents
    """,
    operators="P4,S6",
    description="Single-pass error_reason computation → clean/dirty split "
                "(the quarantine model, smartFileProcessor.js:225-253).",
)
def clean_dirty_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    reason = (F.when(F.length("text") < 40, "too_short")
               .when(~F.col("lang").isin("en", "es", "de", "fr", "zh"), "unknown_language"))
    return docs.select("doc_id", F.coalesce(reason, F.lit("clean")).alias("status"))


@register(
    "threshold_case_expr",
    oracle="""
    SELECT event_id, value,
           CASE WHEN value > 240 THEN 'Eligible' ELSE 'Not Eligible' END
             AS insurance_eligibility_status
    FROM events
    """,
    operators="P5,P7",
    description="The 240-minute insurance threshold + CASE "
                "(server.js:162-163, denorm view:31-34).",
)
def threshold_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.functions.cleaning import insurance_eligibility_status
    return (load(spark, sf_dir, "events")
            .select("event_id", "value",
                    insurance_eligibility_status(F.col("value"))
                    .alias("insurance_eligibility_status")))


@register(
    "coalesce_column_pick",
    oracle="""
    SELECT COALESCE(NULLIF(l_returnflag, 'N'), l_linestatus) AS picked_flag,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
    operators="P6",
    description="Null-coalescing column pick (PassengerID || PassengerKey, "
                "smartFileProcessor.js:360).",
)
def coalesce_column_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .groupBy(F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")),
                                F.col("l_linestatus")).alias("picked_flag"))
            .agg(F.count("*").alias("n")))


# ---------------------------------------------------------------------------
# Set operations (U1-U2 + extensions)
# ---------------------------------------------------------------------------

@register(
    "union_two_sources",
    oracle="""
    SELECT event_id, user_id, value, 'purchase_feed' AS sales_source
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, value, 'signup_feed' AS sales_source
    FROM events WHERE event_type = 'signup'
    """,
    operators="U1",
    description="Two-source UNION ALL fact stream (travel-agency + corporate, "
                "scripts/uploadAllSales.js:164).",
)
def union_two_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    a = (events.filter(F.col("event_type") == "purchase")
               .select("event_id", "user_id", "value", F.lit("purchase_feed").alias("sales_source")))
    b = (events.filter(F.col("event_type") == "signup")
               .select("event_id", "user_id", "value", F.lit("signup_feed").alias("sales_source")))
    return a.unionByName(b)


@register(
    "set_except",
    oracle="""
    SELECT DISTINCT user_id FROM events
    EXCEPT
    SELECT DISTINCT c_custkey FROM customer
    """,
    operators="U-ext",
    description="EXCEPT (set difference) — the clean/dirty complement as a set op.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    custs = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id")).distinct()
    return users.subtract(custs)


@register(
    "set_intersect",
    oracle="""
    SELECT DISTINCT user_id FROM events
    INTERSECT
    SELECT DISTINCT c_custkey FROM customer
    """,
    operators="U-ext",
    description="INTERSECT — keys present in both stream and dimension.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    custs = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id")).distinct()
    return users.intersect(custs)


# ---------------------------------------------------------------------------
# Sink semantics as queries (S6-S8, J10/T5) and remaining E2/J7 shapes
# ---------------------------------------------------------------------------

@register(
    "upsert_keyed",
    oracle="""
    WITH source AS (
      SELECT c_custkey AS customer_key, c_name AS full_name, 'UPSERTED' AS segment
      FROM customer WHERE c_custkey <= 50
      UNION ALL
      SELECT c_custkey + 10000, 'New#' || CAST(c_custkey AS VARCHAR), 'NEW'
      FROM customer WHERE c_custkey <= 10
    ),
    target AS (
      SELECT c_custkey AS customer_key, c_name AS full_name, c_mktsegment AS segment
      FROM customer
    )
    SELECT * FROM target WHERE customer_key NOT IN (SELECT customer_key FROM source)
    UNION ALL
    SELECT * FROM source
    """,
    operators="S7",
    description="Keyed upsert (insert-or-update, source wins) via anti-join "
                "+ unionByName — the PostgREST onConflict upsert "
                "(smartFileProcessor.js:167-174) on plain parquet.",
)
def upsert_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.sources.sinks import upsert
    customer = load(spark, sf_dir, "customer")
    target = customer.select(F.col("c_custkey").alias("customer_key"),
                             F.col("c_name").alias("full_name"),
                             F.col("c_mktsegment").alias("segment"))
    modified = (customer.filter(F.col("c_custkey") <= 50)
                .select(F.col("c_custkey").alias("customer_key"),
                        F.col("c_name").alias("full_name"),
                        F.lit("UPSERTED").alias("segment")))
    new_rows = (customer.filter(F.col("c_custkey") <= 10)
                .select((F.col("c_custkey") + 10000).alias("customer_key"),
                        F.concat(F.lit("New#"), F.col("c_custkey").cast("string"))
                         .alias("full_name"),
                        F.lit("NEW").alias("segment")))
    return upsert(target, modified.unionByName(new_rows), "customer_key")


@register(
    "conditional_update",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN TRUE ELSE FALSE END AS is_flagged,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'expedited'
                ELSE 'standard' END AS handling
    FROM orders
    """,
    operators="S8",
    description="UPDATE ... SET ... WHERE as a declarative column rewrite "
                "(the is_eligible_insurance flip, server.js:166-171).",
)
def conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.sources.sinks import conditional_update as cu
    orders = (load(spark, sf_dir, "orders")
              .select("o_orderkey", "o_orderpriority",
                      F.lit(False).alias("is_flagged"),
                      F.lit("standard").alias("handling")))
    updated = cu(orders, F.col("o_orderpriority") == "1-URGENT",
                 {"is_flagged": F.lit(True), "handling": F.lit("expedited")})
    return updated.select("o_orderkey", "is_flagged", "handling")


@register(
    "stream_merge_eligibility",
    oracle="""
    WITH fact AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS transaction_id,
             CAST(o_custkey AS VARCHAR) AS flight_key,
             'scheduled' AS flight_status, 0 AS delay_minutes,
             FALSE AS is_eligible_insurance
      FROM orders
    ),
    eligible AS (
      SELECT CAST(user_id AS VARCHAR) AS flight_key,
             MAX(CAST(round(value, 0) AS INT)) AS new_delay
      FROM events WHERE CAST(round(value, 0) AS INT) > 240
      GROUP BY 1
    )
    SELECT transaction_id, f.flight_key,
           CASE WHEN new_delay IS NOT NULL THEN 'delayed' ELSE flight_status END
             AS flight_status,
           COALESCE(new_delay, delay_minutes) AS delay_minutes,
           CASE WHEN new_delay IS NOT NULL THEN TRUE
                ELSE is_eligible_insurance END AS is_eligible_insurance
    FROM fact f LEFT JOIN eligible e ON f.flight_key = e.flight_key
    """,
    operators="J10,T5",
    description="Stream-to-table enrichment: the foreachBatch eligibility "
                "MERGE body (delay>240 flips the fact flag) run batch-wise — "
                "orders play fact_sales, events play the status batch.",
)
def stream_merge_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.streaming.status import eligibility_merge_batch
    fact = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("transaction_id"),
        F.col("o_custkey").cast("string").alias("flight_key"),
        F.lit("scheduled").alias("flight_status"),
        F.lit(0).alias("delay_minutes"),
        F.lit(False).alias("is_eligible_insurance"))
    status = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("flight_key"),
        F.round("value", 0).cast("int").alias("delay_minutes"))
    return eligibility_merge_batch(fact, status)


@register(
    "quarantine_payload_shape",
    oracle="""
    SELECT doc_id, 'documents' AS source_table,
           to_json(struct_pack(lang := lang, source := source)) AS original_data,
           CASE WHEN length(text) < 40 THEN 'too_short'
                WHEN lang NOT IN ('en','es','de','fr','zh') THEN 'unknown_language'
           END AS error_reason
    FROM documents
    WHERE length(text) < 40 OR lang NOT IN ('en','es','de','fr','zh')
    """,
    operators="S6,P4,F15",
    description="Quarantine row shaping: rejected rows serialized as JSON "
                "payloads + error_reason (the dirty_data JSONB model, "
                "smartFileProcessor.js:428-441).",
)
def quarantine_payload_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    reason = (F.when(F.length("text") < 40, "too_short")
               .when(~F.col("lang").isin("en", "es", "de", "fr", "zh"), "unknown_language"))
    return (docs.withColumn("error_reason", reason)
                .filter(F.col("error_reason").isNotNull())
                .select("doc_id", F.lit("documents").alias("source_table"),
                        F.to_json(F.struct("lang", "source"),
                                  {"ignoreNullFields": "false"}).alias("original_data"),
                        "error_reason"))


@register(
    "country_hierarchy_dim",
    oracle="""
    SELECT CAST(dense_rank() OVER (ORDER BY country) AS BIGINT) AS country_id,
           country AS country_name
    FROM (SELECT DISTINCT
            CASE lower(trim(n_name))
                 WHEN 'united states' THEN 'United States'
                 WHEN 'united kingdom' THEN 'United Kingdom'
                 ELSE upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
            END AS country
          FROM nation)
    """,
    operators="J7,J9",
    description="Materializes the reference's PHANTOM dim_country_hierarchy "
                "(queried at smartFileProcessor.js:272-276 but never created) "
                "from standardized country names.",
)
def country_hierarchy_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from airline_data_warehouse_spark.functions.cleaning import standardize_country
    nation = load(spark, sf_dir, "nation")
    countries = (nation.select(standardize_country(F.col("n_name")).alias("country_name"))
                       .distinct())
    w = Window.orderBy("country_name")
    return countries.select(F.dense_rank().over(w).cast("bigint").alias("country_id"),
                            "country_name")


@register(
    "new_countries_review",
    oracle="""
    SELECT country_name, 'New country added: ' || country_name AS notice
    FROM (SELECT DISTINCT
            CASE lower(trim(n_name))
                 WHEN 'united states' THEN 'United States'
                 WHEN 'united kingdom' THEN 'United Kingdom'
                 ELSE upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
            END AS country_name
          FROM nation)
    WHERE country_name NOT IN ('USA', 'UK', 'UAE', 'Canada', 'Australia',
                               'Japan', 'United States', 'United Kingdom',
                               'United Arab Emirates')
    """,
    operators="2.10-trigger",
    description="Trigger parity (`for supabase/trigger hierarchy:14-17`): "
                "standardized countries outside the known set appended to "
                "the new_countries review table (NOTICE → reviewable rows).",
)
def new_countries_review(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.dimensions import unknown_country_reviews
    from airline_data_warehouse_spark.functions.cleaning import standardize_country
    nation = load(spark, sf_dir, "nation")
    dim = nation.select(standardize_country(F.col("n_name")).alias("country"))
    return unknown_country_reviews(dim)


@register(
    "insurance_verdict_all_flights",
    oracle="""
    SELECT user_id AS flight_ref, delay_min,
           delay_min > 240 AS is_eligible,
           CAST(delay_min // 60 AS INT) AS delay_hours,
           CAST(delay_min % 60 AS INT) AS delay_rem_minutes
    FROM (SELECT user_id, CAST(round(value, 0) AS INT) AS delay_min,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    operators="E2,W1,P5,F17",
    description="The /check-insurance verdict generalized to every key: "
                "latest event per key, 240-min threshold, h/m breakdown "
                "(server.js:144-184).",
)
def insurance_verdict_all_flights(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (events.withColumn("delay_min", F.round("value", 0).cast("int"))
                    .withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") == 1))
    return latest.select(
        F.col("user_id").alias("flight_ref"),
        "delay_min",
        (F.col("delay_min") > 240).alias("is_eligible"),
        F.floor(F.col("delay_min") / 60).cast("int").alias("delay_hours"),
        (F.col("delay_min") % 60).cast("int").alias("delay_rem_minutes"))


@register(
    "event_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS newf
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seqd AS (
      SELECT *, SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS seq
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS INT) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS total_value
    FROM seqd GROUP BY user_id, seq
    """,
    operators="CUSTOM-sessionize,W-ext",
    description="Gap-based session windows (30 min) — custom stateful "
                "operator Spark lacks; batch twin of the "
                "applyInPandasWithState streaming version "
                "(streaming/sessions.py).",
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.streaming.sessions import sessionize_batch
    return sessionize_batch(load(spark, sf_dir, "events"))


@register(
    "approx_distinct_count",
    oracle=None,  # HLL sketches are engine-specific — accuracy is bounded
                  # by tests/test_approx.py against the exact count instead
    operators="A-approx",
    description="approx_count_distinct (HyperLogLog++) per group — the "
                "sketch path for 100 TB distinct counts where exact "
                "count-distinct would shuffle every value. rows-only check; "
                "pytest bounds the error at <2% against the exact count.",
)
def approx_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.approx_count_distinct("o_custkey", rsd=0.01)
                 .alias("approx_distinct_customers"),
                 F.count("*").alias("n_orders")))


@register(
    "exact_distinct_count",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators="A-approx",
    description="Exact COUNT(DISTINCT) twin of approx_distinct_count: same "
                "grouping, hash-checkable oracle — the driver-verifiable "
                "companion for the HLL row (which stays rows-only by "
                "nature). Spark plans this as a two-phase expand+agg; at "
                "100 TB the HLL variant is the scale path.",
)
def exact_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count_distinct("o_custkey").alias("distinct_customers"),
                 F.count("*").alias("n_orders")))


@register(
    "asof_join_status",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_value AS asof_click_value, c.ts AS asof_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    operators="CUSTOM-asof",
    description="As-of join (point-in-time enrichment): each purchase "
                "annotated with the user's latest prior click — Spark "
                "union-window implementation checked against DuckDB's "
                "native ASOF JOIN (operators/asof.py).",
)
def asof_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.operators.asof import asof_join
    events = load(spark, sf_dir, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                       .select("event_id", "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
                    .groupBy("user_id", "ts")
                    .agg(F.max("value").alias("click_value")))
    return asof_join(purchases, clicks, key="user_id",
                     left_ts="ts", right_ts="ts",
                     right_value_cols=["click_value"])


@register(
    "range_join_events",
    oracle="""
    SELECT a.event_id AS error_id, b.event_id AS signup_id, a.user_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') a
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') b
      ON a.user_id = b.user_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000::BIGINT
    """,
    operators="CUSTOM-range",
    description="Range (interval) join: error/signup event pairs within "
                "1 hour per user — bin-bucketed equi-join instead of the "
                "inequality cross-product (operators/asof.py).",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.operators.asof import range_join_binned
    events = load(spark, sf_dir, "events")
    errors = (events.filter(F.col("event_type") == "error")
                    .select(F.col("event_id").alias("error_id"),
                            "user_id", F.col("ts").alias("error_ts")))
    signups = (events.filter(F.col("event_type") == "signup")
                     .select(F.col("event_id").alias("signup_id"),
                             F.col("user_id").alias("s_user_id"),
                             F.col("ts").alias("signup_ts")))
    joined = range_join_binned(
        errors, signups.withColumnRenamed("s_user_id", "user_id"),
        key="user_id", left_ts="error_ts", right_ts="signup_ts",
        tolerance_seconds=3600)
    return joined.select("error_id", "signup_id", "user_id")


@register(
    "exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50_total,
           quantile_cont(o_totalprice, 0.9) AS p90_total,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    operators="A-ext",
    description="Exact interpolated percentiles per group (Spark percentile "
                "== DuckDB quantile_cont, linear interpolation).",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50_total"),
                 F.expr("percentile(o_totalprice, 0.9)").alias("p90_total"),
                 F.count("*").alias("n_orders")))


@register(
    "string_similarity_join",
    oracle="""
    WITH corrupted AS (
      SELECT n_nationkey, substr(n_name, 1, 2) || substr(n_name, 4) AS dirty_name
      FROM nation
    )
    SELECT c.n_nationkey, c.dirty_name, n.n_name AS matched_name,
           CAST(levenshtein(c.dirty_name, n.n_name) AS INT) AS distance
    FROM corrupted c JOIN nation n
      ON abs(length(c.dirty_name) - length(n.n_name)) <= 2
     AND levenshtein(c.dirty_name, n.n_name) <= 2
    """,
    operators="F2/F3-generalized,J7",
    description="String-similarity join (edit distance <= 2) with "
                "pigeonhole segment blocking (PassJoin-style) — dirty "
                "dimension names fuzzy-matched back to the canonical "
                "dimension (the generalized country/email fixup). Blocking "
                "keys are exact substring segments, so candidate volume is "
                "bounded by content collisions even on same-length-heavy "
                "inputs; levenshtein is verify-only.",
)
def string_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.operators.strings import edit_distance_join
    nation = load(spark, sf_dir, "nation")
    corrupted = nation.select(
        "n_nationkey",
        F.concat(F.substring("n_name", 1, 2),
                 F.expr("substring(n_name, 4)")).alias("dirty_name"))
    canon = nation.select(F.col("n_name").alias("matched_name"))
    return edit_distance_join(corrupted, canon, "dirty_name", "matched_name", k=2)


@register(
    "pivot_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    operators="A-pivot",
    description="Pivot: per-user event-type count matrix (explicit value "
                "list keeps the output schema static — mandatory at scale, "
                "an inferred pivot would scan twice).",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    return (load(spark, sf_dir, "events")
            .groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types))


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
             l_extendedprice AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    """,
    operators="A-unpivot",
    description="Unpivot (melt): wide measure columns to long "
                "(measure, value) rows — the EAV reshaping for metric stores.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load(spark, sf_dir, "lineitem")
            .withColumnRenamed("l_extendedprice", "extendedprice")
            .withColumnRenamed("l_discount", "discount")
            .withColumnRenamed("l_tax", "tax")
            .unpivot(["l_orderkey", "l_linenumber"],
                     ["extendedprice", "discount", "tax"],
                     "measure", "value"))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _sql_profile_one(c: str) -> str:
    return f"""
  SELECT '{c}' AS col_name,
         COUNT({c}) AS n,
         CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         COUNT(DISTINCT {c}) AS n_distinct,
         MIN(CAST({c} AS DOUBLE)) AS min_val,
         MAX(CAST({c} AS DOUBLE)) AS max_val,
         ROUND(CAST(SUM(CAST({c} AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT({c}), 6) AS mean_val,
         ROUND(quantile_cont(CAST({c} AS DOUBLE), 0.5), 6) AS p50
  FROM lineitem"""


@register(
    "profile_numeric_columns",
    oracle=" UNION ALL ".join(_sql_profile_one(c) for c in _PROFILE_COLS),
    operators="PROFILE",
    description="Data-profiling report: one row per numeric measure with "
                "count / nulls / distinct / min / max / mean / exact median. "
                "ONE column-pruned scan: the measures UNPIVOT to "
                "(col_name, v) rows and a single HISTOGRAM aggregation "
                "(groupBy measure+value → count) feeds every stat — "
                "including the exact median, via cumulative counts over "
                "the value-ordered histogram — from the tiny "
                "distinct-value frame, never the raw rows (the r05 "
                "plan-per-measure version scanned lineitem 8×). Distinct "
                "is the histogram's row count (no countDistinct EXPAND), "
                "and Spark's percentile() buffer of ALL raw values in "
                "one aggregator is gone. The cumulative count is "
                "TWO-PHASE: distinct values are range-bucketed per "
                "measure (min/max pre-pass, 1024 buckets), bucket-level "
                "offsets come from a window over the ≤1024-rows-per-"
                "measure bucket frame (partitioned by measure), and the "
                "per-value cumsum runs partitioned by (measure, bucket) "
                "— no global Window.orderBy, so no single-task sort even "
                "when distinct ≈ rows (l_extendedprice at 100 TB). NaNs "
                "are excluded from the min/max pre-pass and pinned to "
                "the last bucket (a NaN span would collapse bucketing). "
                "Buckets are equal-width: an extremely skewed value "
                "distribution degrades toward fewer effective buckets "
                "(worst case = one cumsum task per measure), still over "
                "distinct values only, never raw rows. "
                "Means accumulate in exact DECIMAL (order-independent).",
)
def profile_numeric_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    n_buckets = 1024
    # One scan: unpivot the measures, then ONE histogram aggregation
    # keyed on (col_name, v). Everything downstream runs per measure by
    # partitioning/grouping on col_name — the per-measure plans of the
    # r05 version were 4 independent scans × (histogram + stats).
    h = (li.unpivot([], list(_PROFILE_COLS), "col_name", "v")
           .groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("cnt")))
    nn = h.filter(F.col("v").isNotNull())
    # Two-phase cumulative count. Phase 0: per-measure min/max pre-pass
    # gives 1024 equal-width value-range buckets (floor of a monotone
    # affine map, so bucket order == value order and equal values share
    # a bucket). Phase 1: per-(measure, bucket) totals → a ≤1024-rows-
    # per-measure frame whose exclusive-prefix-sum window is trivially
    # cheap. Phase 2: the per-value cumsum windows PARTITIONED by
    # (measure, bucket) and adds the broadcast offset.
    #
    # NaN guard (ADVICE r05): a NaN poisons max() → span=NaN → every row
    # collapses into one bucket, silently restoring the single-task
    # sort. Pre-pass min/max over non-NaN values only and pin NaNs to
    # the last bucket, matching Spark's sort order (NaN greatest).
    vd = F.col("v").cast("double")
    rng = (nn.filter(~F.isnan(vd))
             .groupBy("col_name")
             .agg(F.min("v").alias("_mn"), F.max("v").alias("_mx")))
    span = F.col("_mx").cast("double") - F.col("_mn").cast("double")
    bkt = (F.when(F.isnan(vd), F.lit(n_buckets - 1))
            .when(span == 0, F.lit(0))
            .otherwise(F.least(
                F.lit(n_buckets - 1),
                F.floor((vd - F.col("_mn").cast("double"))
                        / span * n_buckets))).cast("int"))
    bucketed = (nn.join(F.broadcast(rng), "col_name")
                  .withColumn("_bkt", bkt).drop("_mn", "_mx"))
    wb = (Window.partitionBy("col_name").orderBy("_bkt")
                .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (bucketed.groupBy("col_name", "_bkt")
               .agg(F.sum("cnt").alias("_bcnt"))
               .withColumn("_off", F.coalesce(F.sum("_bcnt").over(wb),
                                              F.lit(0)))
               .withColumn("n", F.sum("_bcnt").over(
                   Window.partitionBy("col_name")
                         .rowsBetween(Window.unboundedPreceding,
                                      Window.unboundedFollowing)))
               .drop("_bcnt"))
    wv = (Window.partitionBy("col_name", "_bkt").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (bucketed.join(F.broadcast(offsets), ["col_name", "_bkt"])
                   .withColumn("cum", F.col("_off") + F.sum("cnt").over(wv))
                   .drop("_bkt", "_off"))
    # exact percentile_cont(0.5): mean of the values at 0-indexed
    # positions floor((n-1)/2) and ceil((n-1)/2). Each position lands
    # in exactly one histogram bucket ([cum-cnt, cum) covers it), so
    # the median is a SUM of per-bucket contributions — 0.5·v for
    # each straddling bucket (or 1.0·v when both positions coincide).
    # 0.5·a + 0.5·b == (a+b)/2 bit-exactly in IEEE (scaling by 0.5 is
    # exact; the one rounding happens at the add in both forms).
    k1 = F.floor((F.col("n") - 1) / 2)
    k2 = F.ceil((F.col("n") - 1) / 2)
    d = F.col("v").cast("double")
    in_bucket = lambda k: (F.col("cum") - F.col("cnt") <= k) & (k < F.col("cum"))  # noqa: E731
    med = (cum.withColumn(
               "contrib",
               F.when(in_bucket(k1),
                      d * F.when(k1 == k2, F.lit(1.0)).otherwise(F.lit(0.5)))
                .otherwise(F.lit(0.0))
               + F.when(in_bucket(k2) & (k1 != k2), d * 0.5)
                  .otherwise(F.lit(0.0)))
           .groupBy("col_name")
           .agg(F.round(F.sum("contrib"), 6).alias("p50")))
    not_null_cnt = F.sum(F.when(F.col("v").isNotNull(), F.col("cnt"))
                          .otherwise(0))
    # NaN-bearing measure → mean is NaN (avg semantics, matching the
    # DuckDB oracle's avg): the decimal cast in the exact-sum numerator
    # maps NaN→NULL, which would silently DROP NaNs from the numerator
    # while not_null_cnt still counts them (ADVICE r06). The exact
    # decimal accumulation is unchanged on NaN-free data.
    has_nan = F.max(F.when(F.isnan(F.col("v").cast("double")), F.lit(True))
                     .otherwise(F.lit(False)))
    stats = h.groupBy("col_name").agg(
        not_null_cnt.cast("long").alias("n"),
        F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
         .cast("long").alias("n_null"),
        F.count(F.col("v")).alias("n_distinct"),
        F.min(F.col("v").cast("double")).alias("min_val"),
        F.max(F.col("v").cast("double")).alias("max_val"),
        F.when(has_nan, F.lit(float("nan")).cast("double"))
         .otherwise(
             F.round(F.sum(F.col("v").cast("decimal(28,10)") * F.col("cnt"))
                      .cast("double") / not_null_cnt, 6)).alias("mean_val"))
    # left join: an all-null measure has no histogram rows → no median
    # row; it must still report (with p50 null), as quantile_cont does
    return stats.join(F.broadcast(med), "col_name", "left")


@register(
    "scd2_status_dimension",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type AS status, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, status, ts AS valid_from, event_id FROM ordered
  WHERE prev IS NULL OR prev <> status
)
SELECT user_id, status, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to,
       CAST(lead(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from, event_id) IS NULL
            AS BOOLEAN) AS is_current,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY valid_from, event_id) AS INT)
         AS version
FROM changes
""",
    operators="W-scd2",
    description="SCD Type-2 dimension build from a change-event stream: "
                "per user, consecutive runs of the same status collapse "
                "to one row with [valid_from, valid_to) validity, "
                "is_current on the open-ended row, and a per-key version "
                "counter — the point-in-time dimension every warehouse "
                "maintains for as-of joins (the asof_join_status query "
                "is its consumer shape). Two lag/lead windows, both "
                "partitioned by the dimension key: shuffle once on "
                "user_id, no global sort, scales as keys × changes.",
)
def scd2_status_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id",
                                              "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (ev.withColumn("_prev", F.lag("event_type").over(w))
                 .filter(F.col("_prev").isNull()
                         | (F.col("_prev") != F.col("event_type")))
                 .select("user_id", F.col("event_type").alias("status"),
                         F.col("ts").alias("valid_from"), "event_id"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id", "status", "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"))


@register(
    "rolling_event_features",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ord,
                      CAST(value AS DECIMAL(18,2)) AS v
               FROM events)
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER roll AS INT) AS roll_cnt_24h,
           CAST(SUM(v) OVER roll AS DOUBLE) AS roll_sum_24h,
           ord - lag(ord) OVER (PARTITION BY user_id ORDER BY ord ASC)
               AS micros_since_prev
    FROM e
    WINDOW roll AS (PARTITION BY user_id ORDER BY ord ASC
                    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
    operators="W-rolling",
    description="Per-entity rolling time-range features (trailing-24h "
                "event count and exact decimal sum, plus inter-arrival "
                "gap) — the feature-engineering shape behind fraud/"
                "engagement signals and training-data session stats. "
                "One shuffle on user_id feeds both the RANGE frame and "
                "the lag; the frame is time-bounded (rangeBetween over "
                "unix microseconds), so state per key is O(events in "
                "24 h), never O(history), and no window is unpartitioned.",
)
def rolling_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("ord"),
        F.col("value").cast("decimal(18,2)").alias("v"))
    roll = (Window.partitionBy("user_id").orderBy(F.col("ord").asc())
                  .rangeBetween(-86_400_000_000, 0))
    gap = Window.partitionBy("user_id").orderBy(F.col("ord").asc())
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(roll).cast("int").alias("roll_cnt_24h"),
        F.sum("v").over(roll).cast("double").alias("roll_sum_24h"),
        (F.col("ord") - F.lag("ord").over(gap)).alias("micros_since_prev"))


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS first_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS first_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.first_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.first_click
          GROUP BY e.user_id)
    SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage_reached
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    operators="A-funnel",
    description="Ordered funnel (view -> click -> purchase): per user, "
                "the first view, the first click strictly AFTER it, the "
                "first purchase strictly after that — the event-sequence "
                "conversion query. Three user-keyed aggregations chained "
                "by join; every shuffle is on user_id, so AQE co-locates "
                "the chain after the first exchange, and no window or "
                "per-user sort materializes full event history.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    c = (ev.join(v, "user_id")
           .filter((F.col("event_type") == "click")
                   & (F.col("ts") > F.col("first_view")))
           .groupBy("user_id").agg(F.min("ts").alias("first_click")))
    p = (ev.join(c, "user_id")
           .filter((F.col("event_type") == "purchase")
                   & (F.col("ts") > F.col("first_click")))
           .groupBy("user_id").agg(F.min("ts").alias("first_purchase")))
    return (v.join(c, "user_id", "left").join(p, "user_id", "left")
             .select("user_id", "first_view", "first_click", "first_purchase",
                     F.when(F.col("first_purchase").isNotNull(), 3)
                      .when(F.col("first_click").isNotNull(), 2)
                      .otherwise(1).cast("int").alias("stage_reached")))


@register(
    "cohort_retention",
    oracle="""
    WITH cohort AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
                    FROM events GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
               FROM events)
    SELECT CAST(c.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS INT)
             AS week_offset,
           CAST(COUNT(*) AS INT) AS n_active
    FROM cohort c JOIN active a USING (user_id)
    GROUP BY 1, 2
    """,
    operators="A-cohort",
    description="Cohort retention: users bucketed by first-seen week, "
                "counted in each later active week as a week offset — "
                "the activation/retention triangle. Two user-keyed "
                "aggregations joined on user_id then one small rollup; "
                "active weeks are DISTINCT'd before the join so the "
                "rollup input is |users| x |weeks|, not |events|.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    cohort = (ev.groupBy("user_id")
                .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    active = (ev.select("user_id",
                        F.date_trunc("week", F.col("ts")).alias("active_week"))
                .distinct())
    return (cohort.join(active, "user_id")
            .select(F.col("cohort_week").cast("date").alias("cohort_week"),
                    (F.datediff(F.col("active_week"), F.col("cohort_week"))
                     / 7).cast("int").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).cast("int").alias("n_active")))


@register(
    "shipping_priority_topk",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    operators="J1,A5,O2",
    description="TPC-H Q3 shape (shipping priority): unshipped-order "
                "revenue for one market segment, top 10. The segment "
                "filter prunes customer BEFORE its join (strategy is "
                "AQE's call — customer grows with the business, no "
                "pinned hint, r08), both date "
                "predicates push to the parquet scans, and the top-10 is "
                "a TakeOrdered — never a global sort.",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1997-01-01"
    cust = (load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .groupBy("l_orderkey",
                       F.col("o_orderdate").cast("date").alias("order_date"),
                       "o_orderpriority")
              .agg(F.sum(dec2("l_extendedprice")
                         * (F.lit(1) - dec2("l_discount")))
                    .cast("double").alias("revenue"))
              .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
              .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
              .limit(10))


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    operators="J1-J5,A5",
    description="TPC-H Q5 shape (local supplier volume): revenue where "
                "customer and supplier share a nation inside one region, "
                "grouped by nation. nation/region broadcast by hint "
                "(bounded by geography); customer/supplier are "
                "AQE-planned (growing dims carry no pinned hint, r08). "
                "The c_nationkey = s_nationkey equi-condition rides "
                "the same joins, so the widest shuffle is "
                "fact-to-orders, then the small groupBy.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name",
                                               "n_regionkey")
    reg = (load(spark, sf_dir, "region")
           .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    nat_in = (nat.join(F.broadcast(reg),
                       nat.n_regionkey == reg.r_regionkey)
                 .select("n_nationkey", "n_name"))
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1996-01-01")
                      & (F.col("o_orderdate") < "1998-01-01"))
              .select("o_orderkey", "o_custkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(supp,
                    (li.l_suppkey == supp.s_suppkey)
                    & (cust.c_nationkey == supp.s_nationkey))
              .join(F.broadcast(nat_in),
                    supp.s_nationkey == nat_in.n_nationkey)
              .groupBy("n_name")
              .agg(F.sum(dec2("l_extendedprice")
                         * (F.lit(1) - dec2("l_discount")))
                    .cast("double").alias("revenue")))


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    operators="A5,F17",
    description="TPC-H Q1 shape (pricing summary): the canonical "
                "scan-heavy aggregate — one pass over lineitem, six "
                "measures per (returnflag, linestatus) cell, ~handful of "
                "groups so partial aggregation collapses nearly all rows "
                "map-side. Money math in DECIMAL(18,2) (exact, "
                "order-independent); averages derived from the exact "
                "sums and rounded once.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") <= "2001-06-01"))
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
                   F.sum(dec2("l_extendedprice")).cast("double")
                    .alias("sum_base_price"),
                   F.sum(disc_price).cast("double").alias("sum_disc_price"),
                   F.sum(disc_price * (F.lit(1) + dec2("l_tax")))
                    .cast("double").alias("sum_charge"),
                   F.round(F.sum(dec2("l_quantity")).cast("double")
                           / F.count(F.lit(1)), 6).alias("avg_qty"),
                   F.round(F.sum(dec2("l_discount")).cast("double")
                           / F.count(F.lit(1)), 6).alias("avg_disc"),
                   F.count(F.lit(1)).alias("count_order")))


@register(
    "data_quality_report",
    oracle="""
    SELECT 'fk_orders_customer' AS check_name,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'fk_lineitem_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'unique_customer_key',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
                AS BIGINT)
    UNION ALL
    SELECT 'accepted_event_types',
           CAST((SELECT COUNT(*) FROM events
                 WHERE event_type NOT IN
                       ('view','click','purchase','signup','error')
                    OR event_type IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'nonneg_lineitem_qty',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 0 OR l_quantity IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'nonempty_documents',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE text IS NULL OR length(trim(text)) = 0) AS BIGINT)
    """,
    operators="J8,A1,P4",
    description="Composed data-quality report (dbt-test shape): FK "
                "integrity via anti-join counts (join strategies are "
                "AQE's call — both sides grow with the business; the "
                "lineitem->orders check is the honest shuffle), key "
                "uniqueness, accepted-values, non-negativity, and "
                "non-emptiness — one row per check. Each check is a "
                "partial-agg count; the union is 6 rows.",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")

    def one(name, df):
        return df.agg(F.lit(name).alias("check_name"),
                      F.count(F.lit(1)).alias("n_violations"))

    fk_oc = one("fk_orders_customer",
                orders.join(customer.select("c_custkey"),
                            orders.o_custkey == F.col("c_custkey"),
                            "left_anti"))
    fk_lo = one("fk_lineitem_orders",
                lineitem.join(orders.select("o_orderkey"),
                              lineitem.l_orderkey == F.col("o_orderkey"),
                              "left_anti"))
    uniq = customer.agg(
        F.lit("unique_customer_key").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
         .alias("n_violations"))
    accepted = one("accepted_event_types",
                   events.filter(~F.col("event_type").isin(
                       "view", "click", "purchase", "signup", "error")
                       | F.col("event_type").isNull()))
    nonneg = one("nonneg_lineitem_qty",
                 lineitem.filter((F.col("l_quantity") < 0)
                                 | F.col("l_quantity").isNull()))
    nonempty = one("nonempty_documents",
                   docs.filter(F.col("text").isNull()
                               | (F.length(F.trim("text")) == 0)))
    return (fk_oc.unionByName(fk_lo).unionByName(uniq)
            .unionByName(accepted).unionByName(nonneg)
            .unionByName(nonempty))


@register(
    "pit_status_join",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type AS status, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, status, ts AS valid_from, event_id FROM ordered
  WHERE prev IS NULL OR prev <> status
),
dim AS (
  SELECT user_id, status, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, event_id) AS valid_to,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY valid_from, event_id) AS INT)
           AS version
  FROM changes
)
SELECT e.event_id, e.user_id, e.ts, d.status, d.version
FROM events e JOIN dim d
  ON e.user_id = d.user_id
 AND e.ts >= d.valid_from
 AND (d.valid_to IS NULL OR e.ts < d.valid_to)
""",
    operators="W-scd2,J-temporal",
    description="Point-in-time join: every event enriched with the SCD2 "
                "status version in effect AT ITS TIMESTAMP — the "
                "temporal-correctness join that prevents training-data "
                "leakage from future dimension states. Equi-join on the "
                "key carries the interval predicate as a post-join "
                "filter; per-key version counts are tiny, so the pairs "
                "a key fans out to before filtering are bounded by its "
                "status-change count, not its event count.",
)
def pit_status_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    dim = scd2_status_dimension(spark, sf_dir).select(
        F.col("user_id").alias("d_user"), "status", "valid_from",
        "valid_to", "version")
    return (ev.join(dim,
                    (ev.user_id == dim.d_user)
                    & (ev.ts >= dim.valid_from)
                    & (dim.valid_to.isNull() | (ev.ts < dim.valid_to)))
              .select("event_id", "user_id", "ts", "status", "version"))


@register(
    "above_customer_average",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY o_custkey), 6) AS cust_avg
      FROM orders)
    WHERE o_totalprice > cust_avg
    """,
    operators="A-correlated",
    description="Correlated-subquery shape (orders above their own "
                "customer's average) decorrelated into one "
                "customer-partitioned window — the rewrite Catalyst "
                "applies to scalar correlated subqueries, written "
                "directly: one shuffle on the correlation key, no "
                "re-scan per outer row. Average from an exact decimal "
                "sum, rounded once.",
)
def above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    avg = F.round(F.sum(dec2("o_totalprice")).over(w).cast("double")
                  / F.count(F.lit(1)).over(w), 6)
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    avg.alias("cust_avg"))
            .filter(F.col("o_totalprice") > F.col("cust_avg")))


@register(
    "forward_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS day_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT b.user_id, b.d0 + CAST(t.i AS INTEGER) AS day
      FROM bounds b CROSS JOIN generate_series(0, 8192) AS t(i)
      WHERE b.d0 + CAST(t.i AS INTEGER) <= b.d1
    )
    SELECT s.user_id, s.day,
           last_value(d.day_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS day_value_filled,
           CAST(d.day_value IS NULL AS BOOLEAN) AS was_filled
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
    operators="TS-resample,F14",
    description="Time-series resampling with forward fill: each key gets "
                "a dense daily spine between its first and last "
                "observation (sequence+explode — no calendar table "
                "shipped), gaps carry the last seen daily total forward "
                "(last_value IGNORE NULLS over the key-partitioned "
                "window). Spine rows scale with keys x days, every "
                "window is key-partitioned.",
)
def forward_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id",
                        F.date_trunc("day", F.col("ts")).cast("date")
                         .alias("day"))
               .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)"))
                             .cast("double"), 2).alias("day_value")))
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("d0"),
                                          F.max("day").alias("d1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1",
                             F.expr("interval 1 day"))).alias("day"))
    w = (Window.partitionBy("user_id").orderBy(F.col("day").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(daily, ["user_id", "day"], "left")
            .select("user_id", "day",
                    F.last("day_value", ignorenulls=True).over(w)
                     .alias("day_value_filled"),
                    F.col("day_value").isNull().alias("was_filled")))


@register(
    "priority_count_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    operators="P8,A5",
    description="TPC-H Q4 shape (order-priority checking): orders in a "
                "quarter with at least one line item shipped after the "
                "order date, counted by priority — the canonical EXISTS "
                "query, planned as a LEFT SEMI join. The date filter "
                "pushes to the orders scan; the semi join stops probing "
                "an order at its first qualifying line item.",
)
def priority_count_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= "1996-07-01")
                      & (F.col("o_orderdate") < "1996-10-01"))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    qualified = orders.join(
        li, (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return (qualified.groupBy("o_orderpriority")
                     .agg(F.count(F.lit(1)).alias("order_count")))


@register(
    "last_touch_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IN ('view', 'click')
                  THEN ts END AS m_ts,
             CASE WHEN event_type IN ('view', 'click')
                  THEN event_id END AS m_id,
             CASE WHEN event_type IN ('view', 'click')
                  THEN event_type END AS m_type
      FROM events
    ),
    carried AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(m_ts IGNORE NULLS) OVER w AS touch_ts,
             last_value(m_id IGNORE NULLS) OVER w AS touch_event_id,
             last_value(m_type IGNORE NULLS) OVER w AS touch_type
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           touch_event_id, touch_type,
           CASE WHEN touch_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(touch_ts)
                         <= CAST(7 * 86400 AS BIGINT) * 1000000
                THEN epoch_us(ts) - epoch_us(touch_ts) END
             AS micros_since_touch,
           CAST(touch_ts IS NOT NULL
                AND epoch_us(ts) - epoch_us(touch_ts)
                    <= CAST(7 * 86400 AS BIGINT) * 1000000 AS BOOLEAN) AS attributed
    FROM carried WHERE event_type = 'purchase'
    """,
    operators="W-attribution,J-asof",
    description="Last-touch attribution: each purchase credited to the "
                "user's most recent STRICTLY-PRECEDING view/click within "
                "a 7-day horizon — the marketing as-of pattern, done as "
                "one pass: tag marketing events, carry the latest via "
                "last_value IGNORE NULLS over a 1-PRECEDING frame (the "
                "purchase's own row never self-attributes), filter to "
                "purchases. One user-partitioned window, no self-join "
                "fan-out.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts",
                                              "event_type")
    is_m = F.col("event_type").isin("view", "click")
    tagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(is_m, F.col("ts")).alias("m_ts"),
        F.when(is_m, F.col("event_id")).alias("m_id"),
        F.when(is_m, F.col("event_type")).alias("m_type"))
    w = (Window.partitionBy("user_id")
               .orderBy(F.col("ts").asc(), F.col("event_id").asc())
               .rowsBetween(Window.unboundedPreceding, -1))
    carried = tagged.select(
        "user_id", "ts", "event_id", "event_type",
        F.last("m_ts", ignorenulls=True).over(w).alias("touch_ts"),
        F.last("m_id", ignorenulls=True).over(w).alias("touch_event_id"),
        F.last("m_type", ignorenulls=True).over(w).alias("touch_type"))
    horizon = 7 * 86400 * 1_000_000
    gap = F.unix_micros("ts") - F.unix_micros("touch_ts")
    ok = F.col("touch_ts").isNotNull() & (gap <= horizon)
    return (carried.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id",
                    F.col("ts").alias("purchase_ts"),
                    "touch_event_id", "touch_type",
                    F.when(ok, gap).alias("micros_since_touch"),
                    ok.alias("attributed")))


@register(
    "k_anonymity_report",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           CAST(group_size < 5 AS BOOLEAN) AS at_risk
    FROM g
    """,
    operators="A-privacy",
    description="k-anonymity audit over the quasi-identifier pair "
                "(nation, market segment): every equivalence class with "
                "its size and a k<5 risk flag — the re-identification "
                "check run before releasing or training on "
                "person-derived rows (the PII redaction operator handles "
                "direct identifiers; this catches the indirect ones). "
                "One keyed aggregation with partials; at 100 TB the "
                "class table is |QI-combinations|, not |rows|.",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (cust.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count(F.lit(1)).alias("group_size"))
            .select("c_nationkey", "c_mktsegment", "group_size",
                    (F.col("group_size") < 5).alias("at_risk")))


_ZORDER_PROBS = [i / 16 for i in range(1, 16)]
_SQL_ZKEY = " | ".join(
    f"(((rank_part >> {i}) & 1) << {2 * i}) "
    f"| (((rank_supp >> {i}) & 1) << {2 * i + 1})"
    for i in range(4))


@register(
    "zorder_cluster_keys",
    oracle=f"""
WITH b AS (
  SELECT list_transform(quantile_cont(l_partkey,
                                      {_ZORDER_PROBS}), x -> round(x, 6))
           AS q1,
         list_transform(quantile_cont(l_suppkey,
                                      {_ZORDER_PROBS}), x -> round(x, 6))
           AS q2
  FROM lineitem),
r AS (
  SELECT l.l_orderkey, l.l_linenumber,
         CAST(list_sum(list_transform(
           b.q1, v -> CASE WHEN CAST(l.l_partkey AS DOUBLE) >= v
                           THEN 1 ELSE 0 END)) AS INT) AS rank_part,
         CAST(list_sum(list_transform(
           b.q2, v -> CASE WHEN CAST(l.l_suppkey AS DOUBLE) >= v
                           THEN 1 ELSE 0 END)) AS INT) AS rank_supp
  FROM lineitem l CROSS JOIN b)
SELECT l_orderkey, l_linenumber, rank_part, rank_supp,
       CAST({_SQL_ZKEY} AS BIGINT) AS zkey
FROM r
""",
    operators="LAYOUT-zorder",
    description="Z-order (Morton) clustering keys over the "
                "(l_partkey, l_suppkey) plane — the multi-dimensional "
                "file-layout primitive (sources/layout.py write_zorder; "
                "Delta OPTIMIZE ZORDER BY's math) that lets parquet "
                "footer min/max stats prune scans on EITHER clustered "
                "column at 100 TB, where a time-partitioned fact prunes "
                "nothing for a second-dimension predicate. This key "
                "certifies the exact pipeline: EXACT equi-depth "
                "boundaries (Spark percentile == DuckDB quantile_cont, "
                "the certified exact_percentiles identity, rounded "
                "6 dp), per-row rank as one codegen aggregate over the "
                "boundary literals, and 4-bit/column Morton "
                "interleaving (bit i of column j at position i*2+j) — "
                "all JVM expressions, no UDF, no shuffle beyond the "
                "boundary aggregate. The physical write path "
                "(range-partition by aligned Z-block + "
                "sortWithinPartitions) is pinned by "
                "tests/test_layout.py's footer-stats pruning tests.",
)
def zorder_cluster_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airline_data_warehouse_spark.sources.layout import (
        bucket_rank,
        exact_equi_depth_boundaries,
        morton_key,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    r1 = bucket_rank(li, "l_partkey",
                     exact_equi_depth_boundaries(li, "l_partkey", 16))
    r2 = bucket_rank(li, "l_suppkey",
                     exact_equi_depth_boundaries(li, "l_suppkey", 16))
    return li.select(
        "l_orderkey", "l_linenumber",
        r1.cast("int").alias("rank_part"),
        r2.cast("int").alias("rank_supp"),
        morton_key([r1, r2], bits=4).alias("zkey"))
