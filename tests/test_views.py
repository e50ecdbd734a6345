"""SQL surface parity (views.py): after one register_views call, a
reference user's SQL runs verbatim through spark.sql — same rows AND
same physical plan (dimension broadcasts survive the view) as the
DataFrame API."""

from __future__ import annotations

from datetime import datetime as dt

import pytest
from pyspark.sql import functions as F

from airline_data_warehouse_spark import etl
from airline_data_warehouse_spark.analytics import build_airline_analytics
from airline_data_warehouse_spark.dimensions import build_dim_date
from airline_data_warehouse_spark.views import register_views
from tests import test_etl as te
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def star_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("views_csvs")
    for name, content in [("passengers.csv", te.PASSENGERS),
                          ("airports.csv", te.AIRPORTS),
                          ("airlines.csv", te.AIRLINES),
                          ("flights.csv", te.FLIGHTS),
                          ("ta_sales.csv", te.TA_SALES),
                          ("corporate.csv", te.CO_SALES)]:
        (d / name).write_text(content)
    dim_passenger, _ = etl.process_passengers(te._detected(spark, d, "passengers.csv")[1])
    dim_airport, _ = etl.process_airports(te._detected(spark, d, "airports.csv")[1])
    dim_airline, _ = etl.process_airlines(te._detected(spark, d, "airlines.csv")[1])
    dim_flight, _ = etl.process_flights(te._detected(spark, d, "flights.csv")[1])
    dim_airport = etl.repair_airport_dim(dim_airport, dim_flight)
    ta, _ = etl.process_sales(te._detected(spark, d, "ta_sales.csv")[1], "travel_agency")
    co, _ = etl.process_sales(te._detected(spark, d, "corporate.csv")[1], "corporate")
    fact, _ = etl.union_sales_dedup(ta, co)
    status = spark.createDataFrame(
        [(1, "AA100", "delayed", 300, dt(2024, 1, 1, 10)),
         (2, "AA100", "departed", 310, dt(2024, 1, 1, 12)),
         (3, "AF023", "scheduled", 0, dt(2024, 1, 1, 9))],
        "id long, flight_key string, status string, delay_minutes int, "
        "update_timestamp timestamp")
    return {"fact_sales": fact, "dim_date": build_dim_date(spark),
            "dim_passenger": dim_passenger, "dim_flight": dim_flight,
            "dim_airport": dim_airport, "dim_airline": dim_airline,
            "flight_status_updates": status}


def test_register_views_exposes_reference_names(spark, star_tables):
    names = register_views(spark, star_tables)
    assert "v_airline_analytics" in names
    assert "v_latest_flight_status" in names
    assert set(star_tables) <= set(names)
    existing = {t.name for t in spark.catalog.listTables()}
    assert {"v_airline_analytics", "fact_sales", "dim_date"} <= existing


def test_sql_view_matches_dataframe_api(spark, star_tables):
    register_views(spark, star_tables)
    via_sql = spark.sql(
        "SELECT transaction_id, origin_country, airline_name, alliance, "
        "insurance_eligibility_status FROM v_airline_analytics")
    via_df = build_airline_analytics(
        star_tables["fact_sales"], star_tables["dim_date"],
        star_tables["dim_passenger"], star_tables["dim_flight"],
        star_tables["dim_airport"], star_tables["dim_airline"],
    ).select("transaction_id", "origin_country", "airline_name",
             "alliance", "insurance_eligibility_status")
    assert sorted(map(tuple, via_sql.collect())) == \
        sorted(map(tuple, via_df.collect()))


def test_bi_style_sql_aggregate_over_view(spark, star_tables):
    register_views(spark, star_tables)
    rows = spark.sql("""
        SELECT year, alliance, COUNT(*) AS n_sales,
               CAST(SUM(CAST(total_amount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM v_airline_analytics
        GROUP BY year, alliance
        ORDER BY year, alliance NULLS FIRST
    """).collect()
    assert rows, "BI aggregate returned nothing"
    assert {r["year"] for r in rows} == {2023}
    total = sum(r["revenue"] for r in rows)
    fact_total = (star_tables["fact_sales"]
                  .join(star_tables["dim_passenger"], "passenger_key")
                  .join(star_tables["dim_flight"], "flight_key")
                  .agg(F.sum(F.col("total_amount").cast("decimal(18,2)")))
                  .collect()[0][0])
    assert total == float(fact_total)


def test_view_keeps_broadcast_star_plan(spark, star_tables):
    register_views(spark, star_tables)
    plan = plan_of(spark.sql(
        "SELECT transaction_id FROM v_airline_analytics WHERE year = 2023"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_latest_status_view(spark, star_tables):
    register_views(spark, star_tables)
    got = {r["flight_key"]: r["status"] for r in
           spark.sql("SELECT flight_key, status "
                     "FROM v_latest_flight_status").collect()}
    assert got == {"AA100": "departed", "AF023": "scheduled"}


def test_partial_warehouse_registers_what_it_has(spark, star_tables):
    partial = {"dim_airport": star_tables["dim_airport"]}
    names = register_views(spark, partial)
    assert names == ["dim_airport"]
