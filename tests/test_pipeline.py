"""Full-pipeline test: a drop directory of mixed CSVs through
process_files/run_full_pipeline to a materialized warehouse."""

from __future__ import annotations

import pytest

from airline_data_warehouse_spark.pipeline import process_files, run_full_pipeline
from tests.test_etl import (
    AIRLINES,
    AIRPORTS,
    CO_SALES,
    FLIGHTS,
    PASSENGERS,
    TA_SALES,
)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("drop")
    for name, content in [("passengers.csv", PASSENGERS), ("airports.csv", AIRPORTS),
                          ("airlines.csv", AIRLINES), ("flights.csv", FLIGHTS),
                          ("ta_sales.csv", TA_SALES), ("corporate.csv", CO_SALES),
                          ("mystery.csv", "Foo,Bar\n1,2\n")]:
        (d / name).write_text(content)
    return d


def test_full_pipeline(spark, csv_dir, tmp_path):
    result = run_full_pipeline(spark, str(csv_dir), str(tmp_path / "wh"))
    by_name = {f.filename: f for f in result.files}
    assert not by_name["mystery.csv"].success  # unknown type reported, not fatal
    assert by_name["passengers.csv"].dirty_records == 4
    assert by_name["ta_sales.csv"].clean_records == 3

    assert result.tables["dim_passenger"].count() == 2
    assert result.tables["dim_airport"].count() == 6  # 4 clean + 2 placeholders
    assert result.tables["fact_sales"].count() == 5
    assert result.tables["dim_date"].count() == 731

    # quarantine aggregates every file's rejects with payloads
    reasons = {r["error_reason"] for r in result.quarantine.collect()}
    assert "Invalid passenger key" in reasons and "Duplicate airport key" in reasons

    # the analytics view resolves the joinable fact rows
    assert result.analytics_view.count() == 4

    # warehouse materialized with partition layout
    fact = spark.read.parquet(str(tmp_path / "wh" / "fact_sales"))
    assert fact.count() == 5 and "sale_year_month" in fact.columns


def test_pipeline_upsert_across_files(spark, csv_dir, tmp_path):
    extra = tmp_path / "drop2"
    extra.mkdir()
    (extra / "a_airports.csv").write_text(
        "AirportKey,AirportName,City,Country\nJFK,Old Name,New York,USA\n")
    (extra / "b_airports.csv").write_text(
        "AirportKey,AirportName,City,Country\nJFK,New Name,New York,USA\n"
        "ORD,O'Hare,Chicago,USA\n")
    result = process_files(spark, [str(extra / "a_airports.csv"),
                                   str(extra / "b_airports.csv")])
    rows = {r["airport_key"]: r for r in result.tables["dim_airport"].collect()}
    assert rows["JFK"]["airport_name"] == "New Name"  # later file wins (upsert)
    assert set(rows) == {"JFK", "ORD"}


def test_new_countries_review_table(spark):
    from airline_data_warehouse_spark.dimensions import unknown_country_reviews
    dim = spark.createDataFrame(
        [("JFK", "United States"), ("LHR", "United Kingdom"),
         ("KEF", "Iceland"), ("RKV", "Iceland"), ("NRT", "Japan")],
        "airport_key string, country string")
    rows = {r["country_name"]: r["notice"]
            for r in unknown_country_reviews(dim).collect()}
    assert rows == {"Iceland": "New country added: Iceland"}
