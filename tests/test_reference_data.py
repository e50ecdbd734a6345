"""Integration test against the reference's OWN dirty datasets
(/root/reference/datasets — read-only inputs): the pipeline must
reproduce the corruption handling FIXTURES.md catalogues from the
reference's behavior (marker rows, repeated header, KEF/MDW dups,
last-3 key truncation collisions, placeholder airports, currency junk).
"""

from __future__ import annotations

import glob
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from airline_data_warehouse_spark.pipeline import process_files

DATASETS = "/root/reference/datasets"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATASETS),
                                reason="reference datasets not mounted")


@pytest.fixture(scope="module")
def result(spark):
    return process_files(spark, sorted(glob.glob(f"{DATASETS}/*.csv")))


def test_per_file_summaries(result):
    by_type = {f.file_type: f for f in result.files}
    assert by_type["airports"].total_records == 216
    assert by_type["airports"].dirty_records == 2          # KEF + MDW dups
    assert by_type["airlines"].clean_records == 39
    assert by_type["corporate_sales"].dirty_records == 0   # corp file is clean
    assert by_type["passengers"].dirty_records > 1800      # truncation collisions
    assert by_type["travel_agency_sales"].dirty_records == 5


def test_quarantine_reasons(result):
    counts = {(r["source_table"], r["error_reason"]): r["n"]
              for r in result.quarantine.groupBy("source_table", "error_reason")
              .agg(F.count("*").alias("n")).collect()}
    # 8 corruption-marker lines + 1 repeated header row (FIXTURES.md §1)
    assert counts[("passengers", "Invalid passenger key")] == 9
    assert counts[("airports", "Duplicate airport key")] == 2
    assert counts[("travel_agency_sales", "Duplicate transaction ID")] == 2
    assert counts[("travel_agency_sales", "Invalid passenger key")] == 2
    assert counts[("travel_agency_sales", "Missing flight key")] == 1


def test_dimension_contents(result):
    # last-3-digit truncation maps 2830 raw keys onto exactly the P000-P999
    # space — every bucket hit, first occurrence wins
    assert result.tables["dim_passenger"].count() == 1000
    airports = {r["airport_key"]: r for r in result.tables["dim_airport"].collect()}
    assert len(airports) == 222  # 214 clean + 8 placeholder repairs
    assert airports["KEF"]["airport_name"] != "Keflavik Duplicate"  # keep-first
    assert airports["JK"]["airport_name"] == "JK Airport"  # 2-char code repaired
    assert airports["JK"]["country"] == "Unknown"
    # country standardization collapsed the US/USA/U.S.A./United States mess
    us = [a for a in airports.values() if a["country"] == "United States"]
    assert len(us) > 90
    assert not any(a["country"] in ("US", "USA", "U.S.A.") for a in airports.values())


def test_fact_and_view(result):
    fact = {r["transaction_id"]: r for r in result.tables["fact_sales"].collect()}
    assert len(fact) == 396  # 296 TA + 100 corporate
    assert fact["TA040001"]["ticket_price"] == Decimal("1540.00")  # "$1,540.00"
    assert fact["TA040001"]["total_amount"] == Decimal("1734.00")
    assert fact["TA040001"]["date_key"] == 20230110
    assert fact["CO010001"]["passenger_key"] == "P001"
    sources = {r["sales_source"] for r in result.tables["fact_sales"]
               .select("sales_source").distinct().collect()}
    assert sources == {"travel_agency", "corporate"}
    # every fact row resolves through the 5 inner joins after repair
    assert result.analytics_view.count() == 396
    statuses = {r["insurance_eligibility_status"]
                for r in result.analytics_view.select("insurance_eligibility_status")
                .distinct().collect()}
    assert statuses == {"Not Eligible"}  # no delays loaded yet
