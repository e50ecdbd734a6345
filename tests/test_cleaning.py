"""Unit tests for the cleaning expression library (SURVEY §2.8 F1-F17),
pinned to the reference's JS semantics including the dirty-fixture edge
cases catalogued in FIXTURES.md."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from airline_data_warehouse_spark.functions import cleaning as C


def _eval1(spark, expr_builder, *values):
    """Evaluate a 1..n-arg Column expression over literal rows."""
    schema = ", ".join(f"c{i} string" for i in range(len(values)))
    df = spark.createDataFrame([tuple(values)], schema)
    cols = [F.col(f"c{i}") for i in range(len(values))]
    return df.select(expr_builder(*cols).alias("out")).collect()[0]["out"]


def test_passenger_key_basic(spark):
    assert _eval1(spark, C.standardize_passenger_key, "P1001") == "P001"
    assert _eval1(spark, C.standardize_passenger_key, "P00101") == "P101"
    assert _eval1(spark, C.standardize_passenger_key, "P123") == "P123"


def test_passenger_key_rejects(spark):
    assert _eval1(spark, C.standardize_passenger_key, "P12") is None      # <3 digits
    assert _eval1(spark, C.standardize_passenger_key, "12345") is None    # no 'P'
    assert _eval1(spark, C.standardize_passenger_key, "") is None
    assert _eval1(spark, C.standardize_passenger_key, None) is None
    assert _eval1(spark, C.standardize_passenger_key, "Coffee spill") is None


def test_passenger_key_numeric_variant(spark):
    f = lambda c: C.standardize_passenger_key(c, accept_numeric=True)
    assert _eval1(spark, f, "12345") == "P345"
    assert _eval1(spark, f, "12") is None


def test_email_keep_valid(spark):
    assert _eval1(spark, C.standardize_email, "Mary Smith", "Mary.S@EXAMPLE.ORG") == "mary.s@example.org"


def test_email_synthesize(spark):
    assert _eval1(spark, C.standardize_email, "Mary Smith", "not-an-email") == "mary.smith@example.com"
    assert _eval1(spark, C.standardize_email, "Mary Anne Smith", None) == "mary.smith@example.com"
    assert _eval1(spark, C.standardize_email, "Cher", None) == "cher@example.com"
    assert _eval1(spark, C.standardize_email, None, None) == "user@example.com"
    assert _eval1(spark, C.standardize_email, "  ", "x@y") == "user@example.com"


def test_country_aliases(spark):
    for raw in ["US", "usa", "United States", "U.S.A.", " u.s. "]:
        assert _eval1(spark, C.standardize_country, raw) == "United States"
    for raw in ["UK", "Great Britain", "ENGLAND"]:
        assert _eval1(spark, C.standardize_country, raw) == "United Kingdom"
    assert _eval1(spark, C.standardize_country, "UAE") == "United Arab Emirates"


def test_country_fallback(spark):
    assert _eval1(spark, C.standardize_country, "JAPAN") == "Japan"
    assert _eval1(spark, C.standardize_country, "france") == "France"
    assert _eval1(spark, C.standardize_country, None) == "Unknown"
    assert _eval1(spark, C.standardize_country, " ") == "Unknown"


def test_amount(spark):
    assert _eval1(spark, C.standardize_amount, "$1,540.00") == Decimal("1540.00")
    assert _eval1(spark, C.standardize_amount, "620.005") == Decimal("620.01")  # half-up
    assert _eval1(spark, C.standardize_amount, "  $40.00 ") == Decimal("40.00")
    assert _eval1(spark, C.standardize_amount, "garbage") == Decimal("0.00")
    assert _eval1(spark, C.standardize_amount, None) == Decimal("0.00")
    assert _eval1(spark, C.standardize_amount, "-12.5") == Decimal("-12.50")
    assert _eval1(spark, C.standardize_amount, "1.2.3") == Decimal("1.20")  # parseFloat prefix


def test_date_formats(spark):
    assert str(_eval1(spark, C.standardize_date, "2023-01-10")) == "2023-01-10"
    assert str(_eval1(spark, C.standardize_date, "01/18/2023")) == "2023-01-18"
    assert str(_eval1(spark, C.standardize_date, "20-Jan-23")) == "2023-01-20"
    assert str(_eval1(spark, C.standardize_date, "20230105")) == "2023-01-05"
    assert _eval1(spark, C.standardize_date, "not a date") is None
    assert _eval1(spark, C.standardize_date, "2023-13-45") is None


def test_date_key(spark):
    assert _eval1(spark, lambda c: C.date_key_of(C.standardize_date(c)), "2023-01-10") == 20230110


def test_transaction_id(spark):
    f = lambda c: C.synth_transaction_id(c, "TA")
    assert _eval1(spark, f, "40001") == "TA040001"
    assert _eval1(spark, f, "TX-7") == "TA000007"
    assert _eval1(spark, f, "1234567") == "TA1234567"  # padStart never truncates
    g = lambda c: C.synth_transaction_id(c, "CO")
    assert _eval1(spark, g, "10001") == "CO010001"


def test_loyalty(spark):
    assert _eval1(spark, C.standardize_loyalty_status, "PLAT") == "Platinum"
    assert _eval1(spark, C.standardize_loyalty_status, "gold member") == "Gold"
    assert _eval1(spark, C.standardize_loyalty_status, "SILV") == "Silver"
    assert _eval1(spark, C.standardize_loyalty_status, "whatever") == "Bronze"
    assert _eval1(spark, C.standardize_loyalty_status, None) == "Bronze"


def test_na_null_and_quotes(spark):
    assert _eval1(spark, C.na_to_null, "N/A") is None
    assert _eval1(spark, C.na_to_null, " N/A ") is None
    # reference keeps empty strings: smartFileProcessor.js:448 compares
    # the trimmed value to 'N/A' only
    assert _eval1(spark, C.na_to_null, "  ") == ""
    assert _eval1(spark, C.na_to_null, " Oneworld ") == "Oneworld"
    assert _eval1(spark, C.strip_single_quotes, " 'AA100'") == "AA100"


def test_insurance_status(spark):
    df = spark.createDataFrame([(241,), (240,), (0,), (None,)], ["d"])
    out = [r[0] for r in df.select(C.insurance_eligibility_status(F.col("d"))).collect()]
    assert out == ["Eligible", "Not Eligible", "Not Eligible", "Not Eligible"]


def test_dim_date(spark):
    from airline_data_warehouse_spark.dimensions import build_dim_date
    dd = build_dim_date(spark)
    assert dd.count() == 731
    row = dd.filter(F.col("date_key") == 20230101).collect()[0]
    assert row["day_name"] == "Sunday" and row["day_of_week"] == 1
    assert row["quarter"] == 1 and row["year"] == 2023 and row["month_name"] == "January"
