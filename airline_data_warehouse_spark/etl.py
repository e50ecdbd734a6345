"""ETL: per-file-type processors — the reference's row-at-a-time
validate/standardize loops (smartFileProcessor.js processPassengerData /
processAirportData / processAirlineData / processFlightData /
processSalesData; scripts/upload*.js) re-expressed as single-pass
DataFrame plans:

    raw strings → one `error_reason` CASE chain → filter split into
    (clean, dirty) → keep-first dedup by standardized key → upsert.

Each processor returns ``(clean, dirty)`` where dirty carries
``error_reason`` plus the raw input columns (for the quarantine JSON
payload). No per-row network calls: the reference's row-wise country /
airport lookups become broadcast joins (E1 lifecycle, SURVEY §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airline_data_warehouse_spark.functions import cleaning as C
from airline_data_warehouse_spark.schemas import MONEY

DIRTY_COLS = ["error_reason"]


def _split(df: DataFrame, reason: F.Column) -> tuple[DataFrame, DataFrame]:
    tagged = df.withColumn("error_reason", reason)
    clean = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
    dirty = tagged.filter(F.col("error_reason").isNotNull())
    return clean, dirty


def _keep_first(df: DataFrame, key: str, dup_reason: str) -> tuple[DataFrame, DataFrame]:
    """W2 — first occurrence (by input order) wins; later dups → dirty."""
    w = Window.partitionBy(key).orderBy("_line_no")
    ranked = df.withColumn("_rn", F.row_number().over(w))
    firsts = ranked.filter(F.col("_rn") == 1).drop("_rn")
    dups = (ranked.filter(F.col("_rn") > 1).drop("_rn")
                  .withColumn("error_reason", F.lit(dup_reason)))
    return firsts, dups


def process_passengers(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """smartFileProcessor.js:225-253 + keep-first dedup by standardized key
    (scripts/uploadPassengers.js:120-170). Rejects: unstandardizable key;
    duplicates of an already-seen standardized key."""
    std_key = C.standardize_passenger_key(F.col("PassengerKey"))
    reason = F.when(std_key.isNull(), "Invalid passenger key")
    clean0, dirty0 = _split(raw.withColumn("_std_key", std_key), reason)
    firsts, dups = _keep_first(clean0, "_std_key", "Duplicate passenger key")
    clean = firsts.select(
        F.col("_std_key").alias("passenger_key"),
        F.trim("FullName").alias("full_name"),
        C.standardize_email(F.col("FullName"), F.col("Email")).alias("email"),
        C.standardize_loyalty_status(F.col("LoyaltyStatus")).alias("loyalty_status"),
    )
    return clean, dirty0.unionByName(dups).drop("_std_key")


def process_airports(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """smartFileProcessor.js:256-292: 3-char key or reject; standardized
    country; keep-first on key (the KEF/MDW dup rule)."""
    key = F.upper(F.trim(F.col("AirportKey")))
    reason = F.when(key.isNull() | (F.length(key) != 3), "Invalid airport key")
    clean0, dirty0 = _split(raw.withColumn("_key", key), reason)
    firsts, dups = _keep_first(clean0, "_key", "Duplicate airport key")
    clean = firsts.select(
        F.col("_key").alias("airport_key"),
        F.trim("AirportName").alias("airport_name"),
        F.trim("City").alias("city"),
        C.standardize_country(F.col("Country")).alias("country"),
    )
    return clean, dirty0.unionByName(dups).drop("_key")


def process_airlines(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """smartFileProcessor.js:444-452: rows without a key are silently
    dropped (the reference returns dirtyData: [] here — parity kept)."""
    clean = (raw.filter(F.trim(F.col("AirlineKey")) != "")
                .select(
                    F.upper(F.trim("AirlineKey")).alias("airline_key"),
                    F.trim("AirlineName").alias("airline_name"),
                    C.na_to_null(F.col("Alliance")).alias("alliance")))
    dirty = raw.filter(F.col("AirlineKey").isNull() | (F.trim(F.col("AirlineKey")) == "")) \
               .withColumn("error_reason", F.lit(None).cast("string")).limit(0)
    return clean, dirty


def process_flights(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """smartFileProcessor.js:455-482: key+origin+dest all required."""
    key = F.trim(F.col("FlightKey"))
    origin = F.upper(F.trim(F.col("OriginAirportKey")))
    dest = F.upper(F.trim(F.col("DestinationAirportKey")))
    missing = (key.isNull() | (key == "") | origin.isNull() | (origin == "")
               | dest.isNull() | (dest == ""))
    reason = F.when(missing, "Missing required flight data")
    clean0, dirty = _split(raw, reason)
    clean = clean0.select(
        key.alias("flight_key"),
        origin.alias("origin_airport_key"),
        dest.alias("destination_airport_key"),
        F.trim("AircraftType").alias("aircraft_type"),
    )
    return clean, dirty


def repair_airport_dim(dim_airport: DataFrame, flights: DataFrame) -> DataFrame:
    """J8/J9 — getOrCreateAirport (scripts/uploadFlights.js:15-50): any
    origin/dest key missing from the dimension gets a placeholder row
    ``{key, '<KEY> Airport', Unknown, Unknown}``. The reference's Set
    cache + per-row lookup becomes one anti-join over the union of
    referenced keys."""
    referenced = (flights.select(F.col("origin_airport_key").alias("airport_key"))
                  .unionByName(flights.select(F.col("destination_airport_key")
                                              .alias("airport_key")))
                  .distinct())
    missing = referenced.join(dim_airport, "airport_key", "left_anti")
    placeholders = missing.select(
        "airport_key",
        F.concat(F.col("airport_key"), F.lit(" Airport")).alias("airport_name"),
        F.lit("Unknown").alias("city"),
        F.lit("Unknown").alias("country"),
    )
    return dim_airport.unionByName(placeholders)


def process_sales(raw: DataFrame, source_type: str) -> tuple[DataFrame, DataFrame]:
    """smartFileProcessor.js:353-414 / scripts/uploadAllSales.js: coalesce
    the two sales schemas (P6), standardize key/date/amounts, synthesize
    the prefixed transaction id, reject in the JS rule order (passenger
    key → flight key → date), then keep-first dedup on transaction_id."""
    cols = set(raw.columns)

    def pick(*names: str) -> F.Column:
        present = [C.strip_single_quotes(F.col(n)) for n in names if n in cols]
        return F.coalesce(*present) if present else F.lit(None).cast("string")

    pax = C.standardize_passenger_key(pick("PassengerID", "PassengerKey"))
    flight = pick("FlightID", "FlightKey")
    date = C.standardize_date(pick("TransactionDate", "DateKey"))
    reason = (F.when(pax.isNull(), "Invalid passenger key")
               .when(flight.isNull() | (flight == ""), "Missing flight key")
               .when(date.isNull(), "Invalid date"))
    prefix = "TA" if source_type == "travel_agency" else "CO"
    staged = (raw
              .withColumn("_pax", pax)
              .withColumn("_flight", flight)
              .withColumn("_date", date)
              .withColumn("_txn", C.synth_transaction_id(pick("TransactionID"), prefix)))
    clean0, dirty0 = _split(staged, reason)
    firsts, dups = _keep_first(clean0, "_txn", "Duplicate transaction ID")
    clean = firsts.select(
        F.col("_txn").alias("transaction_id"),
        C.date_key_of(F.col("_date")).alias("date_key"),
        F.col("_pax").alias("passenger_key"),
        F.col("_flight").alias("flight_key"),
        C.standardize_amount(pick("TicketPrice")).alias("ticket_price"),
        C.standardize_amount(pick("Taxes")).alias("taxes"),
        C.standardize_amount(pick("BaggageFees")).alias("baggage_fees"),
        C.standardize_amount(pick("TotalAmount")).alias("total_amount"),
        F.lit(source_type).alias("sales_source"),
        F.lit("scheduled").alias("flight_status"),
        F.lit(0).alias("delay_minutes"),
        F.lit(False).alias("is_eligible_insurance"),
        F.current_timestamp().alias("created_at"),
        # input-order key, carried so union_sales_dedup can break
        # cross-file ties deterministically (first occurrence wins);
        # dropped from the final fact there
        F.col("_line_no"),
    )
    helper = ["_pax", "_flight", "_date", "_txn"]
    return clean, dirty0.unionByName(dups).drop(*helper)


def union_sales_dedup(ta: DataFrame, co: DataFrame) -> tuple[DataFrame, DataFrame]:
    """U1 + cross-file dedup (scripts/uploadAllSales.js:164-188): union the
    two cleaned sources, then keep-first again on transaction_id across
    files. Order: travel-agency before corporate (mirrors the reference's
    array order), then `_line_no` (file path, byte offset, sequence) so
    duplicates from two files of the SAME source type also resolve
    first-occurrence-wins deterministically — `created_at` is
    current_timestamp() and therefore query-constant, useless as a tie-break.
    """
    tagged = (ta.withColumn("_file_order", F.lit(0))
                .unionByName(co.withColumn("_file_order", F.lit(1))))
    w = Window.partitionBy("transaction_id").orderBy("_file_order", "_line_no")
    ranked = tagged.withColumn("_rn", F.row_number().over(w))
    clean = ranked.filter(F.col("_rn") == 1).drop("_rn", "_file_order", "_line_no")
    dups = (ranked.filter(F.col("_rn") > 1).drop("_rn", "_file_order", "_line_no")
                  .withColumn("error_reason", F.lit("Duplicate transaction ID (cross-file)")))
    return clean, dups


PROCESSORS = {
    "passengers": process_passengers,
    "airports": process_airports,
    "airlines": process_airlines,
    "flights": process_flights,
    "travel_agency_sales": lambda raw: process_sales(raw, "travel_agency"),
    "corporate_sales": lambda raw: process_sales(raw, "corporate"),
}


def money_consistency_check(fact: DataFrame) -> DataFrame:
    """F17 extension — total = ticket+taxes+baggage invariant audit."""
    expected = (F.col("ticket_price") + F.col("taxes") + F.col("baggage_fees")).cast(MONEY)
    return (fact.withColumn("_expected_total", expected)
                .filter(F.col("total_amount") != F.col("_expected_total"))
                .select("transaction_id", "total_amount",
                        F.col("_expected_total").alias("expected_total")))
