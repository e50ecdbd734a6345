"""Schema registry: warehouse target schemas + input-file signatures.

Mirrors the reference's fixed DDL (``for supabase/dim tables``, ``fact
table``, ``flight status table``) and the ``SmartFileProcessor.fileSignatures``
detection registry (``smartFileProcessor.js:15-53``) — re-expressed as
Spark ``StructType``s plus a declarative signature table matched against
``df.columns`` (see sources/detect.py).

CHECK constraints (loyalty_status, sales_source) and VARCHAR lengths are
not types in Spark; they become validation predicates in the clean/dirty
split (functions/cleaning.py), matching the reference's quarantine
behavior rather than failing the write.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MONEY = DecimalType(10, 2)  # reference: DECIMAL(10,2), 2-dp fixed point

# ---------------------------------------------------------------------------
# Target (clean) table schemas — reference DDL in `for supabase/*`.
# ---------------------------------------------------------------------------

DIM_PASSENGER = StructType([
    StructField("passenger_key", StringType(), False),   # 'P' + 3 digits
    StructField("full_name", StringType(), True),
    StructField("email", StringType(), True),
    StructField("loyalty_status", StringType(), True),   # Bronze|Silver|Gold|Platinum
])

DIM_AIRPORT = StructType([
    StructField("airport_key", StringType(), False),     # 3-char IATA
    StructField("airport_name", StringType(), True),
    StructField("city", StringType(), True),
    StructField("country", StringType(), True),
])

DIM_AIRLINE = StructType([
    StructField("airline_key", StringType(), False),     # 2-char IATA carrier
    StructField("airline_name", StringType(), True),
    StructField("alliance", StringType(), True),         # nullable ('N/A' -> NULL)
])

DIM_FLIGHT = StructType([
    StructField("flight_key", StringType(), False),
    StructField("origin_airport_key", StringType(), True),
    StructField("destination_airport_key", StringType(), True),
    StructField("aircraft_type", StringType(), True),
])

DIM_DATE = StructType([
    StructField("date_key", IntegerType(), False),       # yyyyMMdd
    StructField("full_date", DateType(), False),
    StructField("day_of_month", IntegerType(), True),
    StructField("day_name", StringType(), True),
    StructField("day_of_week", IntegerType(), True),     # Sunday=1 (Postgres DOW+1)
    StructField("month", IntegerType(), True),
    StructField("month_name", StringType(), True),
    StructField("quarter", IntegerType(), True),
    StructField("year", IntegerType(), True),
])

FACT_SALES = StructType([
    StructField("transaction_id", StringType(), False),  # TA|CO + 6 digits
    StructField("date_key", IntegerType(), True),
    StructField("passenger_key", StringType(), True),
    StructField("flight_key", StringType(), True),
    StructField("ticket_price", MONEY, True),
    StructField("taxes", MONEY, True),
    StructField("baggage_fees", MONEY, True),
    StructField("total_amount", MONEY, True),
    StructField("sales_source", StringType(), True),     # travel_agency|corporate
    StructField("flight_status", StringType(), True),    # default 'scheduled'
    StructField("delay_minutes", IntegerType(), True),   # default 0
    StructField("is_eligible_insurance", BooleanType(), True),
    StructField("created_at", TimestampType(), True),
])

DIRTY_DATA = StructType([
    StructField("id", LongType(), True),
    StructField("source_table", StringType(), True),
    StructField("original_data", StringType(), True),    # JSON of the raw row
    StructField("error_reason", StringType(), True),
    StructField("created_at", TimestampType(), True),
])

FLIGHT_STATUS_UPDATES = StructType([
    StructField("id", LongType(), True),
    StructField("flight_key", StringType(), True),
    StructField("status", StringType(), True),
    StructField("delay_minutes", IntegerType(), True),
    StructField("update_timestamp", TimestampType(), True),
])

# Kafka message value schema (kafkaConfig.js:27-35 / server.js:191-196)
STATUS_MESSAGE = StructType([
    StructField("flight_key", StringType(), True),
    StructField("status", StringType(), True),
    StructField("delay_minutes", IntegerType(), True),
    StructField("update_timestamp", TimestampType(), True),
])

# Derived snowflake dimension the reference queries but never creates
# (smartFileProcessor.js:272-276 — the phantom dim_country_hierarchy).
DIM_COUNTRY_HIERARCHY = StructType([
    StructField("country_id", LongType(), False),
    StructField("country_name", StringType(), False),
])

TARGET_SCHEMAS: dict[str, StructType] = {
    "dim_passenger": DIM_PASSENGER,
    "dim_airport": DIM_AIRPORT,
    "dim_airline": DIM_AIRLINE,
    "dim_flight": DIM_FLIGHT,
    "dim_date": DIM_DATE,
    "fact_sales": FACT_SALES,
    "dirty_data": DIRTY_DATA,
    "flight_status_updates": FLIGHT_STATUS_UPDATES,
    "dim_country_hierarchy": DIM_COUNTRY_HIERARCHY,
}

PRIMARY_KEYS: dict[str, str] = {
    "dim_passenger": "passenger_key",
    "dim_airport": "airport_key",
    "dim_airline": "airline_key",
    "dim_flight": "flight_key",
    "dim_date": "date_key",
    "fact_sales": "transaction_id",
}

# ---------------------------------------------------------------------------
# Input-file signatures (smartFileProcessor.js:15-53).  Detection matches a
# header column-set against `required`; sales files additionally need one of
# `amount_hints`.  `headerless` marks the positional corporate format.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FileSignature:
    file_type: str
    target_table: str
    required: frozenset[str]
    optional: frozenset[str] = field(default_factory=frozenset)
    amount_hints: frozenset[str] = field(default_factory=frozenset)
    headerless: bool = False
    positional_columns: tuple[str, ...] = ()


FILE_SIGNATURES: tuple[FileSignature, ...] = (
    FileSignature(
        file_type="passengers", target_table="dim_passenger",
        required=frozenset({"PassengerKey", "FullName"}),
        optional=frozenset({"Email", "LoyaltyStatus"}),
    ),
    FileSignature(
        file_type="airports", target_table="dim_airport",
        required=frozenset({"AirportKey", "AirportName", "City", "Country"}),
    ),
    FileSignature(
        file_type="airlines", target_table="dim_airline",
        required=frozenset({"AirlineKey", "AirlineName"}),
        optional=frozenset({"Alliance"}),
    ),
    FileSignature(
        file_type="flights", target_table="dim_flight",
        required=frozenset({"FlightKey", "OriginAirportKey", "DestinationAirportKey"}),
        optional=frozenset({"AircraftType"}),
    ),
    FileSignature(
        file_type="travel_agency_sales", target_table="fact_sales",
        required=frozenset({"TransactionID", "TransactionDate", "PassengerID", "FlightID"}),
        amount_hints=frozenset({"TicketPrice", "TotalAmount"}),
        optional=frozenset({"TicketPrice", "Taxes", "BaggageFees", "TotalAmount"}),
    ),
    FileSignature(
        file_type="corporate_sales", target_table="fact_sales",
        required=frozenset(),  # headerless: bound positionally
        headerless=True,
        positional_columns=(
            "TransactionID", "DateKey", "PassengerKey", "FlightKey",
            "TicketPrice", "Taxes", "BaggageFees", "TotalAmount",
        ),
    ),
)

# Raw read schema helper: every input column is read as a string; typing
# happens in the cleaning expressions so that un-parseable values reach the
# quarantine path instead of being nulled by the reader.
def raw_string_schema(columns: list[str] | tuple[str, ...]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])
