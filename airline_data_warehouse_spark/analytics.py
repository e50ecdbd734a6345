"""The denormalized analytics view + canonical queries over it.

``build_airline_analytics`` is the Spark twin of ``v_airline_analytics``
(for supabase/denorm view:2-41): fact → 5 dims with a role-playing
airport dimension (origin/dest aliases) and a LEFT join to the airline
dimension on the computed carrier prefix LEFT(flight_key, 2).

Physical posture: every dimension is broadcast (all are tiny next to the
fact); the fact never shuffles for this view — at 100 TB the plan is a
single scan + 6 broadcast hash joins inside one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airline_data_warehouse_spark.functions.cleaning import (
    carrier_of_flight,
    insurance_eligibility_status,
)


def build_airline_analytics(fact_sales: DataFrame, dim_date: DataFrame,
                            dim_passenger: DataFrame, dim_flight: DataFrame,
                            dim_airport: DataFrame, dim_airline: DataFrame) -> DataFrame:
    fs = fact_sales.alias("fs")
    dd = F.broadcast(dim_date.alias("dd"))
    dp = F.broadcast(dim_passenger.alias("dp"))
    df_ = F.broadcast(dim_flight.alias("df"))
    origin = F.broadcast(dim_airport.alias("origin"))
    dest = F.broadcast(dim_airport.alias("dest"))
    al = F.broadcast(dim_airline.alias("al"))
    return (
        fs.join(dd, F.col("fs.date_key") == F.col("dd.date_key"))
          .join(dp, F.col("fs.passenger_key") == F.col("dp.passenger_key"))
          .join(df_, F.col("fs.flight_key") == F.col("df.flight_key"))
          .join(origin, F.col("df.origin_airport_key") == F.col("origin.airport_key"))
          .join(dest, F.col("df.destination_airport_key") == F.col("dest.airport_key"))
          .join(al, carrier_of_flight(F.col("df.flight_key")) == F.col("al.airline_key"),
                "left")
          .select(
              F.col("fs.transaction_id").alias("transaction_id"),
              F.col("fs.date_key").alias("date_key"),
              F.col("dd.full_date").alias("full_date"),
              F.col("dd.year").alias("year"),
              F.col("dd.quarter").alias("quarter"),
              F.col("dd.month_name").alias("month_name"),
              F.col("dp.passenger_key").alias("passenger_key"),
              F.col("dp.full_name").alias("full_name"),
              F.col("dp.loyalty_status").alias("loyalty_status"),
              F.col("df.flight_key").alias("flight_key"),
              F.col("df.aircraft_type").alias("aircraft_type"),
              F.col("origin.airport_key").alias("origin_airport"),
              F.col("origin.city").alias("origin_city"),
              F.col("origin.country").alias("origin_country"),
              F.col("dest.airport_key").alias("destination_airport"),
              F.col("dest.city").alias("destination_city"),
              F.col("dest.country").alias("destination_country"),
              F.col("al.airline_name").alias("airline_name"),
              F.col("al.alliance").alias("alliance"),
              F.col("fs.ticket_price").alias("ticket_price"),
              F.col("fs.taxes").alias("taxes"),
              F.col("fs.baggage_fees").alias("baggage_fees"),
              F.col("fs.total_amount").alias("total_amount"),
              F.col("fs.sales_source").alias("sales_source"),
              F.col("fs.flight_status").alias("flight_status"),
              F.col("fs.delay_minutes").alias("delay_minutes"),
              F.col("fs.is_eligible_insurance").alias("is_eligible_insurance"),
              insurance_eligibility_status(F.col("fs.delay_minutes"))
              .alias("insurance_eligibility_status"),
          )
    )


def revenue_by_dims(view: DataFrame) -> DataFrame:
    """The flagship rollup over the view: revenue by year/quarter ×
    origin country × alliance (SURVEY §7 step 3)."""
    return (view.groupBy("year", "quarter", "origin_country", "alliance")
                .agg(F.sum("total_amount").alias("total_revenue"),
                     F.count("*").alias("n_transactions"),
                     F.avg("delay_minutes").alias("avg_delay_minutes")))
