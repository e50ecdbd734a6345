from airline_data_warehouse_spark.functions import cleaning

__all__ = ["cleaning"]
