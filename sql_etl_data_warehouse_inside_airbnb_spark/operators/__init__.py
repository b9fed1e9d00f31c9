"""Relational & pipeline operators (SURVEY §2.2–§2.7, §7.5)."""

from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import merge_upsert

__all__ = ["merge_upsert"]
