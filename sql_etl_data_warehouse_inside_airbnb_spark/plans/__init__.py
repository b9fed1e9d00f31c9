"""Pipeline plans: cleaning, dims, facts, views (SURVEY §3, §7.1)."""

from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
    build_dim_dates,
    build_dim_hosts,
    build_dim_listings,
    build_fact_calendar,
    build_fact_reviews,
    clean_listings,
    register_views,
)

__all__ = [
    "clean_listings",
    "build_dim_listings",
    "build_dim_hosts",
    "build_dim_dates",
    "build_fact_calendar",
    "build_fact_reviews",
    "register_views",
]
