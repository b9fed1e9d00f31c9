"""PySpark-native analytics engine with the query & data-processing
capabilities of YassineEng/SQL-ETL-data-warehouse-Inside-Airbnb.

The reference is a pandas + T-SQL star-schema ETL over Inside-Airbnb
dumps (see SURVEY.md). This package re-expresses every operator it
executes as idiomatic Spark DataFrame / Spark SQL plans:

- ``sources``    — scans & sinks (gzip CSV, pipe-delimited CSV, parquet,
                   quarantine split)           [SURVEY §2.1 S1–S12]
- ``functions``  — scalar function surface (clean/cast/date/bool/text)
                   [SURVEY §2.8 F1–F16, §2.10 U1–U5]
- ``operators``  — relational + pipeline operators (joins, aggs, windows,
                   merge-upsert, dedup, similarity) [SURVEY §2.2–§2.7]
- ``plans``      — the star-schema pipeline (dims, facts, views) and the
                   declared-query registry       [SURVEY §3, §7]
- ``streaming``  — Structured Streaming surface over the events table
                   (capability extension, SURVEY §2.9/§7.5)
"""

from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
    read_csv_raw,
    read_pipe_csv,
    read_table,
    split_quarantine,
    write_pipe_csv,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    MergeResult,
    merge_upsert,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    expectation_report,
    profile_csv_file,
    profile_table,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.skew import (
    salted_join,
    two_stage_agg,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
    asof_join,
    range_join,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.enrich import (
    add_review_lang,
    pretreat_hosts,
    pretreat_listings,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import (
    WarehouseTables,
    run_pipeline,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
    build_dim_dates,
    build_dim_hosts,
    build_dim_listings,
    build_fact_calendar,
    build_fact_reviews,
    clean_listings,
    register_views,
    type_listings,
)

__all__ = [
    "get_spark",
    "read_csv_raw", "read_pipe_csv", "read_table", "split_quarantine",
    "write_pipe_csv",
    "MergeResult", "merge_upsert",
    "build_dim_dates", "build_dim_hosts", "build_dim_listings",
    "build_fact_calendar", "build_fact_reviews", "clean_listings",
    "register_views", "type_listings",
    "salted_join", "two_stage_agg", "asof_join", "range_join",
    "add_review_lang", "pretreat_hosts", "pretreat_listings",
    "WarehouseTables", "run_pipeline",
    "expectation_report", "profile_csv_file", "profile_table",
]
__version__ = "0.1.0"
