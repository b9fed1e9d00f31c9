"""Scalar function surface (SURVEY §2.8 F1–F16, §2.10 U1–U5).

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) unless the semantics genuinely require Python — then it is an
Arrow-batched pandas UDF (see ``udfs``). No row-at-a-time Python UDFs.
"""

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    clean_money,
    norm_bool,
    parse_host_location,
    sanitize_numstr,
    truncate_str,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
    date_parts,
    tsql_week_end,
    tsql_week_start,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.tsql import (
    run_tsql,
    tsql_to_spark_sql,
)

__all__ = [
    "clean_money",
    "norm_bool",
    "parse_host_location",
    "sanitize_numstr",
    "truncate_str",
    "date_parts",
    "tsql_week_start",
    "tsql_week_end",
    "tsql_to_spark_sql",
    "run_tsql",
]
