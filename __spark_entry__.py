"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship weekly-rollup query (the reference's
fact_calendar shape, SURVEY §2.4 A7) at sf0.001. ``queries`` /
``oracle_sql`` expose the declared-query registry
(sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry) built from
SURVEY.md §2's operator inventory; each Spark builder is paired with the
equivalent DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
    REGISTRY,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["a7_weekly_rollup"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without an oracle
    (non-SQL-expressible ops) are omitted → driver does rows-only."""
    return {name: q.oracle for name, q in REGISTRY.items()
            if q.oracle is not None}
