"""Bucketed co-located join: same keys + same bucket count -> no
shuffle exchange in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == li.count()  # FK: every lineitem matches
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
