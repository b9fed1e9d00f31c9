"""Catalog statistics + cost-based optimization: analyze_tables must
make real row counts visible to the optimizer, and with CBO on those
stats must drive the plan (filtered-cardinality estimates / join
ordering) instead of raw file bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
    analyze_tables,
    read_table,
)


def _stats(df):
    return df._jdf.queryExecution().optimizedPlan().stats()


def test_analyze_populates_row_counts_and_cbo_uses_them(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    orders.write.mode("overwrite").saveAsTable("cbo_orders")
    nation.write.mode("overwrite").saveAsTable("cbo_nation")
    try:
        analyze_tables(
            spark, ["cbo_orders", "cbo_nation"],
            columns={"cbo_orders": ["o_orderkey", "o_orderstatus"],
                     "cbo_nation": ["n_nationkey"]})
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            # table stats: the catalog's rowCount equals the actual
            # count (rowCount only surfaces in plan stats under CBO —
            # size-only estimation never defines it)
            t = spark.table("cbo_orders")
            rc = _stats(t).rowCount()
            assert rc.isDefined() and rc.get() == orders.count()
            # with CBO + column stats, a selective filter's estimated
            # row count shrinks below the table's (selectivity from
            # the o_orderstatus NDV) — file-size-only estimation
            # cannot produce a defined rowCount at all
            filtered = spark.table("cbo_orders").filter(
                F.col("o_orderstatus") == "F")
            frc = _stats(filtered).rowCount()
            assert frc.isDefined(), "CBO lost the stats through filter"
            assert 0 < frc.get() < rc.get(), (frc.get(), rc.get())

            # and the estimate propagates through a join: the joined
            # plan's sizeInBytes must reflect stats, not the 8 EiB
            # "unknown" default Spark uses without them
            joined = (spark.table("cbo_orders")
                      .join(spark.table("cbo_nation"),
                            F.col("o_orderkey") % 25
                            == F.col("n_nationkey")))
            assert (_stats(joined).sizeInBytes()
                    < 2 ** 60), "join stats degenerated to unknown"
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_orders")
        spark.sql("DROP TABLE IF EXISTS cbo_nation")
