"""Expectation-report semantics: NULL predicates are violations,
duplicates count per extra row, null fact keys are referentially
exempt, and all row checks share one aggregate plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    expectation_report,
)


def _report_dict(df):
    return {r.check_name: r.n_violations for r in df.collect()}


def test_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double")
    rep = _report_dict(expectation_report(
        df, row_checks={"v_positive": F.col("v") > 0}))
    # -5.0 fails, NULL comparison is NOT true -> also a violation
    assert rep == {"v_positive": 2}


def test_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,)], "k long")
    rep = _report_dict(expectation_report(
        df, row_checks={}, unique={"unique_k": ["k"]}))
    assert rep == {"unique_k": 2}  # three 1s -> two extras


def test_referential_ignores_null_fact_keys(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk int")
    dim = spark.createDataFrame([(10,), (20,)], "pk int")
    rep = _report_dict(expectation_report(
        fact, row_checks={},
        references={"fk_in_dim": (dim, "fk", "pk")}))
    assert rep == {"fk_in_dim": 1}  # 99 orphans; NULL fk is exempt


def test_row_checks_share_one_scan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    rep = expectation_report(df, row_checks={
        "id_pos": F.col("id") > 0,
        "s_nonempty": F.length("s") > 0,
    })
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # both checks ride one aggregate over one scan — no union of scans
    assert plan.count("Scan ExistingRDD") <= 1
    assert _report_dict(rep) == {"id_pos": 0, "s_nonempty": 0}


def test_profile_table_per_column_stats(spark):
    from pyspark.sql import functions as F
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
        profile_table,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["k", "v"])
    prof = {r.column: r for r in profile_table(df, approx=False).collect()}
    assert set(prof) == {"k", "v"}
    k, v = prof["k"], prof["v"]
    assert (k.n_rows, k.n_nulls, k.null_bp, k.n_distinct) == (4, 0, 0, 4)
    assert (k.min_value, k.max_value) == ("1", "4")
    assert (v.n_rows, v.n_nulls, v.null_bp, v.n_distinct) == (4, 1, 2500, 2)
    assert (v.min_value, v.max_value) == ("a", "b")
    assert k.dtype == "bigint" and v.dtype == "string"
    # approx mode: same shape, distinct within HLL tolerance
    ap = {r.column: r for r in profile_table(df).collect()}
    assert abs(ap["k"].n_distinct - 4) <= 1


def test_profile_csv_file_schema_on_read(spark, tmp_path):
    import csv
    import gzip

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
        profile_csv_file,
    )
    p = str(tmp_path / "France_Paris_listings_2025-06-01.csv.gz")
    with gzip.open(p, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "price"])
        w.writerow([1, "$10.00"])
        w.writerow([2, ""])
        w.writerow([3, "$30.00"])
    prof = {r.column: r for r in profile_csv_file(spark, p).collect()}
    # schema-on-read: everything is a string column, empty -> NULL
    assert prof["id"].dtype == "string"
    assert prof["price"].n_nulls == 1
    assert prof["id"].n_rows == 3
