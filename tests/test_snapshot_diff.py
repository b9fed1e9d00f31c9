"""snapshot_diff semantics: change classification, null-safe column
comparison (NULL->NULL is unchanged, NULL->value is update), and the
include_unchanged toggle."""

from __future__ import annotations

from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    snapshot_diff,
)


def _diff(spark, old_rows, new_rows, **kw):
    schema = "k long, v string, w double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    out = snapshot_diff(old, new, "k", **kw).collect()
    return {r.k: r.change_type for r in out}


def test_classifies_all_change_types(spark):
    got = _diff(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)])
    assert got == {2: "update", 3: "delete", 4: "insert"}


def test_null_comparisons_are_null_safe(spark):
    got = _diff(
        spark,
        [(1, None, 1.0), (2, "x", None)],
        [(1, None, 1.0), (2, "x", 5.0)])
    # NULL == NULL -> unchanged (filtered); NULL -> 5.0 -> update
    assert got == {2: "update"}


def test_include_unchanged(spark):
    got = _diff(
        spark,
        [(1, "a", 1.0)], [(1, "a", 1.0)],
        include_unchanged=True)
    assert got == {1: "unchanged"}


def test_compare_cols_subset(spark):
    schema = "k long, v string, w double"
    old = spark.createDataFrame([(1, "a", 1.0)], schema)
    new = spark.createDataFrame([(1, "a", 9.0)], schema)
    out = snapshot_diff(old, new, "k", compare_cols=["v"]).collect()
    assert out == []  # w differs but is not compared
