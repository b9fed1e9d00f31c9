"""Salted-join / two-stage-agg equivalence under constructed skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.skew import (
    salted_join,
    two_stage_agg,
)


@pytest.fixture()
def skewed(spark):
    # 90% of rows share key 1 — the hot-key shape salting exists for
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"))
    small = spark.createDataFrame(
        [(1, "hot"), (950, "cold"), (999, "cold")], ["k", "tag"])
    return big, small


def _key(rows):
    return sorted((r.k, r.v, r.tag) for r in rows)


def test_salted_inner_equals_plain(skewed):
    big, small = skewed
    plain = big.join(small, "k", "inner")
    salted = salted_join(big, small, "k", "inner", n_salts=4)
    assert _key(salted.collect()) == _key(plain.collect())
    assert salted.count() == 902  # 900 hot + 2 cold


def test_salted_left_keeps_unmatched(skewed):
    big, small = skewed
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", "left", n_salts=4)
    assert sorted((r.k, r.v, r.tag) for r in salted.collect()) \
        == sorted((r.k, r.v, r.tag) for r in plain.collect())


def test_salted_join_rejects_non_row_preserving(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", "full")


def test_two_stage_agg_equals_direct(skewed):
    big, _ = skewed
    direct = {(r.k): (r.n_rows, r.sum_v) for r in
              big.groupBy("k").agg(F.count("*").alias("n_rows"),
                                   F.sum("v").alias("sum_v")).collect()}
    staged = {(r.k): (r.n_rows, r.sum_v) for r in
              two_stage_agg(big, ["k"], ["v"], n_salts=4).collect()}
    assert staged == direct
