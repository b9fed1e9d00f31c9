"""Temporal joins (operators/temporal.py): semantics vs a naive oracle
on constructed data, plan-shape guards, and the HLL error bound for
the approximate-distinct scale path."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
    asof_join,
    range_join,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def quotes_trades(spark):
    # classic as-of shape: trades pick up the latest quote at-or-before
    trades = spark.createDataFrame(
        [("A", ts(0), 1), ("A", ts(5), 2), ("A", ts(9), 3),
         ("B", ts(4), 4), ("C", ts(1), 5)],
        ["sym", "t_time", "trade_id"])
    quotes = spark.createDataFrame(
        [("A", ts(0), 100.0), ("A", ts(5), 105.0), ("A", ts(7), 107.0),
         ("B", ts(3), 50.0), ("B", ts(6), 51.0)],
        ["sym", "q_time", "px"])
    return trades, quotes


def test_asof_backward_inclusive(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="sym",
                    left_time="t_time", right_time="q_time",
                    value_cols=["px"])
    got = {r.trade_id: r.px for r in out.collect()}
    # trade 2 at 10:05 sees the 10:05 quote (inclusive); C has none
    assert got == {1: 100.0, 2: 105.0, 3: 107.0, 4: 50.0, 5: None}


def test_asof_exclusive_skips_same_instant(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="sym",
                    left_time="t_time", right_time="q_time",
                    value_cols=["px"], allow_exact_matches=False)
    got = {r.trade_id: r.px for r in out.collect()}
    # trade 1 at 10:00 no longer sees the 10:00 quote; trade 2 falls
    # back to the 10:00 quote
    assert got == {1: None, 2: 100.0, 3: 107.0, 4: 50.0, 5: None}


def test_asof_keeps_left_columns_and_count(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="sym",
                    left_time="t_time", right_time="q_time")
    assert out.count() == trades.count()
    assert set(trades.columns).issubset(set(out.columns))


def test_asof_multi_value_cols_come_from_same_row(spark):
    left = spark.createDataFrame([("A", ts(8), 1)], ["k", "lt", "lid"])
    right = spark.createDataFrame(
        [("A", ts(2), 10, "x"), ("A", ts(6), 20, "y")],
        ["k", "rt", "v1", "v2"])
    row = asof_join(left, right, on="k", left_time="lt",
                    right_time="rt").collect()[0]
    assert (row.v1, row.v2) == (20, "y")


def test_range_join_matches_naive_cross_filter(spark, sf_dir):
    ev = (read_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "ts").limit(500).cache())
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select(F.col("event_id").alias("r_id"), "user_id",
                      F.col("ts").alias("r_ts"))
    got = (range_join(left, right, on="user_id",
                      left_time="ts", right_time="r_ts",
                      lower_seconds=-900, upper_seconds=-1)
           .select("event_id", "r_id"))
    lt = F.unix_timestamp("ts")
    rt = F.unix_timestamp("r_ts")
    naive = (left.join(right, "user_id")
             .filter((rt >= lt - 900) & (rt <= lt - 1))
             .select("event_id", "r_id"))
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, naive.collect())))


def test_range_join_bucket_size_invariant(spark):
    left = spark.createDataFrame(
        [("A", ts(0, 30), 1), ("A", ts(2), 2)], ["k", "lt", "lid"])
    right = spark.createDataFrame(
        [("A", ts(0), 10), ("A", ts(1), 11), ("A", ts(3), 12)],
        ["k", "rt", "rid"])
    expect = None
    for bucket in (7, 60, 3600):
        got = sorted(
            (r.lid, r.rid)
            for r in range_join(left, right, "k", "lt", "rt",
                                lower_seconds=-60, upper_seconds=60,
                                bucket_seconds=bucket).collect())
        if expect is None:
            expect = got
        assert got == expect
    assert expect == [(1, 10), (1, 11), (2, 11), (2, 12)]


def test_no_nested_loop_in_temporal_plans(spark, sf_dir):
    # the whole point of the rewrites: planner must never fall back to
    # BroadcastNestedLoopJoin / CartesianProduct for the time window
    ev = read_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", F.col("ts").alias("r_ts"))
    rj = range_join(left, right, on="user_id",
                    left_time="ts", right_time="r_ts",
                    lower_seconds=-1800, upper_seconds=-1)
    aj = asof_join(left, ev.select("user_id", "ts",
                                   F.col("event_id").alias("rid")),
                   on="user_id", left_time="ts", right_time="ts",
                   value_cols=["rid"])
    for df in (rj, aj):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_approx_distinct_error_bound(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    rows = (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.01)
                  .alias("approx"),
                 F.countDistinct("user_id").alias("exact"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2.0)


def test_range_join_exact_buckets_at_extreme_magnitude(spark):
    """Bucket ids must be integer-exact even where |unix_micros|
    approaches 2^53 (year ~2255): double division's half-ulp rounding
    there can assign a row to the neighboring bucket and silently drop
    a matching pair — the residual filter only removes false
    positives, it cannot recover one. The pair below sits exactly at a
    bucket boundary minus one microsecond."""
    bucket_s = 3600
    bucket_us = bucket_s * 1_000_000
    # a boundary multiple just above 2^53, minus 1 us → last slot of
    # bucket k-1; double-rounded division misplaces it into bucket k
    k = (2**53) // bucket_us + 7
    right_us = k * bucket_us - 1
    left_us = right_us - 30 * 1_000_000       # 30 s earlier, same window
    left = spark.range(1).select(
        F.lit(1).alias("k"),
        F.timestamp_micros(F.lit(left_us)).alias("lts"))
    right = spark.range(1).select(
        F.lit(1).alias("k"),
        F.timestamp_micros(F.lit(right_us)).alias("rts"))
    out = range_join(left, right, on="k", left_time="lts",
                     right_time="rts", lower_seconds=0,
                     upper_seconds=60, bucket_seconds=bucket_s)
    assert out.count() == 1


def test_asof_tolerance_nulls_stale_matches(spark):
    from datetime import datetime

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
        asof_join,
    )
    left = spark.createDataFrame(
        [(1, 10, datetime(2024, 1, 1, 12, 0, 0)),
         (1, 11, datetime(2024, 1, 1, 12, 45, 0)),
         (2, 12, datetime(2024, 1, 1, 12, 0, 0))],
        "k bigint, lid bigint, lts timestamp")
    right = spark.createDataFrame(
        [(1, 100, datetime(2024, 1, 1, 11, 50, 0)),   # 10 min before lid=10
         (2, 200, datetime(2024, 1, 1, 10, 0, 0))],   # 2 h before lid=12
        "k bigint, rid bigint, rts timestamp")
    out = {r["lid"]: r["rid"] for r in
           asof_join(left, right, on="k", left_time="lts",
                     right_time="rts", value_cols=["rid"],
                     tolerance_us=30 * 60 * 1_000_000).collect()}
    assert out[10] == 100        # 10 min old: within tolerance
    assert out[11] is None       # 55 min old: carried but nulled
    assert out[12] is None       # 2 h old: nulled
    # without tolerance the same stale matches ARE kept
    out2 = {r["lid"]: r["rid"] for r in
            asof_join(left, right, on="k", left_time="lts",
                      right_time="rts", value_cols=["rid"]).collect()}
    assert out2 == {10: 100, 11: 100, 12: 200}
    # exact boundary: staleness == tolerance is KEPT (<=)
    out3 = {r["lid"]: r["rid"] for r in
            asof_join(left, right, on="k", left_time="lts",
                      right_time="rts", value_cols=["rid"],
                      tolerance_us=10 * 60 * 1_000_000).collect()}
    assert out3[10] == 100

    import pytest
    with pytest.raises(ValueError, match="tolerance_us"):
        asof_join(left, right, on="k", left_time="lts",
                  right_time="rts", value_cols=["rid"], tolerance_us=-1)
