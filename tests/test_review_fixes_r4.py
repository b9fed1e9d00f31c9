"""Regression pins for the round-4 self-review findings over the
older operator modules (graph/quality/temporal/merge/scd/events/
dedup/curation). Each test reproduces the exact failure scenario the
review named and asserts the fixed behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
    connected_components,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    snapshot_diff,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    expectation_report,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.scd import (
    scd2_apply,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
    asof_join,
    range_join,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    last_touch_attribution,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
    winnow_fingerprints,
)


def test_connected_components_string_ids(spark):
    # string node ids (URLs / md5 fingerprints) crashed the old
    # decimal-cast convergence probe under ANSI mode; a 5-node chain
    # must collapse to ONE component
    edges = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"),
         ("doc-c", "doc-d"), ("doc-d", "doc-e")],
        "src string, dst string")
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {k: "doc-a" for k in
                   ("doc-a", "doc-b", "doc-c", "doc-d", "doc-e")}


def test_unique_check_counts_null_keys(spark):
    # key=[1, NULL, NULL]: COUNT(DISTINCT key) skips NULLs -> 2 bogus
    # violations; the struct form scores the two NULL rows as one
    # duplicate pair (1 violation)
    df = spark.createDataFrame([(1,), (None,), (None,)], "key int")
    row = (expectation_report(df, {}, unique={"u_key": ["key"]})
           .collect()[0])
    assert (row.check_name, row.n_violations) == ("u_key", 1)
    # and a genuinely unique nullable column scores 0
    df2 = spark.createDataFrame([(1,), (None,)], "key int")
    assert (expectation_report(df2, {}, unique={"u": ["key"]})
            .collect()[0].n_violations == 0)


def test_expectation_report_no_checks_is_empty(spark):
    out = expectation_report(spark.range(3).toDF("x"), {})
    assert out.columns == ["check_name", "n_violations"]
    assert out.count() == 0


def test_range_join_subsecond_exact(spark):
    # right row 0.8s BEFORE the window start leaked in under
    # second-granularity unix_timestamp bounds
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0, 900000)
    r_out = dt.datetime(2024, 1, 1, 10, 0, 0, 100000)   # before lb
    r_in = dt.datetime(2024, 1, 1, 10, 0, 1, 0)         # inside
    left = spark.createDataFrame([(1, t0)], "k int, lt timestamp")
    right = spark.createDataFrame([(1, r_out), (1, r_in)],
                                  "k int, rt timestamp")
    got = range_join(left, right, on="k", left_time="lt",
                     right_time="rt", lower_seconds=0,
                     upper_seconds=5).select("rt").collect()
    assert [r.rt for r in got] == [r_in]


def test_asof_join_refuses_silent_clobber(spark):
    left = spark.createDataFrame([(1, 1, 10.0)],
                                 "k int, lt long, price double")
    right = spark.createDataFrame([(1, 0, 9.0)],
                                  "k int, rt long, price double")
    with pytest.raises(ValueError, match="overwrite"):
        asof_join(left, right, on="k", left_time="lt",
                  right_time="rt")
    # a suffix resolves it and keeps BOTH columns
    out = asof_join(left, right, on="k", left_time="lt",
                    right_time="rt", suffix="_r")
    row = out.collect()[0]
    assert (row.price, row.price_r) == (10.0, 9.0)


def test_snapshot_diff_null_key(spark):
    # old-only NULL-keyed row is a delete (was misread as insert);
    # identical NULL-keyed rows on both sides are unchanged
    old = spark.createDataFrame([(None, "v"), (1, "a")],
                                "key int, v string")
    new = spark.createDataFrame([(1, "a")], "key int, v string")
    got = {(r.key, r.change_type)
           for r in snapshot_diff(old, new, "key").collect()}
    assert got == {(None, "delete")}
    same = snapshot_diff(old, old, "key", include_unchanged=True)
    assert {r.change_type for r in same.collect()} == {"unchanged"}


def test_scd2_null_business_key_no_garbage(spark):
    cur = spark.createDataFrame(
        [(None, "x", dt.date(2024, 1, 1), None, True),
         (1, "a", dt.date(2024, 1, 1), None, True)],
        "k int, attr string, valid_from date, valid_to date, "
        "is_current boolean")
    # batch with no change for the NULL key: history must be IDENTICAL
    ch = spark.createDataFrame(
        [(1, "a", dt.date(2024, 2, 1))],
        "k int, attr string, change_ts date")
    out = scd2_apply(cur, ch, "k", ["attr"], "change_ts")
    rows = sorted(out.collect(), key=lambda r: (r.k is None, str(r.k)))
    assert out.count() == 2
    assert {(r.k, r.attr, r.is_current) for r in rows} \
        == {(None, "x", True), (1, "a", True)}
    # and a NULL-keyed CHANGE row closes/reopens exactly that row
    ch2 = spark.createDataFrame(
        [(None, "y", dt.date(2024, 3, 1))],
        "k int, attr string, change_ts date")
    out2 = scd2_apply(cur, ch2, "k", ["attr"], "change_ts")
    got = {(r.k, r.attr, r.is_current, r.valid_to)
           for r in out2.collect()}
    assert got == {
        (1, "a", True, None),
        (None, "x", False, dt.date(2024, 3, 1)),
        (None, "y", True, None)}


def test_attribution_null_event_type(spark):
    # a NULL event_type row crashed sorted() on the driver; it must
    # simply never be a channel
    ev = spark.createDataFrame(
        [(1, 1, None, 100), (1, 2, "click", 200),
         (1, 3, "purchase", 300)],
        "user_id int, event_id int, event_type string, ts long")
    got = {(r.channel, r.n_attributed)
           for r in last_touch_attribution(ev).collect()}
    assert got == {("click", 1)}


def test_winnow_full_text_option(spark):
    # two docs sharing a long passage ONLY beyond char 64: the default
    # prefix misses it (documented), prefix_len=None finds it
    shared = "x" * 30 + "the quick brown fox jumps over the lazy dog"
    a = ("A" * 100) + shared
    b = ("B" * 100) + shared
    df = spark.createDataFrame([("a", a), ("b", b)],
                               "doc_id string, text string")
    pref = winnow_fingerprints(df, "doc_id", "text")
    full = winnow_fingerprints(df, "doc_id", "text", prefix_len=None)

    def common(fps):
        rows = fps.groupBy("fp").agg(
            F.countDistinct("doc_id").alias("n")).collect()
        return sum(1 for r in rows if r.n == 2)

    assert common(pref) == 0
    assert common(full) > 0


def test_hashed_linear_score_uses_rolling_hash(spark):
    # the scorer and the fingerprint ladder must share ONE hash fold:
    # a 1-token document's bucket derives from rolling_hash(token)
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation \
        import HASH_BUCKETS, WEIGHT_MOD, WEIGHT_MULT, hashed_linear_score
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text \
        import rolling_hash

    df = spark.createDataFrame([("d1", "hello")],
                               "doc_id string, text string")
    score = hashed_linear_score(df, "doc_id", "text").collect()[0].score
    h = df.select(rolling_hash(F.lit("hello"), prefix_len=None)
                  .alias("h")).collect()[0].h
    expect = ((h % HASH_BUCKETS) * WEIGHT_MULT) % WEIGHT_MOD \
        - (WEIGHT_MOD // 2)
    assert score == expect
