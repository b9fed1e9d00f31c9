"""Event-analytics operators (operators/events.py): gap
sessionization, last-touch attribution, OHLC resample — semantics on
hand-built frames where every boundary case is visible, plus the
curation pair from the same batch (hashed linear scoring, mixture
sampling)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    hashed_linear_score,
    mixture_sample,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    last_touch_attribution,
    resample_ohlc,
    sessionize,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, " \
         "event_type string, value double"


def ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), u, t, v)
         for i, (ts, u, t, v) in enumerate(rows)], SCHEMA)


def test_sessionize_gap_boundary(spark):
    # the boundary rule is session_window's: delta == gap OPENS a new
    # session (merge iff strictly less); 29:59.999999 stays in-session
    df = ev(spark, [
        ("2024-01-01 10:00:00", 1, "view", 1.0),
        ("2024-01-01 10:29:59.999999", 1, "click", 1.0),   # gap < 30m
        ("2024-01-01 10:59:59.999999", 1, "view", 1.0),    # gap == 30m
        ("2024-01-01 09:00:00", 2, "view", 1.0),           # other user
    ])
    got = {(r.user_id, r.session_idx): (r.n_events, r.duration_us)
           for r in sessionize(df).collect()}
    assert got == {
        (1, 1): (2, 30 * 60 * 1_000_000 - 1),
        (1, 2): (1, 0),
        (2, 1): (1, 0),
    }


def test_sessionize_ties_break_on_event_id(spark):
    # identical timestamps: (ts, event_id) total order keeps the run
    # deterministic and in one session
    df = ev(spark, [
        ("2024-01-01 10:00:00", 1, "view", 1.0),
        ("2024-01-01 10:00:00", 1, "click", 1.0),
    ])
    [r] = sessionize(df).collect()
    assert (r.n_events, r.n_event_types, r.duration_us) == (2, 2, 0)


def test_last_touch_attribution(spark):
    codes = {"click": 1, "view": 2}
    df = ev(spark, [
        ("2024-01-01 10:00:00", 1, "view", 1.0),
        ("2024-01-01 10:05:00", 1, "click", 1.0),
        ("2024-01-01 10:10:00", 1, "purchase", 1.0),   # -> click
        ("2024-01-01 10:20:00", 1, "purchase", 1.0),   # still click
        ("2024-01-01 09:00:00", 2, "purchase", 1.0),   # no touch -> NULL
        ("2024-01-01 09:30:00", 2, "view", 1.0),
        ("2024-01-01 09:40:00", 2, "purchase", 1.0),   # -> view
    ])
    got = {r.channel: (r.n_attributed, r.n_users)
           for r in last_touch_attribution(df, "purchase", codes).collect()}
    assert got == {"click": (2, 1), "view": (1, 1), None: (1, 1)}


def test_last_touch_same_timestamp_orders_by_id(spark):
    # touch and purchase share a timestamp: the touch has the lower
    # event_id, so it precedes the purchase in the total order
    df = ev(spark, [
        ("2024-01-01 10:00:00", 1, "click", 1.0),
        ("2024-01-01 10:00:00", 1, "purchase", 1.0),
    ])
    got = {r.channel: r.n_attributed
           for r in last_touch_attribution(
               df, "purchase", {"click": 1}).collect()}
    assert got == {"click": 1}


def test_resample_ohlc(spark):
    df = ev(spark, [
        ("2024-01-01 10:00:00", 1, "view", 5.0),    # bucket A open
        ("2024-01-01 10:07:00", 1, "view", 9.0),    # bucket A high
        ("2024-01-01 10:14:59", 1, "view", 2.0),    # bucket A low+close
        ("2024-01-01 10:15:00", 1, "view", 7.0),    # bucket B (boundary)
    ])
    got = sorted(resample_ohlc(df, bucket_minutes=15).collect(),
                 key=lambda r: r.bucket_id)
    a, b = got
    assert (a.open, a.high, a.low, a.close, a.n_events, a.value_sum) \
        == (5.0, 9.0, 2.0, 2.0, 3, 16.0)
    assert (b.open, b.close, b.n_events) == (7.0, 7.0, 1)
    assert b.bucket_id == a.bucket_id + 1  # 10:15 starts the next bucket


def test_hashed_linear_score_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "the quick brown fox"),
         (4, "   ")],
        "doc_id bigint, text string")
    rows = {r.doc_id: r for r in
            hashed_linear_score(docs, "doc_id", "text").collect()}
    assert rows[1].score == rows[3].score          # same text, same score
    assert rows[1].n_tokens == 4
    assert rows[2].score == 0 and rows[2].n_tokens == 0
    assert rows[4].score == 0 and rows[4].n_tokens == 0
    assert rows[2].verdict == "keep"               # score 0 keeps
    for r in rows.values():
        assert r.verdict == ("keep" if r.score >= 0 else "drop")


def test_mixture_sample_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(f"s{i % 2}", i) for i in range(1000)], "source string, doc_id bigint")
    rates = spark.createDataFrame(
        [("s0", 10_000), ("s1", 0)], "source string, rate_bp int")
    kept = mixture_sample(docs, rates, "source", "doc_id")
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"s0": 500}                       # 10000bp keeps all, 0bp none
    # verdicts are partitioning-independent: repartitioned input
    # keeps the exact same rows
    ids = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in
            mixture_sample(docs.repartition(7), rates, "source",
                           "doc_id").collect()}
    assert ids == ids2
    # a mid rate keeps a fraction strictly between the extremes
    mid = mixture_sample(
        docs, spark.createDataFrame([("s0", 5_000), ("s1", 5_000)],
                                    "source string, rate_bp int"),
        "source", "doc_id").count()
    assert 0 < mid < 1000


def test_grid_distance_join_equals_brute_force(spark):
    """Grid blocking must find EXACTLY the brute-force pair set —
    including pairs straddling cell boundaries — and never duplicate
    a pair (each left point explodes to 9 cells, each right point
    occupies one)."""
    from itertools import product

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.spatial import (
        grid_distance_join,
    )

    lpts = [(i, (i * 13) % 50, (i * 29) % 50) for i in range(40)]
    rpts = [(j, (j * 17) % 50, (j * 23) % 50) for j in range(60)]
    R = 7
    want = {(li, rj, (lx - rx) ** 2 + (ly - ry) ** 2)
            for (li, lx, ly), (rj, rx, ry) in product(lpts, rpts)
            if (lx - rx) ** 2 + (ly - ry) ** 2 <= R * R}
    left = spark.createDataFrame(lpts, "id bigint, x bigint, y bigint")
    right = spark.createDataFrame(rpts, "id bigint, x bigint, y bigint")
    rows = grid_distance_join(left, right, R).collect()
    got = [(r.left_id, r.right_id, r.dist_sq) for r in rows]
    assert len(got) == len(set(got))          # no pair duplicated
    assert set(got) == want


def test_tfidf_top_terms_ranking(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame([
        (1, "apple apple banana cherry"),   # tf: apple 2
        (2, "banana banana banana apple"),  # tf: banana 3
        (3, "cherry date date"),            # date df=1 beats cherry df=2
    ], "doc_id bigint, text string")
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df)
           for r in tfidf_top_terms(docs, "doc_id", "text", k=2).collect()}
    assert got[(1, 1)] == ("apple", 2, 2)
    assert got[(2, 1)] == ("banana", 3, 2)
    # doc 3: date (tf 2) first, then cherry
    assert got[(3, 1)] == ("date", 2, 1)
    assert got[(3, 2)] == ("cherry", 1, 2)
    # doc 1 rank 2: banana vs cherry tie on tf=1 and df=2 -> term asc
    assert got[(1, 2)][0] == "banana"


def test_sessionize_equals_session_window(spark, sf_dir):
    """The batch gap-sessionizer and Spark's session_window must carve
    IDENTICAL sessions from the real event table — same per-user
    session count, same event counts, same [first-event, last-event]
    extents (session_window's end is last event + gap). This is the
    twin contract: a pipeline can switch between the batch operator
    and the streaming window without moving a single event."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
        session_agg,
    )

    ev = read_table(spark, sf_dir, "events")
    gap_us = 30 * 60 * 1_000_000
    batch = {}
    for r in sessionize(ev, gap_minutes=30).collect():
        batch.setdefault(r.user_id, []).append((r.n_events, r.duration_us))
    sw = {}
    for r in session_agg(ev, gap="30 minutes").collect():
        start = int(r.session_start.timestamp() * 1_000_000)
        end = int(r.session_end.timestamp() * 1_000_000)
        # session_window end = last event + gap -> duration = span - gap
        sw.setdefault(r.user_id, []).append((r.n_events, end - start - gap_us))
    assert {u: sorted(v) for u, v in batch.items()} \
        == {u: sorted(v) for u, v in sw.items()}


def test_grid_distance_join_negative_coords(spark):
    """Cells use floor division: negative coordinates must not lose
    pairs (toward-zero `div` would shift cell -0.5 to cell 0 and the
    boundary pair below would vanish)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.spatial import (
        grid_distance_join,
    )

    pts = [(0, -1, -1), (1, 1, 1), (2, -9, 0), (3, 0, 9), (4, -4, -4)]
    R = 5
    want = {(a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
            for a, xa, ya in pts for b, xb, yb in pts
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= R * R}
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    got = {(r.left_id, r.right_id, r.dist_sq)
           for r in grid_distance_join(df, df, R).collect()}
    assert got == want
    assert (0, 1, 8) in got  # the pair straddling the origin cells


def test_mixture_sample_negative_keys_respect_rates(spark):
    # Spark % keeps the dividend sign; the gate must still land in
    # [0, 10000) so rate 0 drops negative-keyed rows too
    docs = spark.createDataFrame(
        [("s0", -i) for i in range(1, 501)] + [("s1", -i) for i in range(1, 501)],
        "source string, doc_id bigint")
    rates = spark.createDataFrame(
        [("s0", 0), ("s1", 10_000)], "source string, rate_bp int")
    kept = mixture_sample(docs, rates, "source", "doc_id")
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"s1": 500}


def test_resample_pre_epoch_buckets_floor(spark):
    # pre-1970 timestamps must not collapse into a double-width
    # bucket 0 (toward-zero div) — floor division keeps every bucket
    # exactly bucket_minutes wide
    df = ev(spark, [
        ("1969-12-31 23:53:00", 1, "view", 1.0),   # epoch_us < 0
        ("1970-01-01 00:07:00", 1, "view", 2.0),   # epoch_us > 0
    ])
    got = sorted(resample_ohlc(df, bucket_minutes=15).collect(),
                 key=lambda r: r.bucket_id)
    assert len(got) == 2
    assert got[0].bucket_id == -1 and got[1].bucket_id == 0
    assert got[0].n_events == 1 and got[1].n_events == 1


def test_last_touch_rejects_sparse_codes(spark):
    df = ev(spark, [("2024-01-01 10:00:00", 1, "click", 1.0)])
    with pytest.raises(ValueError, match="dense"):
        last_touch_attribution(df, "purchase", {"click": 5})
    with pytest.raises(ValueError, match="dense"):
        last_touch_attribution(df, "purchase", {"click": 1, "view": 3})


def test_sessionize_without_type_column(spark):
    df = spark.createDataFrame(
        [(1, datetime.fromisoformat("2024-01-01 10:00:00"), 7)],
        "event_id bigint, ts timestamp, user_id bigint")
    [r] = sessionize(df, type_col=None).collect()
    assert (r.n_events, r.duration_us) == (1, 0)
    assert "n_event_types" not in r.asDict()


def test_grid_join_rejects_zero_radius(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.spatial import (
        grid_distance_join,
    )
    df = spark.createDataFrame([(1, 0, 0)], "id bigint, x bigint, y bigint")
    with pytest.raises(ValueError, match="radius"):
        grid_distance_join(df, df, 0)


def test_mixture_sample_missing_group_contract(spark):
    import pytest

    docs = spark.createDataFrame(
        [(i, "web" if i % 2 else "books") for i in range(20)],
        ["doc_id", "source"])
    rates = spark.createDataFrame([("web", 10000)],
                                  ["source", "rate_bp"])
    # default: a group with no declared rate is a config error
    with pytest.raises(ValueError, match="books"):
        mixture_sample(docs, rates, "source", "doc_id")
    # explicit opt-ins
    dropped = mixture_sample(docs, rates, "source", "doc_id",
                             on_missing="drop").collect()
    assert {r.source for r in dropped} == {"web"} and len(dropped) == 10
    kept = mixture_sample(docs, rates, "source", "doc_id",
                          on_missing="keep").collect()
    assert len(kept) == 20   # unrated group passes through unsampled


def test_mixture_sample_null_rate_keeps_nothing(spark):
    """A NULL rate VALUE is not a missing group: under error/drop it
    must keep ZERO rows of that group (gate < NULL is never true),
    never silently behave as rate 10000."""
    docs = spark.createDataFrame(
        [(i, "web") for i in range(10)], ["doc_id", "source"])
    rates = spark.createDataFrame([("web", None)],
                                  "source string, rate_bp int")
    kept = mixture_sample(docs, rates, "source", "doc_id").collect()
    assert kept == []
