"""SCD2 apply: hand-checked single batch, then a second batch over the
result — the invariants that make a type-2 dimension queryable must
hold after every apply:
  * exactly one open (is_current) row per live key
  * closed rows have valid_to set; open rows have it NULL
  * per key, intervals do not overlap and close dates are ordered
  * an apply with an all-unchanged batch is a no-op
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.scd import scd2_apply


def _base(spark):
    return spark.createDataFrame(
        [(1, "A", dt.date(2024, 1, 1), None, True),
         (2, "B", dt.date(2024, 1, 1), None, True),
         (3, "C", dt.date(2023, 1, 1), dt.date(2024, 1, 1), False),
         (3, "C2", dt.date(2024, 1, 1), None, True)],
        "k long, seg string, valid_from date, valid_to date, is_current boolean")


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, change_ts date")


def _apply(base, ch):
    return scd2_apply(base, ch, key="k", attrs=["seg"],
                      change_ts="change_ts")


def _check_invariants(hist):
    rows = [r.asDict() for r in hist.collect()]
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        opens = [r for r in rs if r["is_current"]]
        assert len(opens) == 1, (k, rs)
        assert opens[0]["valid_to"] is None
        closed = sorted((r for r in rs if not r["is_current"]),
                        key=lambda r: r["valid_from"])
        for r in closed:
            assert r["valid_to"] is not None and r["valid_to"] >= r["valid_from"]
        spans = closed + opens
        for a, b in zip(spans, spans[1:]):
            assert a["valid_to"] <= b["valid_from"], (k, spans)


def test_scd2_single_batch(spark):
    ch = _changes(spark, [
        (1, "A9", dt.date(2024, 6, 1)),   # changed -> close + open
        (2, "B", dt.date(2024, 6, 1)),    # unchanged -> no-op
        (9, "NEW", dt.date(2024, 6, 1)),  # new key -> open row
    ])
    out = _apply(_base(spark), ch)
    _check_invariants(out)
    got = {(r.k, r.seg, str(r.valid_from), str(r.valid_to), r.is_current)
           for r in out.collect()}
    assert got == {
        (1, "A", "2024-01-01", "2024-06-01", False),
        (1, "A9", "2024-06-01", "None", True),
        (2, "B", "2024-01-01", "None", True),
        (3, "C", "2023-01-01", "2024-01-01", False),
        (3, "C2", "2024-01-01", "None", True),
        (9, "NEW", "2024-06-01", "None", True),
    }


def test_scd2_second_batch_accumulates_history(spark):
    h1 = _apply(_base(spark), _changes(spark, [
        (1, "A9", dt.date(2024, 6, 1))]))
    h2 = _apply(h1, _changes(spark, [
        (1, "A10", dt.date(2024, 9, 1)),   # second change: 3 rows total
        (3, "C2", dt.date(2024, 9, 1)),    # unchanged
    ]))
    _check_invariants(h2)
    k1 = sorted(((str(r.valid_from), str(r.valid_to), r.seg, r.is_current)
                 for r in h2.filter(F.col("k") == 1).collect()))
    assert k1 == [("2024-01-01", "2024-06-01", "A", False),
                  ("2024-06-01", "2024-09-01", "A9", False),
                  ("2024-09-01", "None", "A10", True)]


def test_scd2_unchanged_batch_is_noop(spark):
    base = _base(spark)
    ch = _changes(spark, [(1, "A", dt.date(2024, 6, 1)),
                          (2, "B", dt.date(2024, 6, 1))])
    out = _apply(base, ch)
    assert (sorted(map(tuple, out.collect()))
            == sorted(map(tuple, base.collect())))
