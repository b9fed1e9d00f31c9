"""Custom stateful streaming: arbitrary per-key state with
``applyInPandasWithState`` (the piece built-in windows can't express —
running aggregates that must survive across micro-batches and expire on
an inactivity timeout).

``user_running_totals`` keeps one small state row per user
(n_events, sum_value, last_seen) and emits the updated totals each
micro-batch. State is partitioned by the grouping key, so a 1000-executor
cluster holds 1/1000th of the keys per task; the watermark-driven
timeout (``GroupStateTimeout.EventTimeTimeout``) closes idle users and
emits a final ``closed=true`` row, bounding state exactly like a
session window does.

Batch equivalence: on a static frame the same semantics are a plain
``groupBy(user).agg(count, sum, max(ts))`` — tested side-by-side in
``tests/test_streaming_stateful.py``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("last_seen", TimestampType()),
    StructField("closed", BooleanType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("last_seen_us", LongType()),
])


def _update_user(key: tuple[Any, ...],
                 pdfs: Iterator["pd.DataFrame"],
                 state: GroupState) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, s, last_us = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id], "n_events": [n], "sum_value": [s],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
            "closed": [True]})
        return

    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        # dropna: an all-NULL-ts batch would yield NaT, whose .value
        # is the int64 MIN sentinel — not a timestamp
        valid_ts = pdf["ts"].dropna()
        if len(valid_ts):
            last_us = max(last_us, valid_ts.max().value // 1_000)
    state.update((n, s, last_us))
    # idle users expire one hour past their last event — floored at
    # the CURRENT watermark: a new key whose events are all NULL-ts
    # (last_us=0) or >1h late would otherwise register an expired
    # timeout, which Spark rejects and the query dies
    base_ms = max(last_us // 1_000, state.getCurrentWatermarkMs())
    state.setTimeoutTimestamp(base_ms + 3_600_000)
    yield pd.DataFrame({
        "user_id": [user_id], "n_events": [n], "sum_value": [s],
        "last_seen": [pd.Timestamp(last_us, unit="us")],
        "closed": [False]})


def user_running_totals(events: DataFrame,
                        ts_col: str = "ts") -> DataFrame:
    """Per-user running (count, sum, last_seen) with event-time timeout.

    Works on a watermarked stream; each micro-batch emits the updated
    totals for every user seen in that batch, plus a final closed=true
    row when a user times out.
    """
    return (events
            .select("user_id", F.col(ts_col).alias("ts"), "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def user_totals_batch(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The batch-mode meaning of ``user_running_totals``' final state."""
    return (events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 # exact-decimal sum, the registry convention: raw
                 # double sums are partition-order noisy at rounding
                 # boundaries (see plans/registry.py:exact_sum)
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 4).alias("sum_value"),
                 F.max(ts_col).alias("last_seen")))
