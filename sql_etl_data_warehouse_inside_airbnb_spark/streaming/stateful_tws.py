"""Arbitrary stateful processing on the transformWithState API.

``tws_user_running_totals`` is the ``transformWithStateInPandas``
twin of ``stateful.user_running_totals`` (applyInPandasWithState):
same semantics — per-user running (count, sum, last_seen) with an
event-time inactivity timeout that emits a final ``closed=true`` row —
expressed on Spark 4's successor API. What the new API buys at scale:

* typed, NAMED state slots (``getValueState``/``getListState``/
  ``getMapState``) instead of one opaque tuple — state schema evolves
  per slot;
* first-class timers (``registerTimer``) decoupled from state rows —
  the old API could only piggyback one timeout per key;
* RocksDB state store is required — state lives off-heap and spills to
  disk, so per-key working set, not executor heap, bounds the key
  count (the 100 TB posture: state scales with the ACTIVE key set,
  partitioned by the grouping key across executors).

Stream==batch is pinned in tests/test_streaming_tws.py: the same
processor run over a one-file stream equals the plain
``groupBy(user).agg`` batch twin (``stateful.user_totals_batch``).

ENVIRONMENT GATE: transformWithState's Python<->JVM state protocol
requires the ``protobuf`` package (the runner crashes with
``ImportError: google.protobuf`` otherwise). This container does not
ship it, so the tests skip themselves when ``google.protobuf`` is
absent; ``stateful.user_running_totals`` (applyInPandasWithState, no
protobuf dependency) is the executable path here and stays the
operator used by the registry's ``stream_stateful_totals``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

STATE_DDL = "n_events BIGINT, sum_value DOUBLE, last_seen_us BIGINT"
IDLE_TIMEOUT_MS = 3_600_000  # close a user 1 h (event time) after last event

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserTotalsProcessor(StatefulProcessor):
    """Running (n_events, sum_value, last_seen) per user key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._totals = handle.getValueState("totals", STATE_DDL)

    def _row(self, user_id, n, s, last_us, closed) -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame({
            "user_id": [user_id], "n_events": [n], "sum_value": [s],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
            "closed": [closed]})

    def handleInputRows(self, key: Any, rows, timerValues
                        ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        n, s, last_us = (self._totals.get() if self._totals.exists()
                         else (0, 0.0, 0))
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
            # dropna: NaT.value is the int64 MIN sentinel
            valid_ts = pdf["ts"].dropna()
            if len(valid_ts):
                last_us = max(last_us, valid_ts.max().value // 1_000)
        self._totals.update((n, s, last_us))
        # floor at the current watermark so an all-NULL-ts or >idle-
        # late key can't register an already-expired timer
        base_ms = max(last_us // 1_000,
                      timerValues.getCurrentWatermarkInMs())
        self._handle.registerTimer(base_ms + IDLE_TIMEOUT_MS)
        yield self._row(user_id, n, s, last_us, False)

    def handleExpiredTimer(self, key: Any, timerValues, expiredTimerInfo
                           ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if not self._totals.exists():
            return
        n, s, last_us = self._totals.get()
        # a later event may have re-armed a newer timer; only the
        # newest expiry closes the user
        if expiredTimerInfo.getExpiryTimeInMs() < last_us // 1_000 + IDLE_TIMEOUT_MS:
            return
        self._totals.clear()
        yield self._row(user_id, n, s, last_us, True)

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def tws_user_running_totals(events: DataFrame,
                            ts_col: str = "ts") -> DataFrame:
    """transformWithStateInPandas running totals (stream or batch).

    In streaming mode the input must be watermarked (event-time timers
    fire off the watermark). In batch mode Spark runs the processor
    once over each key group and no timers fire — one open row per key,
    which is exactly the batch twin's ``groupBy().agg`` result.
    """
    return (events.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="EventTime"))
