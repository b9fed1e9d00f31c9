"""Per-key admission quota as custom streaming state — ingest-time
rate limiting ("accept at most N events per key, reject the rest"),
the front-door guard of every ingestion pipeline: a runaway producer
or a hot key must not flood the warehouse, and the decision has to be
made ONLINE, per event, against a running count.

``quota_admit_stream`` keeps one state row per event_type holding the
(admitted, rejected) running totals and emits the updated pair each
micro-batch. The emitted TOTALS are order-invariant (each batch
admits min(batch size, remaining quota)), so stream == batch holds
for the counts whenever micro-batch BOUNDARIES respect event-time
order (the file source replaying time-partitioned drops, the common
backfill shape) — no within-batch sort is needed or performed. The
declared (ts, event_id) order is the batch twin's DEFINITION of which
individual events are admitted; a per-event variant of this operator
would sort each group batch by it before slicing. Out-of-order
arrival degrades gracefully: totals still reconcile
(admitted + rejected = seen, admitted <= cap); only WHICH individual
events were admitted can differ, which is true of any online limiter.

Batch equivalence: ``quota_admit_batch`` — row_number over
(key ORDER BY ts, event_id) <= cap, the ext_domain_quota_sample rank
idiom applied to events. Asserted side-by-side across micro-batches in
tests/test_r9.py, including a key crossing its cap MID-batch and a
second batch arriving entirely over-cap.

Scale: state is two longs per key — O(keys), never O(events); the
sort is per-group per-micro-batch. At 100 TB this is the shape of
quota enforcement in any keyed ingest tier.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_admitted", LongType()),
    StructField("n_rejected", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("admitted", LongType()),
    StructField("rejected", LongType()),
])


def _make_update(cap: int):
    def _update(key: tuple[Any, ...],
                pdfs: Iterator["pd.DataFrame"],
                state: GroupState) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (event_type,) = key
        admitted, rejected = state.get if state.exists else (0, 0)
        # totals are ORDER-INVARIANT (take = min(n, remaining)), so
        # no within-batch sort is needed; the declared (ts, event_id)
        # order only matters for WHICH events are admitted, which
        # this operator does not emit (a per-event variant would sort
        # here before slicing) — post-round review finding
        n = sum(len(pdf) for pdf in pdfs)
        take = min(n, max(0, cap - admitted))
        admitted += take
        rejected += n - take
        state.update((int(admitted), int(rejected)))
        yield pd.DataFrame({"event_type": [event_type],
                            "n_admitted": [int(admitted)],
                            "n_rejected": [int(rejected)]})
    return _update


def quota_admit_stream(events: DataFrame, cap: int = 1000) -> DataFrame:
    """Running (admitted, rejected) totals per event_type under an
    admission cap; one updated row per key per micro-batch. No
    timeout: a quota never expires within the stream's lifetime
    (a windowed quota would add event-time timeout — same shape)."""
    return (events
            .select("event_type", "ts", "event_id")
            .groupBy("event_type")
            .applyInPandasWithState(
                _make_update(cap),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def quota_admit_batch(events: DataFrame, cap: int = 1000) -> DataFrame:
    """The batch-mode meaning of the stream's final state: rank by
    the declared admission order, admit the first ``cap`` per key."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return (events
            .withColumn("__rn", rn)
            .groupBy("event_type")
            .agg(F.sum(F.when(F.col("__rn") <= cap, 1).otherwise(0))
                 .cast("long").alias("n_admitted"),
                 F.sum(F.when(F.col("__rn") > cap, 1).otherwise(0))
                 .cast("long").alias("n_rejected")))
