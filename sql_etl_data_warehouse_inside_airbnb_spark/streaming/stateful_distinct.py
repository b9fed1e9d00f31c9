"""Running DISTINCT cardinality as custom streaming state — the
real-time "unique users so far" metric (w11_running_distinct's batch
rewrite works on a static, totally-ordered table; a stream has neither,
so the first-occurrence flag becomes per-key STATE).

``distinct_users_stream`` keeps one state row per event_type holding
the set of user_ids seen so far (a sorted array — the state schema is
columnar, not a Python object) and emits the updated cardinality each
micro-batch; counts are exactly-once across batches because the set,
not the count, is the state (re-seeing a user adds nothing).

Scale: state is partitioned by the grouping key, and the per-key set
grows with TRUE cardinality — exact sets are the right call for keys
whose audiences fit memory (here: event types × user ids). For
open-ended cardinality at 100 TB swap the array for a fixed-size HLL
sketch register (the a33_hll_union components show the merge algebra);
the operator shape — applyInPandasWithState, update-and-emit — is
unchanged, which is exactly why the state schema is explicit.

Batch equivalence: ``distinct_users_batch`` (a plain
countDistinct groupBy) — asserted side-by-side ACROSS micro-batches in
tests/test_streaming_stateful2.py, including a user re-appearing in a
later batch (the case the state exists for).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("distinct_users", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("users", ArrayType(LongType())),
])


def _update_distinct(key: tuple[Any, ...],
                     pdfs: Iterator["pd.DataFrame"],
                     state: GroupState) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (event_type,) = key
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        seen.update(int(u) for u in pdf["user_id"].dropna())
    # sorted list: state round-trips through Arrow, and a
    # deterministic layout keeps checkpoints byte-stable
    state.update((sorted(seen),))
    yield pd.DataFrame({"event_type": [event_type],
                        "distinct_users": [len(seen)]})


def distinct_users_stream(events: DataFrame) -> DataFrame:
    """Per-event-type running unique-user count; one updated row per
    key per micro-batch. No timeout: a cardinality never expires
    (unlike the running-totals session state next door)."""
    return (events
            .select("event_type", "user_id")
            .groupBy("event_type")
            .applyInPandasWithState(
                _update_distinct,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def distinct_users_batch(events: DataFrame) -> DataFrame:
    """The batch-mode meaning of the stream's final state."""
    return (events.groupBy("event_type")
            .agg(F.countDistinct("user_id").cast("bigint")
                 .alias("distinct_users")))
