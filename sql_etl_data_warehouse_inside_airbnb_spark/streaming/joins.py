"""Stream-stream event-time interval joins.

Unified-API builder: takes two event DataFrames (batch reads or
``readStream`` sources) whose timestamp columns are ALREADY
disambiguated by name, and returns the interval-join plan — right rows
match a left row when they share the key and the right timestamp falls
in ``[left_ts, left_ts + max_span)``.

Scale contract: the join is an EQUI join on the key with a bounded
residual time predicate — one shuffle per side, never a nested loop.
In streaming mode, watermark BOTH inputs before calling (see
``streaming.windows.with_watermark``): the bounded interval plus the
two watermarks are exactly what lets Spark compute how long a buffered
row can still find a partner and evict join state past that horizon —
an UNbounded stream-stream join must keep every row forever, the
streaming twin of the unpartitioned scan.

The batch meaning of the same plan is registered as
``stream_interval_join`` (plans/registry_final.py) and oracle-checked;
stream==batch equivalence is pinned in tests/test_streaming_joins.py.

Reference parity note: the reference has no streams (SURVEY §2.9); this
is part of the declared streaming extension (§7.5). Its batch shadow
generalizes the reference's J2-style derived-key joins to event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str,
                  max_span: str = "1 hour",
                  how: str = "inner") -> DataFrame:
    """Interval join: ``right_ts`` in ``[left_ts, left_ts+span)``.

    ``left`` and ``right`` must not share column names other than
    ``key`` (rename timestamps/payloads first) — the survivor columns
    of both sides are returned.

    ``how="left_outer"`` keeps unmatched left rows with NULL right
    columns. In streaming mode this is the join whose semantics the
    watermark defines: an unmatched left row is emitted only once the
    watermark passes ``left_ts + span`` (no partner can still arrive),
    so the outer rows trail the inner ones by the watermark delay —
    batch equivalence still holds once the stream drains (pinned in
    tests/test_streaming_joins.py).
    """
    supported = ("inner", "left_outer", "right_outer", "full_outer")
    if how not in supported:
        raise ValueError(
            f"interval_join supports {supported}, got {how!r}")
    overlap = set(left.columns) & set(right.columns) - {key}
    if overlap:
        raise ValueError(f"disambiguate shared columns first: {overlap}")
    # rename the right key BEFORE joining: both sides often derive
    # from the same source (self-join), where drop(right[key]) can
    # resolve to the left attribute and silently keep the RIGHT key —
    # NULL for unmatched outer rows. A renamed column is unambiguous.
    rkey = "__ij_rkey"
    r2 = right.withColumnRenamed(key, rkey)
    cond = ((F.col(key) == F.col(rkey)) &
            (r2[right_ts] >= left[left_ts]) &
            (r2[right_ts] < left[left_ts] + F.expr(f"INTERVAL {max_span}")))
    # coalesce keeps right-only rows' key (right/full outer) — a bare
    # drop would discard the only non-NULL key for those rows
    return (left.join(r2, cond, how)
            .withColumn(key, F.coalesce(F.col(key), F.col(rkey)))
            .drop(rkey))


def static_enrich(events: DataFrame, dim: DataFrame, on,
                  how: str = "left") -> DataFrame:
    """Stream-static dimension enrichment: join the (possibly
    streaming) event frame against a BATCH dimension table.

    This is the one streaming join that needs NO watermark and NO
    join state: the static side is re-read (or broadcast-cached) per
    micro-batch and each event row joins and leaves — stateless, so
    it composes freely before windowed aggregation. At scale the dim
    broadcasts (the explicit hint here makes it non-negotiable rather
    than size-threshold luck); a big-big stream-static join would
    shuffle the stream every micro-batch and deserves a redesign
    (pre-key the stream, or snapshot-join downstream).

    Left join by default: an event whose key misses the dim survives
    with nulls — enrichment must not drop facts (the reference's
    dims-then-facts load order makes the same choice, SURVEY §3.2).
    Batch/stream equivalence is pinned in tests/test_streaming_joins.py.
    """
    return events.join(F.broadcast(dim), on, how)
