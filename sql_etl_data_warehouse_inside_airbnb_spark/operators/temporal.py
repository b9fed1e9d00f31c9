"""Temporal joins the reference lacks but a 100 TB pipeline needs:
as-of join and windowed range join.

The reference has no non-equi joins at all (SURVEY §2.3 closing note —
its only interval predicate, P8, is a filter). These two operators are
the canonical time-series/"training-data alignment" gaps, implemented
Spark-first:

- ``asof_join``: union-and-window, ONE shuffle on the key columns and a
  per-partition sort — the same cost class as a sort-merge join. No
  inequality join ever reaches the planner, so Spark cannot fall back
  to BroadcastNestedLoopJoin / cartesian at scale.
- ``range_join``: bucketize the time axis so the non-equi time window
  becomes an equi-join on (key, bucket) plus a residual filter — a
  shuffled hash join that scales linearly, with fan-out bounded by
  ``ceil(window / bucket) + 1`` buckets per row.

Skewed keys behave exactly like a skewed equi-join and take the same
mitigations (AQE skew split, salting via operators.skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_VALS = "__asof_vals"
_LB = "__rj_lb"
_UB = "__rj_ub"
_BUCKET = "__rj_bucket"


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_time: str, right_time: str,
              value_cols: list[str] | None = None,
              allow_exact_matches: bool = True,
              suffix: str = "",
              tolerance_us: int | None = None) -> DataFrame:
    """For each left row, attach the columns of the latest right row
    with ``right_time <= left_time`` (backward as-of, pandas
    ``merge_asof`` semantics), matching per ``on`` key. Left rows with
    no prior right row keep NULLs (left-outer semantics).

    ``tolerance_us`` (pandas ``tolerance``): a match older than the
    left row by MORE than this many microseconds is discarded — the
    max-staleness rule every feature-store point-in-time join needs
    (a price quote from last month must not enrich today's trade).
    The right row still carries forward and is nulled per-row at the
    end, so the plan is unchanged: one union + one window pass, no
    extra shuffle. Timestamp time columns diff as ``unix_micros``
    (integer-exact); for numeric time columns the tolerance is in the
    column's own units.

    Requires ``(on, right_time)`` to be unique on the right side —
    pre-dedup with a deterministic winner otherwise, exactly like the
    reference pre-dedups its MERGE source (SURVEY §7.3 J8).

    Implementation: tag both sides, union by name, then one window pass
    per key ordered by (time, side): ``last(value_struct, ignorenulls)``
    over an unbounded-preceding row frame carries the most recent right
    row forward onto each left row. The right row's columns travel as
    ONE struct so they always come from the same right row.
    """
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in keys and c != right_time]
    # refuse to silently overwrite a left column with the carried
    # right value (pandas merge_asof suffixes; we make the caller
    # choose — a suffix or an explicit value_cols list)
    clobbered = [c for c in value_cols if c + suffix in left.columns]
    if clobbered:
        raise ValueError(
            f"asof_join output column(s) {clobbered} would overwrite "
            "left-side columns; pass suffix= or narrow value_cols=")
    # side sort-order decides whether a right row at the exact same
    # timestamp is visible to the left row (<=) or not (<)
    right_rank, left_rank = (0, 1) if allow_exact_matches else (1, 0)

    l2 = (left
          .withColumn(_TS, F.col(left_time))
          .withColumn(_SIDE, F.lit(left_rank)))
    r2 = (right
          .select(*keys,
                  F.col(right_time).alias(_TS),
                  F.lit(right_rank).alias(_SIDE),
                  F.struct(*[F.col(c) for c in value_cols],
                           F.col(right_time).alias("__asof_rt"))
                  .alias(_VALS)))
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    w = (Window.partitionBy(*keys).orderBy(_TS, _SIDE)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(_VALS, F.last(_VALS, ignorenulls=True).over(w))

    out = carried.filter(F.col(_SIDE) == left_rank)
    fresh = None
    if tolerance_us is not None:
        rt = F.col(_VALS)["__asof_rt"]
        is_ts = dict(right.dtypes)[right_time].startswith("timestamp")

        def _t(c):
            return F.unix_micros(c) if is_ts else c

        fresh = rt.isNotNull() & (_t(F.col(left_time)) - _t(rt)
                                  <= F.lit(tolerance_us))
    for c in value_cols:
        v = F.col(_VALS)[c]
        out = out.withColumn(c + suffix,
                             v if fresh is None else F.when(fresh, v))
    return out.drop(_TS, _SIDE, _VALS)


def range_join(left: DataFrame, right: DataFrame, on: list[str] | str,
               left_time: str, right_time: str,
               lower_seconds: int, upper_seconds: int,
               bucket_seconds: int | None = None) -> DataFrame:
    """Inner join of each left row to every right row with
    ``right_time`` in ``[left_time + lower, left_time + upper]``
    (seconds, bounds inclusive), equi-matched on ``on``.

    A naive ``join(expr)`` with only inequality conditions plans as
    BroadcastNestedLoopJoin — O(n*m) and a driver OOM at scale. Here
    the time axis is bucketized: the right side gets one bucket id,
    the left side explodes to the ``ceil(window/bucket)+1`` buckets its
    window can touch, and the join is a plain shuffled equi-join on
    ``(on..., bucket)`` with a residual timestamp filter. Each matching
    pair is produced exactly once (a right row lives in exactly one
    bucket).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = [on] if isinstance(on, str) else list(on)
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)

    # microsecond-exact bounds: unix_timestamp() truncates to whole
    # seconds, which would admit sub-second timestamps up to ~1s
    # OUTSIDE the declared inclusive window (same defect class
    # events.py avoids with unix_micros). Bucket ids use the shared
    # integer-exact floor-div idiom (functions/numeric.py), never
    # double division: FLOOR(bigint / int) promotes through double,
    # where a half-ulp rounding at |micros| near 2^53 can assign a row
    # to the wrong bucket and silently DROP a matching pair (the
    # residual filter only removes false positives) — same discipline
    # as events.py and spatial.py.
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.numeric import (
        exact_floordiv_sql,
    )

    us = 1_000_000
    bucket_us = bucket_seconds * us
    l2 = (left
          .withColumn(_LB, F.unix_micros(F.col(left_time))
                      + lower_seconds * us)
          .withColumn(_UB, F.unix_micros(F.col(left_time))
                      + upper_seconds * us)
          .withColumn(_BUCKET, F.explode(F.sequence(
              F.expr(exact_floordiv_sql(f"`{_LB}`", bucket_us)),
              F.expr(exact_floordiv_sql(f"`{_UB}`", bucket_us))))))
    r2 = right.withColumn(_BUCKET, F.expr(exact_floordiv_sql(
        f"unix_micros(`{right_time}`)", bucket_us)))

    rt = F.unix_micros(F.col(right_time))
    return (l2.join(r2, keys + [_BUCKET], "inner")
            .filter((rt >= F.col(_LB)) & (rt <= F.col(_UB)))
            .drop(_LB, _UB, _BUCKET))
