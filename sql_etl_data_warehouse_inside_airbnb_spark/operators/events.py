"""Event-stream batch operators: sessionization, last-touch
attribution, and time-bucket (OHLC) resampling.

The reference warehouse has no event stream, but its weekly-rollup
fact build (sql/data/04_load_calendar.sql:24-46 — bucket a timestamp,
aggregate per bucket) is exactly the resample shape, and a complete
analytics engine needs the standard product-analytics trio next to
the funnel/retention/transition family (plans/registry_graph.py
e1-e4). All three are single-shuffle window/groupBy plans:

- :func:`sessionize` — one shuffle on the user key for the gap
  window, then a map-side-combinable per-session aggregate. The
  batch twin of the streaming session window
  (streaming/windows.py); at 100 TB both partition by user and
  never materialize cross-user state.
- :func:`last_touch_attribution` — one shuffle on the user key;
  the "last non-conversion event before each conversion" carry is a
  running MAX over an integer encoding (rank * |types| + type_code),
  not an IGNORE NULLS window (DuckDB 1.0 can't express that), so
  the same plan is oracle-checkable.
- :func:`position_attribution_bp` — the multi-touch sibling (round
  5): same one-shuffle-on-user shape, credit split in exact integer
  basis points instead of floats.
- :func:`resample_ohlc` — one groupBy on the derived bucket id.
  open/close are conditional aggregates over a per-bucket
  row_number, which costs a window before the groupBy; at 100 TB
  the window and the groupBy share the same bucket-key partitioning
  (one exchange, reused — Spark plans exactly one shuffle here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

US_PER_MIN = 60_000_000


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: int = 30,
               type_col: str | None = "event_type") -> DataFrame:
    """Gap-based sessionization: a new session starts at a user's
    first event and whenever the gap since their previous event
    REACHES ``gap_minutes`` (delta >= gap ⇒ new session — exactly
    Spark ``session_window``'s rule, which merges an event iff its
    timestamp is strictly before the previous event + gap; keeping
    the same boundary convention makes this the bit-exact batch twin
    of the streaming session window, asserted in tests). Returns one
    row per session:
    (user, session_idx, n_events, duration_us[, n_event_types]) —
    the last column only when the table has a ``type_col`` (pass
    ``type_col=None`` for logs without one).

    Timestamps diff as ``unix_micros`` (integer, exact) — second-
    granularity epoch() truncates sub-second parts differently across
    engines (the e4 lesson). ``(ts, id)`` is the total order, so ties
    are deterministic. One shuffle: the gap window and the session
    groupBy both partition by user.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = (F.unix_micros(F.col(ts_col))
              - F.unix_micros(F.lag(ts_col).over(w)))
    new_sess = F.when(
        gap_us.isNull() | (gap_us >= gap_minutes * US_PER_MIN), 1
    ).otherwise(0)
    run = (events
           .withColumn("__new", new_sess)
           .withColumn("__sess", F.sum("__new").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow))))
    aggs = [F.count("*").alias("n_events"),
            (F.max(F.unix_micros(F.col(ts_col)))
             - F.min(F.unix_micros(F.col(ts_col)))).alias("duration_us")]
    if type_col is not None:
        aggs.append(F.countDistinct(type_col).alias("n_event_types"))
    return (run.groupBy(F.col(user_col),
                        F.col("__sess").alias("session_idx"))
            .agg(*aggs))


def last_touch_attribution(events: DataFrame,
                           conversion_type: str = "purchase",
                           type_codes: dict[str, int] | None = None,
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: each conversion event is credited to
    the user's most recent PRECEDING non-conversion event type (the
    "channel"). Returns (channel, n_attributed, n_users); conversions
    with no preceding touch are credited to channel NULL.

    The carry is a running ``max`` over ``rn * K + code`` where
    ``rn`` is the per-user row_number and ``code`` a dense integer
    per touch type — an integer-encoded argmax that both Spark and
    ANSI SQL express without IGNORE-NULLS windows, and that can't
    overflow (rn is per-user). ``type_codes`` defaults to the sorted
    distinct non-conversion types; pass it explicitly at scale to
    avoid the extra distinct pass.
    """
    if type_codes is None:
        rows = (events.select("event_type").distinct().collect())
        # NULL event types can never be a channel (their touch
        # encoding is NULL), and None breaks sorted() — skip them
        types = sorted(r[0] for r in rows
                       if r[0] is not None and r[0] != conversion_type)
        type_codes = {t: i + 1 for i, t in enumerate(types)}
    k = len(type_codes) + 1
    # the rn*k+code encoding is only an argmax when codes are dense
    # 1..k-1: a code >= k would overlap later rows' encodings and
    # decode to garbage SILENTLY — fail loudly instead
    if sorted(type_codes.values()) != list(range(1, k)):
        raise ValueError(
            f"type_codes must be dense 1..{k - 1}, got {type_codes}")
    code = F.lit(None).cast("bigint")
    for name, c in sorted(type_codes.items()):
        code = F.when(F.col("event_type") == name, F.lit(c)).otherwise(code)

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    rn = F.row_number().over(w)
    touch = F.when(F.col("event_type") != conversion_type,
                   rn.cast("bigint") * k + code)
    carry = F.max(touch).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    decoded = carry % k
    channel = F.lit(None).cast("string")
    for name, c in sorted(type_codes.items()):
        channel = F.when(decoded == c, F.lit(name)).otherwise(channel)
    return (events
            .withColumn("__channel", channel)
            .filter(F.col("event_type") == conversion_type)
            .groupBy(F.col("__channel").alias("channel"))
            .agg(F.count("*").alias("n_attributed"),
                 F.countDistinct(user_col).alias("n_users")))


def position_attribution_bp(events: DataFrame,
                            conversion_type: str = "purchase",
                            first_bp: int = 4000, last_bp: int = 4000,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id") -> DataFrame:
    """U-shaped (position-based) multi-touch attribution in exact
    integer basis points — the fractional-credit sibling of
    :func:`last_touch_attribution` without a single float: each
    converting user's 10 000 bp of credit splits over the touches
    (non-conversion events strictly before the user's FIRST
    conversion, in (ts, id) order) as

    - 1 touch: all 10 000 bp;
    - 2 touches: the middle pool has no takers, so first/last absorb
      it — half each, the odd bp to the first (5 000 / 5 000 with
      the default 40/20/40 weights);
    - >=3 touches: first gets ``first_bp``, last ``last_bp``, and the
      ``m-2`` middles split the remaining pool by integer division,
      the remainder going one bp each to the EARLIEST middles (a
      deterministic tiebreak, so Σbp == 10 000 EXACTLY per user —
      asserted in tests). Fractional credit as rationals would hit
      the cross-engine quotient-rounding trap (see plans/registry.py
      header); basis points keep attribution oracle-exact.

    Returns (channel, total_bp, n_touches, n_users). One shuffle: the
    per-user windows and the touch filter share the ``user_col``
    partitioning; the channel groupBy reduces touch-type cardinality.
    Users with no conversion, and conversions with no preceding
    touch, credit nothing (NULL-typed events can't be touches).
    """
    if not (0 < first_bp and 0 < last_bp and first_bp + last_bp < 10_000):
        raise ValueError(
            f"need 0 < first_bp, last_bp and first_bp+last_bp < 10000, "
            f"got {first_bp}/{last_bp}")
    mid_pool = 10_000 - first_bp - last_bp
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # first-conversion position as a WHOLE-PARTITION window min over
    # the same user partitioning — not a self-join against a filtered
    # aggregate, which would scan the event table twice and shuffle
    # it twice (profiled: the join plan carried a second
    # Exchange+Sort on the conv branch; this one has exactly one)
    wall = Window.partitionBy(user_col)
    ordered = (events
               .withColumn("__rn", F.row_number().over(w))
               .withColumn("__conv_rn", F.min(
                   F.when(F.col("event_type") == conversion_type,
                          F.col("__rn"))).over(wall)))
    touches = ordered.filter(
        (F.col("__rn") < F.col("__conv_rn"))
        & (F.col("event_type") != conversion_type))
    wt = Window.partitionBy(user_col).orderBy("__rn")
    touches = (touches
               .withColumn("__tidx", F.row_number().over(wt))
               .withColumn("__m", F.count("*").over(wall)))
    m, tidx = F.col("__m"), F.col("__tidx")
    mids = m - F.lit(2)
    # all operands are tiny positive ints, so floor(a/b) over the
    # double promotion is exact (no pre-1970-micros hazard — the
    # exact_floordiv_sql idiom is for 2^53-magnitude operands)
    mid_share = F.floor(F.lit(mid_pool) / mids).cast("int")
    bp = (F.when(m == 1, F.lit(10_000))
          .when(m == 2,
                F.when(tidx == 1,
                       F.lit(first_bp + mid_pool // 2 + mid_pool % 2))
                .otherwise(F.lit(last_bp + mid_pool // 2)))
          .when(tidx == 1, F.lit(first_bp))
          .when(tidx == m, F.lit(last_bp))
          .otherwise(mid_share
                     + F.when(tidx - 1 <= F.lit(mid_pool) % mids, 1)
                        .otherwise(0)))
    return (touches
            .select(F.col("event_type").alias("channel"),
                    F.col(user_col), bp.cast("bigint").alias("__bp"))
            .groupBy("channel")
            .agg(F.sum("__bp").cast("bigint").alias("total_bp"),
                 F.count("*").cast("bigint").alias("n_touches"),
                 F.countDistinct(user_col).cast("bigint")
                 .alias("n_users")))


def resample_ohlc(events: DataFrame, bucket_minutes: int = 15,
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """Downsample a value stream into fixed time buckets with
    open/high/low/close, count, and an exact decimal sum — the
    time-series resample every monitoring/feature pipeline needs.
    Bucket id is ``unix_micros div bucket`` (integer, exact across
    engines). open/close SELECT actual values at the per-bucket
    (ts, id) total-order endpoints — no arithmetic touches them, so
    doubles compare bit-exactly.
    """
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.numeric import (
        exact_floordiv_sql,
    )

    bucket_us = bucket_minutes * US_PER_MIN
    # exact integer FLOOR division (shared idiom — see
    # functions/numeric.py for why neither `/` nor bare `div` is safe
    # on pre-1970 micros)
    bucket = F.expr(exact_floordiv_sql(f"unix_micros({ts_col})",
                                       bucket_us))
    wb = Window.partitionBy("bucket_id").orderBy(ts_col, id_col)
    n_in_bucket = Window.partitionBy("bucket_id")
    rows = (events
            .withColumn("bucket_id", bucket)
            .withColumn("__rn", F.row_number().over(wb))
            .withColumn("__n", F.count("*").over(n_in_bucket)))
    return (rows.groupBy("bucket_id")
            .agg(F.max(F.when(F.col("__rn") == 1, F.col(value_col)))
                 .alias("open"),
                 F.max(value_col).alias("high"),
                 F.min(value_col).alias("low"),
                 F.max(F.when(F.col("__rn") == F.col("__n"),
                              F.col(value_col))).alias("close"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum(F.col(value_col).cast("decimal(18,6)"))
                         .cast("double"), 2).alias("value_sum")))


def peak_concurrency(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     gap_minutes: int = 30) -> DataFrame:
    """Peak simultaneous sessions per day — the sweep-line interval
    aggregate (max-overlap / "how many users were on AT ONCE"), the
    capacity-planning number a plain groupBy can't produce because
    concurrency is a property of interval OVERLAP, not of any single
    row.

    Sessions come from the same gap rule as :func:`sessionize`
    (delta >= gap opens a session); each session becomes two sweep
    events (+1 at its start instant, -1 at its end instant) and the
    running sum of deltas IS the instantaneous concurrency, whose max
    per day is the answer. Declared conventions, applied identically
    in the SQL oracle: a session belongs to its START day (a
    midnight-crossing session counts in the day it began); intervals
    are CLOSED (at equal timestamps +1 sorts before -1, so touching
    sessions overlap and a single-event session still registers
    concurrency 1); the sweep order (t, d desc, user, session_idx) is
    total, so both engines agree on every prefix sum.

    The sweep is DISTRIBUTED (r9): delta rows partition on
    (day, hour-of-t) — hour is monotone in the sweep order's leading
    key t, so hour blocks are contiguous in the global order and
    per-hour prefix sums are exact once each hour adds the carried
    closing count of its day's earlier hours. The carry is a window
    over the tiny hourly frame (one row per (day, hour)), so the big
    sort spreads over 24× more partitions while a bare-day sweep
    would put each day on a single task — the task that stops scaling
    first at 100×. Note end events keep their START day's key but
    their OWN timestamp's hour, so a midnight-crossing session's -1
    lands in an hour index past 23 — still monotone in t, still
    correct.

    Shuffles: user_col for the session build (shared by the gap
    window and the bounds groupBy), (day, hour) for the sweep, then
    day for the hourly carry — the last over rows ∝ days×hours,
    negligible at any scale.

    Returns (day DATE, n_sessions, peak_concurrent) — all integers.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = (F.unix_micros(F.col(ts_col))
              - F.unix_micros(F.lag(ts_col).over(w)))
    new_sess = F.when(
        gap_us.isNull() | (gap_us >= gap_minutes * US_PER_MIN), 1
    ).otherwise(0)
    sess = (events
            .withColumn("__new", new_sess)
            .withColumn("__sess", F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
            .groupBy(F.col(user_col), F.col("__sess"))
            .agg(F.min(ts_col).alias("__start_ts"),
                 F.min(F.unix_micros(F.col(ts_col))).alias("__start_us"),
                 F.max(F.unix_micros(F.col(ts_col))).alias("__end_us")))
    deltas = (sess.select(
        F.to_date("__start_ts").alias("day"),
        F.explode(F.array(
            F.struct(F.col("__start_us").alias("t"),
                     F.lit(1).alias("d")),
            F.struct(F.col("__end_us").alias("t"),
                     F.lit(-1).alias("d")))).alias("e"),
        F.col(user_col), F.col("__sess"))
        .select("day", F.col("e.t").alias("t"), F.col("e.d").alias("d"),
                user_col, "__sess"))
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.numeric import (
        exact_floordiv_sql,
    )

    hr = F.expr(exact_floordiv_sql("t", 3600 * 1_000_000))
    sw = (Window.partitionBy("day", "__hr")
          .orderBy(F.col("t"), F.desc("d"), F.col(user_col),
                   F.col("__sess"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hourly = (deltas.withColumn("__hr", hr)
              .withColumn("__run", F.sum("d").over(sw))
              .groupBy("day", "__hr")
              .agg(F.max("__run").alias("__mx"),
                   F.sum("d").alias("__tot"),
                   F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
                   .alias("__starts")))
    carry_w = (Window.partitionBy("day").orderBy("__hr")
               .rowsBetween(Window.unboundedPreceding, -1))
    return (hourly
            .withColumn("__carry",
                        F.coalesce(F.sum("__tot").over(carry_w),
                                   F.lit(0)))
            .groupBy("day")
            .agg(F.sum("__starts").cast("long").alias("n_sessions"),
                 F.max(F.col("__carry") + F.col("__mx")).cast("long")
                 .alias("peak_concurrent")))
