"""Fourth coverage batch — capability extensions past the reference's
own operator set, each one a standard analytics-engine surface the
reference never needed but a complete engine must expose (SURVEY §2.4
"no grouping sets/cube/rollup", §2.5 "no lag/lead, no frame specs",
§2.3 "no range or as-of joins"):

- analytic windows: lag/lead deltas, running/trailing frames, the
  rank ladder (rank vs dense_rank tie semantics, ntile);
- multi-level aggregation: ROLLUP, CUBE with GROUPING flags, pivot;
- temporal joins: as-of join and bucketized range join
  (operators/temporal.py — shuffle-safe rewrites, no nested-loop);
- the watermark late-drop rule as a deterministic batch rewrite;
- approximate distinct (HLL) as the 100 TB scale path for A3/A4;
- array-function surface over tokenized text (SURVEY §2.8 closing
  note: free via Spark, exposed for parity).

Oracle conventions follow plans/registry.py: identical aliases both
sides, BIGINT-aligned integers, exact decimal sums (no division),
total-order determinism everywhere a winner or a bucket is picked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
    asof_join,
    range_join,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    exact_sum,
    register,
    t,
)


# ------------------------------------------------- analytic windows

@register(
    "w3_lag_lead",
    """SELECT o_orderkey, o_custkey,
              CAST(date_diff('day',
                   LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT)
                  AS days_since_prev,
              CAST(date_diff('day',
                   o_orderdate, LEAD(o_orderdate) OVER w) AS BIGINT)
                  AS days_until_next
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)""",
    survey="§2.5 ext (lag/lead)",
    note="inter-order gap per customer: lag/lead with a total-order "
         "tiebreak (the reference's only windows are ROW_NUMBER; "
         "lag/lead completes the analytic surface)")
def w3_lag_lead(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
         .cast("bigint").alias("days_since_prev"),
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
         .cast("bigint").alias("days_until_next"))


@register(
    "w4_running_frames",
    """SELECT o_orderkey, o_custkey,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE), 2) AS running_total,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE), 2) AS trailing3_total
       FROM orders""",
    survey="§2.5 ext (frame specs)",
    note="running + trailing-3 totals per customer (rowsBetween frames; "
         "sums are exact decimal so frame-order FP drift cannot occur)")
def w4_running_frames(spark, sf_dir):
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trail = base.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.sum(dec).over(run).cast("double"), 2)
         .alias("running_total"),
        F.round(F.sum(dec).over(trail).cast("double"), 2)
         .alias("trailing3_total"))


@register(
    "w5_rank_ladder",
    """SELECT c_custkey, c_nationkey,
              CAST(rank()       OVER wt AS BIGINT) AS bal_rank,
              CAST(dense_rank() OVER wt AS BIGINT) AS bal_dense_rank,
              CAST(row_number() OVER wu AS BIGINT) AS bal_row_number,
              CAST(ntile(4)     OVER wu AS BIGINT) AS bal_quartile
       FROM customer
       WINDOW wt AS (PARTITION BY c_nationkey
                     ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC),
              wu AS (PARTITION BY c_nationkey
                     ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC,
                              c_custkey)""",
    survey="§2.5 ext (ranking)",
    note="rank ladder per nation: rank/dense_rank ride a tie-PRONE key "
         "(tie semantics are the point, and tied ranks are "
         "deterministic); row_number/ntile need the total order")
def w5_rank_ladder(spark, sf_dir):
    tier = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    wt = Window.partitionBy("c_nationkey").orderBy(tier.desc())
    wu = Window.partitionBy("c_nationkey").orderBy(tier.desc(), "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.rank().over(wt).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(wt).cast("bigint").alias("bal_dense_rank"),
        F.row_number().over(wu).cast("bigint").alias("bal_row_number"),
        F.ntile(4).over(wu).cast("bigint").alias("bal_quartile"))


# ------------------------------------- multi-level aggregation / pivot

@register(
    "a16_rollup",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
              CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    survey="§2.4 ext (grouping sets)",
    note="ROLLUP with GROUPING flags (subtotal + grand-total rows; "
         "flags disambiguate real NULL groups from rolled-up ones)")
def a16_rollup(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
                 F.grouping("l_linestatus").cast("bigint").alias("g_status"),
                 F.count("*").alias("n_items"),
                 exact_sum("l_quantity", 2).alias("sum_qty")))


@register(
    "a17_cube",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS sum_price
       FROM orders
       GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    survey="§2.4 ext (grouping sets)",
    note="CUBE: all 4 grouping-set levels in one pass (Catalyst expands "
         "to a single shuffle over the Expand operator)")
def a17_cube(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
                 F.grouping("o_orderpriority").cast("bigint")
                  .alias("g_priority"),
                 F.count("*").alias("n_orders"),
                 exact_sum("o_totalprice", 2).alias("sum_price")))


@register(
    "a18_pivot",
    """SELECT l_linestatus,
              round(CAST(sum(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END)
                    AS DOUBLE), 2) AS qty_A,
              round(CAST(sum(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END)
                    AS DOUBLE), 2) AS qty_N,
              round(CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END)
                    AS DOUBLE), 2) AS qty_R
       FROM lineitem
       GROUP BY l_linestatus""",
    survey="§2.4 ext (pivot / A5 generalized)",
    note="pivot with an explicit value list (no extra distinct-scan "
         "job); the SUM(CASE) oracle is exactly the reference's A5 "
         "conditional-aggregate pattern widened to columns")
def a18_pivot(spark, sf_dir):
    piv = (t(spark, sf_dir, "lineitem")
           .groupBy("l_linestatus")
           .pivot("l_returnflag", ["A", "N", "R"])
           .agg(exact_sum("l_quantity", 2)))
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"))


# ---------------------------------------------------- temporal joins

@register(
    "j13_asof_join",
    """SELECT e.event_id, e.user_id, p.pid AS prior_purchase_id
       FROM (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'click') e
       ASOF LEFT JOIN
            (SELECT event_id AS pid, user_id, ts FROM events
             WHERE event_type = 'purchase') p
       ON e.user_id = p.user_id AND e.ts >= p.ts""",
    survey="§2.3 ext (as-of join)",
    note="backward as-of join: each click matched to the user's latest "
         "purchase at-or-before it (operators/temporal.py asof_join — "
         "union+window, ONE shuffle, no nested-loop; (user_id, ts) is "
         "unique so the match is deterministic)")
def j13_asof_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("prior_purchase_id"),
                         "user_id", "ts"))
    return (asof_join(clicks, purchases, on="user_id",
                      left_time="ts", right_time="ts",
                      value_cols=["prior_purchase_id"])
            .select("event_id", "user_id", "prior_purchase_id"))


@register(
    "j14_range_join",
    """SELECT e.event_id, e.user_id,
              CAST(COUNT(*) AS BIGINT) AS n_prior_events
       FROM events e
       JOIN events p
         ON p.user_id = e.user_id
        AND epoch_us(p.ts)
            BETWEEN epoch_us(e.ts) - 1800000000
                AND epoch_us(e.ts) - 1000000
       WHERE e.event_type = 'error'
       GROUP BY e.event_id, e.user_id""",
    survey="§2.3 ext (range join), P8",
    note="windowed range join: per error event, how many same-user "
         "events in the preceding 30 min (operators/temporal.py "
         "range_join — time-bucketized to a shuffled EQUI-join + "
         "residual filter; a raw inequality join would plan as "
         "BroadcastNestedLoopJoin and die at scale)")
def j14_range_join(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    others = ev.select("user_id", F.col("ts").alias("p_ts"))
    joined = range_join(errors, others, on="user_id",
                        left_time="ts", right_time="p_ts",
                        lower_seconds=-1800, upper_seconds=-1)
    return (joined.groupBy("event_id", "user_id")
            .agg(F.count("*").alias("n_prior_events")))


# ------------------------------------------- watermark / approximate

@register(
    "stream_watermark_late_drop",
    """WITH arr AS (
         SELECT ts, event_type,
                max(ts) OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS wm_high
         FROM events)
       SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
              CAST(COUNT(*) AS BIGINT) AS n_kept
       FROM arr
       WHERE wm_high IS NULL OR ts >= wm_high - INTERVAL 30 MINUTE
       GROUP BY date_trunc('hour', ts)""",
    survey="§2.9/§7.5 streaming (watermark)",
    note="the watermark late-drop RULE as a deterministic batch "
         "rewrite: arrival order = event_id, watermark = running "
         "max(event time) - 30 min over prior arrivals, late rows "
         "dropped before the hourly count. This is the strict bound "
         "the streaming path (windows.with_watermark) is conservative "
         "against — the engine never drops within the grace interval, "
         "and handles older rows best-effort (pinned in tests/"
         "test_streaming_watermark.py). The global ordered window here "
         "is the oracle-able formulation, not a scale-path operator")
def stream_watermark_late_drop(spark, sf_dir):
    arr = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1)
    ev = (t(spark, sf_dir, "events")
          .withColumn("wm_high", F.max("ts").over(arr)))
    kept = ev.filter(
        F.col("wm_high").isNull()
        | (F.col("ts") >= F.col("wm_high") - F.expr("INTERVAL 30 MINUTES")))
    return (kept.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
            .agg(F.count("*").alias("n_kept")))


@register(
    "a19_approx_distinct",
    """SELECT event_type,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                       - COUNT(DISTINCT user_id))
                   <= greatest(0.05 * COUNT(DISTINCT user_id), 2.0)
                   AS BIGINT) AS within_tol
       FROM events GROUP BY event_type""",
    survey="§7.5 scale path for A3/A4",
    note="approx_count_distinct (HyperLogLog++, rsd 1%) per event_type "
         "— the 100 TB substitute for exact COUNT(DISTINCT): mergeable "
         "sketches, no per-key shuffle of raw values. Oracle-paired via "
         "a TOLERANCE CONTRACT (r11 verdict item 3): sketch binaries "
         "are engine-specific, so the hash covers (group, exact, "
         "within_tol) where within_tol asserts each engine's OWN "
         "approximation lands within max(5% rel, 2 abs) of the exact "
         "count — 5x the rsd-1% bound, deterministic on fixed data. "
         "The exact side exists to make the sketch's error "
         "hash-checkable; the production scale path remains the "
         "sketch alone (the error bound is also asserted in "
         "tests/test_temporal.py)")
def a19_approx_distinct(spark, sf_dir):
    return (t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.01)
                  .alias("approx_users"),
                 F.count_distinct("user_id").alias("exact_users"),
                 F.count("*").alias("n_events"))
            .select("event_type",
                    F.col("exact_users").cast("bigint")
                     .alias("exact_users"),
                    F.col("n_events").cast("bigint").alias("n_events"),
                    (F.abs(F.col("approx_users").cast("double")
                           - F.col("exact_users"))
                     <= F.greatest(F.lit(0.05) * F.col("exact_users"),
                                   F.lit(2.0)))
                    .cast("bigint").alias("within_tol")))


# ------------------------------------------------ array-function surface

@register(
    "f18_array_functions",
    """SELECT doc_id,
              CAST(len(str_split_regex(trim(lower(text)), '\\s+'))
                   AS BIGINT) AS n_tokens,
              CAST(len(list_distinct(
                       str_split_regex(trim(lower(text)), '\\s+')))
                   AS BIGINT) AS n_distinct_tokens,
              CAST(list_max(list_transform(
                       str_split_regex(trim(lower(text)), '\\s+'),
                       x -> length(x))) AS BIGINT) AS max_token_len
       FROM documents""",
    survey="§2.8 ext (array functions)",
    note="array surface over tokenized text: split → size / "
         "array_distinct / transform+array_max, all JVM column "
         "expressions (SURVEY §2.8: no arrays in the reference — "
         "exposed for engine completeness, same lambda-expression "
         "family the similarity ops build on)")
def f18_array_functions(spark, sf_dir):
    tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("bigint")
         .alias("n_distinct_tokens"),
        F.array_max(F.transform(tokens, lambda x: F.length(x)))
         .cast("bigint").alias("max_token_len"))


@register(
    "f19_explode_tokens",
    """SELECT doc_id,
              unnest(str_split_regex(trim(lower(text)), '\\s+')) AS token,
              CAST(generate_subscripts(
                   str_split_regex(trim(lower(text)), '\\s+'), 1)
                   AS BIGINT) AS pos
       FROM documents WHERE doc_id % 5 = 0""",
    survey="§2.8 ext (explode / UDTF shape)",
    note="posexplode: one row per token with its 1-based position — "
         "the generator/UDTF surface (reference has no row-generating "
         "op; Spark's explode is the built-in path and the shape any "
         "Python UDTF would produce)")
def f19_explode_tokens(spark, sf_dir):
    tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 5 == 0)
            .select("doc_id", F.posexplode(tokens).alias("pos0", "token"))
            .select("doc_id", "token",
                    (F.col("pos0") + 1).cast("bigint").alias("pos")))


@register(
    "a20_unpivot",
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
              l_quantity AS val
       FROM lineitem WHERE l_orderkey % 10 = 0
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
       FROM lineitem WHERE l_orderkey % 10 = 0
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
       FROM lineitem WHERE l_orderkey % 10 = 0""",
    survey="§2.4 ext (unpivot — inverse of a18_pivot)",
    note="wide→long unpivot (Spark melt); values are pure selection "
         "(no arithmetic), so raw doubles compare exactly across "
         "engines; the UNION ALL oracle is the portable rewrite")
def a20_unpivot(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") % 10 == 0)
            .unpivot(["l_orderkey", "l_linenumber"],
                     ["l_quantity", "l_discount", "l_tax"],
                     "metric", "val"))


@register(
    "set_except_all",
    """SELECT c_nationkey FROM customer
       EXCEPT ALL
       SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    survey="§2.7 ext (bag semantics)",
    note="EXCEPT ALL: multiset difference keeps per-key multiplicity "
         "(distinct-EXCEPT is the set_except entry; both engines "
         "implement bag semantics per SQL:2003)")
def set_except_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (c.select("c_nationkey")
            .exceptAll(c.filter(F.col("c_mktsegment") == "BUILDING")
                       .select("c_nationkey")))


@register(
    "set_intersect_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT ALL
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    survey="§2.7 ext (bag semantics)",
    note="INTERSECT ALL: per-key multiplicity = min(count_left, "
         "count_right) — the bag form of the set_intersect entry")
def set_intersect_all(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
            .intersectAll(o.filter(F.col("o_orderstatus") == "O")
                          .select("o_custkey")))


@register(
    "f20_map_functions",
    """SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END)
                   AS BIGINT) AS n_clicks,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END)
                   AS BIGINT) AS n_errors
       FROM events GROUP BY user_id""",
    survey="§2.8 ext (map functions)",
    note="map surface: per-user counts collected into a "
         "map<event_type,count> (map_from_entries over collected "
         "structs), then element_at lookups — missing key → NULL, "
         "matching the SUM(CASE) oracle's null-on-empty. The map is "
         "a mid-plan value; output is scalar so the oracle "
         "comparison stays engine-portable")
def f20_map_functions(spark, sf_dir):
    per_type = (t(spark, sf_dir, "events")
                .groupBy("user_id", "event_type")
                .agg(F.count("*").alias("n")))
    maps = (per_type
            .groupBy("user_id")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("event_type", "n")))
                .alias("counts")))
    return maps.select(
        "user_id",
        F.element_at("counts", "click").alias("n_clicks"),
        F.element_at("counts", "error").alias("n_errors"))


@register(
    "u6_udtf_tokenize",
    """SELECT doc_id,
              unnest(str_split_regex(trim(lower(text)), '\\s+')) AS token,
              CAST(generate_subscripts(
                   str_split_regex(trim(lower(text)), '\\s+'), 1)
                   AS BIGINT) AS pos
       FROM documents WHERE doc_id % 7 = 0""",
    survey="§2.10 ext (Python UDTF)",
    note="the generic table-function surface: a Python UDTF in a "
         "LATERAL join emits (token, pos) rows per document "
         "(functions/tabular.py). Same oracle as the built-in explode "
         "path (f19) — the UDTF is the escape hatch for generators "
         "that genuinely need Python; explode stays the JVM hot path")
def u6_udtf_tokenize(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.tabular import (
        register_udtfs,
    )
    register_udtfs(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, tk.token, tk.pos
           FROM udtf_docs d, LATERAL tokenize(d.text) tk
           WHERE d.doc_id % 7 = 0""")
