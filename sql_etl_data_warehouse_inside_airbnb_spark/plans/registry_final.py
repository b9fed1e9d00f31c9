"""Surface-completion batch 4 — the join/aggregate/function shapes the
registry still lacked: outer joins (LEFT with null-fill, FULL with
coalesced keys), null-safe equality joins, ordered string aggregation
(listagg WITHIN GROUP), deterministic mode (two-stage argmax — the
scale-safe form of mode()), exact median, mergeable HLL sketch union
(the 100 TB COUNT(DISTINCT) path shown end-to-end: partial sketches,
one union), str_to_map parsing, width_bucket histogramming,
try-arithmetic (null-on-overflow / null-on-div-zero, the numeric twin
of the try_cast spine, SURVEY §1.3), generator null-preservation
(explode vs explode_outer), and per-key time-series gap-fill
(sequence + explode + left join — the distributed replacement for the
reference's driver-side date loop, modules/data_loader.py:492-498).

Scale notes are per-query; the common thread: every shape here is one
shuffle or less beyond its inputs, map-side-combinable where it
aggregates, and free of driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    finite_case,
    finite_col,
    register,
    t,
)


@register(
    "j16_left_outer",
    """SELECT c.c_custkey, c.c_mktsegment,
              CAST(COALESCE(o.cnt, 0) AS BIGINT) AS order_count
       FROM customer c
       LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
                  FROM orders GROUP BY o_custkey) o
         ON c.c_custkey = o.o_custkey""",
    survey="§2.3 ext (outer joins)",
    note="LEFT OUTER join with null-fill: customers keep their row even "
         "with zero orders (the reference only ever inner/anti/semi-joins "
         "— SURVEY §2.3; outer joins complete the join surface). The "
         "aggregate is pre-shrunk BEFORE the join (one row per custkey), "
         "so the outer join shuffles |customers|+|custkeys|, never raw "
         "orders; COALESCE(cnt,0) is the canonical null-fill")
def j16_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    cnt = (t(spark, sf_dir, "orders")
           .groupBy(F.col("o_custkey").alias("c_custkey"))
           .agg(F.count("*").alias("order_count")))
    return (c.join(cnt, "c_custkey", "left")
            .select("c_custkey", "c_mktsegment",
                    F.coalesce("order_count", F.lit(0)).alias("order_count")))


@register(
    "j17_full_outer",
    """SELECT COALESCE(c.k, s.k) AS n_nationkey,
              CAST(COALESCE(c.cnt, 0) AS BIGINT) AS customer_count,
              CAST(COALESCE(s.cnt, 0) AS BIGINT) AS supplier_count
       FROM (SELECT c_nationkey AS k, COUNT(*) AS cnt
             FROM customer WHERE c_mktsegment = 'MACHINERY'
             GROUP BY c_nationkey) c
       FULL OUTER JOIN
            (SELECT s_nationkey AS k, COUNT(*) AS cnt
             FROM supplier WHERE s_acctbal > 4000
             GROUP BY s_nationkey) s
         ON c.k = s.k""",
    survey="§2.3 ext (outer joins)",
    note="FULL OUTER join of two aggregates with the coalesced-key idiom "
         "(COALESCE(left.k, right.k) is mandatory — after a full join "
         "either side's key can be NULL). Both sides are pre-aggregated "
         "to ≤25 rows before the join: reconciliation joins at 100 TB "
         "are cheap exactly when the full-outer happens on the rollups, "
         "not the raw facts")
def j17_full_outer(spark, sf_dir):
    c = (t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "MACHINERY")
         .groupBy(F.col("c_nationkey").alias("ck"))
         .agg(F.count("*").alias("customer_count")))
    s = (t(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 4000)
         .groupBy(F.col("s_nationkey").alias("sk"))
         .agg(F.count("*").alias("supplier_count")))
    return (c.join(s, c["ck"] == s["sk"], "full_outer")
            .select(F.coalesce("ck", "sk").alias("n_nationkey"),
                    F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
                    F.coalesce("supplier_count", F.lit(0)).alias("supplier_count")))


@register(
    "j18_null_safe_join",
    """WITH a AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k,
                        COUNT(*) AS cnt_all
                 FROM orders GROUP BY 1),
            b AS (SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k,
                        COUNT(*) AS cnt_f
                 FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
       SELECT a.k AS priority_key,
              CAST(a.cnt_all AS BIGINT) AS cnt_all,
              CAST(b.cnt_f AS BIGINT) AS cnt_f
       FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""",
    survey="§2.3 ext (null-safe equality join)",
    note="null-safe equi-join (eqNullSafe / <=> / IS NOT DISTINCT FROM): "
         "NULL keys MATCH each other instead of silently dropping — the "
         "join you need when the key itself is the result of a "
         "null-on-failure cast (SURVEY §1.3 try_cast spine). Plans as a "
         "regular hash join on the null-safe comparison, same single "
         "shuffle as plain equality; both sides pre-aggregated to ≤5 rows")
def j18_null_safe_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    a = o.groupBy(k.alias("ka")).agg(F.count("*").alias("cnt_all"))
    b = (o.filter(F.col("o_orderstatus") == "F")
         .groupBy(k.alias("kb")).agg(F.count("*").alias("cnt_f")))
    return (a.join(b, a["ka"].eqNullSafe(b["kb"]), "inner")
            .select(F.col("ka").alias("priority_key"), "cnt_all", "cnt_f"))


@register(
    "a30_listagg",
    """SELECT o_orderstatus,
              string_agg(o_orderpriority, '|' ORDER BY o_orderkey)
                AS priority_chain,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM orders WHERE o_orderkey % 997 = 0
       GROUP BY o_orderstatus""",
    survey="§2.4 ext (ordered string aggregation)",
    note="listagg(...) WITHIN GROUP (ORDER BY ...) — the SQL:2016 "
         "ordered string aggregate (DuckDB spells it string_agg ORDER "
         "BY). The WITHIN GROUP order key is the unique o_orderkey, so "
         "the concatenation is deterministic — an UNORDERED listagg is "
         "partition-order-dependent and can never be oracle-compared "
         "(same rule as a23's sorted collect_list). Input pre-filtered "
         "to ~1/1000 of orders: unbounded string aggregates are a "
         "driver-killer at scale, so the engine keys them behind "
         "explicit cardinality control")
def a30_listagg(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql(
        """SELECT o_orderstatus,
                  listagg(o_orderpriority, '|')
                    WITHIN GROUP (ORDER BY o_orderkey) AS priority_chain,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders_la WHERE o_orderkey % 997 = 0
           GROUP BY o_orderstatus""")


@register(
    "a31_mode_argmax",
    """SELECT o_orderstatus, o_orderpriority AS mode_priority,
              cnt AS mode_count
       FROM (SELECT o_orderstatus, o_orderpriority,
                    CAST(COUNT(*) AS BIGINT) AS cnt,
                    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                        ORDER BY COUNT(*) DESC, o_orderpriority DESC) AS rn
             FROM orders GROUP BY o_orderstatus, o_orderpriority) x
       WHERE rn = 1""",
    survey="§2.4 ext (mode / argmax)",
    note="deterministic mode: most frequent priority per status via "
         "two-stage aggregation — groupBy(status, value).count() then "
         "max(struct(count, value)) per status. Native mode() is "
         "tie-NONdeterministic on both engines, so the engine's "
         "canonical form is this argmax (ties break to the larger "
         "value, pinned). Two map-side-combinable aggregates and no "
         "per-group sort of raw rows — the window in the ORACLE is for "
         "DuckDB's benefit only; the Spark plan sorts just the "
         "(status, value) count table")
def a31_mode_argmax(spark, sf_dir):
    counts = (t(spark, sf_dir, "orders")
              .groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count("*").alias("cnt")))
    return (counts.groupBy("o_orderstatus")
            .agg(F.max(F.struct(F.col("cnt"),
                                F.col("o_orderpriority"))).alias("w"))
            .select("o_orderstatus",
                    F.col("w.o_orderpriority").alias("mode_priority"),
                    F.col("w.cnt").alias("mode_count")))


@register(
    "a32_median",
    f"""SELECT l_returnflag,
              median(CAST({finite_case('l_quantity')}
                          AS DOUBLE)) AS median_qty,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem GROUP BY l_returnflag""",
    survey="§2.4 ext (exact median)",
    note="exact interpolating median per group. Comparable across "
         "engines ONLY because l_quantity is integer-valued: the "
         "even-count interpolation (a+b)/2 is exact FP there, dodging "
         "the quotient-rounding trap (registry docstring). DuckDB's "
         "median over DECIMAL truncates to the lower middle — the "
         "oracle casts to DOUBLE first (verified). The median input is "
         "finite-guarded on BOTH sides (r13 hostile sweep: engines "
         "place NaN differently inside quantile order statistics, so "
         "a single NaN silently shifted every median; identity on "
         "finite data — quantiles are over finite values by contract, "
         "NULLs are skipped by median on both engines). Exact median "
         "is a full-sort-per-group op; the 100 TB path is a24's "
         "approx_percentile sketch — this entry is the correctness "
         "anchor the sketch's error bound is measured against")
def a32_median(spark, sf_dir):
    qty = finite_col("l_quantity")
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.median(qty).alias("median_qty"),
                 F.count("*").alias("n")))


@register(
    "a33_hll_sketch_union",
    """SELECT event_type,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                       - COUNT(DISTINCT user_id))
                   <= greatest(0.05 * COUNT(DISTINCT user_id), 2.0)
                   AS BIGINT) AS within_tol
       FROM events GROUP BY event_type
       UNION ALL
       SELECT '__ALL__' AS event_type,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                       - COUNT(DISTINCT user_id))
                   <= greatest(0.05 * COUNT(DISTINCT user_id), 2.0)
                   AS BIGINT) AS within_tol
       FROM events""",
    survey="§7.5 scale path (mergeable sketches, A3/A4)",
    note="the mergeable-sketch lifecycle end-to-end: hll_sketch_agg "
         "builds a per-event_type DataSketches HLL of user_id (partial, "
         "map-side combinable), hll_union_agg MERGES the per-type "
         "sketches into the global estimate WITHOUT rescanning events — "
         "exactly how a 1000-executor job rolls distinct counts up a "
         "hierarchy (per-partition → per-key → global) with one scan. "
         "Oracle-paired via a TOLERANCE CONTRACT (r11 verdict item 3): "
         "sketch binaries are engine-specific, so the hash covers "
         "(event_type incl __ALL__, exact, within_tol) where "
         "within_tol asserts each engine's OWN estimate — Spark's "
         "union-merged sketch on the __ALL__ row, DuckDB's direct "
         "global sketch — lands within max(5% rel, 2 abs) of the "
         "exact distinct count (lgConfigK=12 → rsd ~1.6%, so 5% is "
         "~3σ, deterministic on fixed data). The exact side exists to "
         "make the merge hash-checkable; the scale path is the sketch "
         "union alone (accuracy also asserted in "
         "tests/test_functions.py)")
def a33_hll_sketch_union(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    sketches = (ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"),
                     F.count_distinct("user_id").alias("exact_users")))
    per_type = sketches.select(
        "event_type", "exact_users",
        F.hll_sketch_estimate("sk").alias("approx_users"))
    # the merged global estimate: union the per-type sketches (no
    # rescan); its exact anchor needs one count-distinct over events
    global_exact = ev.agg(
        F.count_distinct("user_id").alias("exact_users"))
    overall = (sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
         .alias("approx_users"))
        .crossJoin(global_exact)  # 1 row x 1 row
        .select(F.lit("__ALL__").alias("event_type"), "exact_users",
                "approx_users"))
    return (per_type.unionByName(overall)
            .select("event_type",
                    F.col("exact_users").cast("bigint")
                     .alias("exact_users"),
                    (F.abs(F.col("approx_users").cast("double")
                           - F.col("exact_users"))
                     <= F.greatest(F.lit(0.05) * F.col("exact_users"),
                                   F.lit(2.0)))
                    .cast("bigint").alias("within_tol")))


@register(
    "f28_str_to_map",
    """SELECT o_orderkey,
              regexp_extract(kv, 'status:([^,]*)', 1) AS status_v,
              regexp_extract(kv, 'prio:([^,]*)', 1) AS prio_v,
              CAST(array_length(string_split(kv, ',')) AS BIGINT) AS nkeys,
              CAST(NULL AS VARCHAR) AS miss_v
       FROM (SELECT o_orderkey,
                    'status:' || o_orderstatus || ',prio:' || o_orderpriority
                      || ',key:' || CAST(o_orderkey AS VARCHAR) AS kv
             FROM orders WHERE o_orderkey % 11 = 0) s""",
    survey="§2.8 ext (map parsing: str_to_map)",
    note="str_to_map round-trip: build 'k:v,k:v' text, parse to "
         "map<string,string>, read entries back with element_at — "
         "missing key → NULL (same null-on-absent contract as f20's "
         "map lookup). This is the delimited-KV sibling of the JSON "
         "surface (f17/f27) for logs that aren't JSON; pure JVM column "
         "expressions, no UDF, no shuffle. Oracle parses the same "
         "constructed string with RE2 regexp_extract")
def f28_str_to_map(spark, sf_dir):
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 11 == 0)
         .select("o_orderkey",
                 F.concat(F.lit("status:"), "o_orderstatus",
                          F.lit(",prio:"), "o_orderpriority",
                          F.lit(",key:"),
                          F.col("o_orderkey").cast("string")).alias("kv")))
    m = F.str_to_map("kv", F.lit(","), F.lit(":"))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.element_at(m, "prio").alias("prio_v"),
        F.size(m).cast("long").alias("nkeys"),
        F.element_at(m, "absent").alias("miss_v"))


@register(
    "f29_width_bucket",
    """SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
              CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
       FROM (SELECT CASE WHEN l_quantity >= 50 THEN 11
                         ELSE 1 + CAST(floor(l_quantity / 5) AS BIGINT)
                    END AS bucket, l_quantity
             FROM lineitem) b
       GROUP BY bucket""",
    survey="§2.8 ext (width_bucket histogramming)",
    note="width_bucket(qty, 0, 50, 10): equal-width histogram "
         "assignment — the single-pass distributed histogram (bucket is "
         "a pure projection; the count is one map-side-combinable "
         "aggregate — no sort, no per-group state). Values exactly on a "
         "boundary go to the UPPER bucket and v ≥ max goes to the "
         "overflow bucket n+1 — both pinned by the oracle's closed-form "
         "rewrite (DuckDB has no width_bucket). Constants chosen so "
         "bucket width 5 divides the integer-valued quantities exactly: "
         "boundary arithmetic is exact FP on both engines")
def f29_width_bucket(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.select(F.width_bucket("l_quantity", F.lit(0), F.lit(50),
                                     F.lit(10)).alias("bucket"),
                      "l_quantity")
            .groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("l_quantity").cast("double").alias("min_qty"),
                 F.max("l_quantity").cast("double").alias("max_qty")))


@register(
    "f30_try_arithmetic",
    """SELECT o_orderkey,
              CASE WHEN o_orderkey <= 10
                   THEN o_orderkey + 9223372036854775797 END AS add_v,
              CASE WHEN o_orderkey < 4
                   THEN o_orderkey * 2305843009213693952 END AS mul_v,
              CASE WHEN o_orderkey % 2 = 1
                   THEN o_totalprice END AS div_v
       FROM orders WHERE o_orderkey <= 1000""",
    survey="§2.8 ext (try-arithmetic: null-on-overflow/div-zero)",
    note="the numeric twin of the try_cast spine (SURVEY §1.3): "
         "try_add / try_multiply return NULL on BIGINT overflow instead "
         "of failing the job, try_divide returns NULL on division by "
         "zero. At 100 TB a single poisoned row must not kill a "
         "30-minute stage — null-and-quarantine beats throw. Overflow "
         "thresholds are pinned exactly (add overflows iff key > 10 "
         "against MAX-10; multiply iff key ≥ 4 against 2^61); the "
         "divide uses denominator key%2 so surviving quotients are "
         "x/1.0 — exact, dodging the quotient-rounding trap. Oracle is "
         "the predicate rewrite (DuckDB would raise on the overflow)")
def f30_try_arithmetic(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.try_add(F.col("o_orderkey"),
                  F.lit(9223372036854775797)).alias("add_v"),
        F.try_multiply(F.col("o_orderkey"),
                       F.lit(2305843009213693952)).alias("mul_v"),
        F.try_divide(F.col("o_totalprice"),
                     (F.col("o_orderkey") % 2).cast("double")).alias("div_v"))


@register(
    "f31_explode_outer",
    """SELECT d.doc_id, u.token
       FROM documents d
       LEFT JOIN LATERAL unnest(regexp_extract_all(d.text, '[A-Za-z]{11,}'))
         AS u(token) ON true
       WHERE d.doc_id % 7 = 0""",
    survey="§2.8 ext (generator null-preservation: explode_outer)",
    note="explode_outer vs explode: a document with NO long words keeps "
         "its row with token=NULL instead of vanishing — the "
         "LEFT-JOIN-shaped generator. Losing empty parents silently is "
         "the classic explode bug in per-document pipelines (token "
         "stats would drop exactly the short documents they should "
         "count as zero). Same RE2/Java-regex-portable pattern "
         "discipline as f23; oracle is DuckDB's LEFT JOIN LATERAL "
         "unnest, the relational definition of the outer generator. "
         "idx=0 (full match) is EXPLICIT: Spark's regexp_extract_all "
         "defaults to group 1 and validates the group count only when "
         "a row actually matches, so a groupless pattern passes on any "
         "corpus with no 11+-letter word and crashes on the first one "
         "that has any (r13 hostile sweep found it via the 10k-char "
         "token; DuckDB extracts the full match either way)")
def f31_explode_outer(spark, sf_dir):
    d = (t(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 7 == 0))
    arr = F.regexp_extract_all("text", F.lit("[A-Za-z]{11,}"), F.lit(0))
    return d.select("doc_id", F.explode_outer(arr).alias("token"))


@register(
    "f32_sequence_gapfill",
    """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m
                 FROM orders WHERE o_custkey < 50),
            spans AS (SELECT o_custkey, min(m) AS lo, max(m) AS hi
                      FROM o GROUP BY o_custkey),
            months AS (SELECT o_custkey, g.m FROM spans,
                       LATERAL unnest(generate_series(lo, hi,
                                      INTERVAL 1 MONTH)) AS g(m)),
            cnt AS (SELECT o_custkey, m, COUNT(*) AS c
                    FROM o GROUP BY o_custkey, m)
       SELECT months.o_custkey, months.m AS month,
              CAST(COALESCE(cnt.c, 0) AS BIGINT) AS order_count
       FROM months LEFT JOIN cnt
         ON months.o_custkey = cnt.o_custkey AND months.m = cnt.m""",
    survey="F10 ext (per-key time-series gap-fill)",
    note="per-key gap-fill: each customer's order counts on a gap-FREE "
         "monthly axis (months with zero orders appear as 0). "
         "sequence(min, max, interval 1 month) + explode generates the "
         "axis PER KEY inside the executors — the distributed form of "
         "the reference's driver-side date loop "
         "(modules/data_loader.py:492-498, F10) and of f10's single "
         "global date dimension. Cost: two aggregates + one left join, "
         "all partitioned by custkey, no driver collect; the axis "
         "explode amplifies rows by span-months, which is bounded and "
         "predictable, never quadratic")
def f32_sequence_gapfill(spark, sf_dir):
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 50)
         .select("o_custkey",
                 F.date_trunc("month", "o_orderdate").alias("m")))
    spans = o.groupBy("o_custkey").agg(F.min("m").alias("lo"),
                                       F.max("m").alias("hi"))
    months = spans.select(
        "o_custkey",
        F.explode(F.sequence("lo", "hi",
                             F.expr("interval 1 month"))).alias("month"))
    cnt = (o.groupBy("o_custkey", F.col("m").alias("month"))
           .agg(F.count("*").alias("c")))
    return (months.join(cnt, ["o_custkey", "month"], "left")
            .select("o_custkey", "month",
                    F.coalesce("c", F.lit(0)).alias("order_count")))


@register(
    "stream_interval_join",
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
       WHERE a.event_type = 'view' AND b.event_type = 'purchase'""",
    survey="§2.9/§7.5 streaming (stream-stream interval join)",
    note="the batch meaning of the stream-stream interval join "
         "(streaming/joins.py): purchases attributed to a same-user "
         "view within the preceding hour. Equi join on user_id with a "
         "bounded residual time predicate — one shuffle per side, no "
         "nested loop (guarded in tests/test_plan_audit.py). In "
         "streaming the SAME builder runs on two watermarked readStream "
         "sources, and the bounded interval is what makes join state "
         "evictable; stream==batch is pinned in "
         "tests/test_streaming_joins.py. Compared columns are the ID "
         "pairs (unique per match); the join's time predicate rides the "
         "exact nanos→micros truncation pinned in sources/io.py — a "
         "float division there once moved timestamps by ±256 ns "
         "(double ulp at 1.7e18) and flipped microseconds vs the oracle")
def stream_interval_join(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.joins import (
        interval_join,
    )
    ev = t(spark, sf_dir, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    return (interval_join(views, purchases, key="user_id",
                          left_ts="view_ts", right_ts="purchase_ts",
                          max_span="1 hour")
            .select("user_id", "view_id", "purchase_id"))


@register(
    "stream_interval_join_outer",
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id
       FROM (SELECT * FROM events WHERE event_type = 'view') a
       LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
         ON a.user_id = b.user_id
        AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR""",
    survey="§2.9/§7.5 streaming (outer stream-stream join)",
    note="left-outer variant of the stream-stream interval join "
         "(streaming/joins.py:interval_join how='left_outer'): views "
         "with NO purchase inside the hour survive with NULL "
         "purchase_id. In streaming, outer rows emit only when the "
         "watermark passes view_ts + span (no partner can still "
         "arrive) — the state-eviction semantics that distinguish "
         "this operator class from the inner join; stream==batch "
         "equivalence incl. the NULL rows is pinned in "
         "tests/test_streaming_joins.py. The right key renames before "
         "the join: in a self-join drop(right[key]) can resolve to "
         "the LEFT attribute and silently keep the NULL-for-unmatched "
         "right key (found by the outer-join test)")
def stream_interval_join_outer(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.joins import (
        interval_join,
    )
    ev = t(spark, sf_dir, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    return (interval_join(views, purchases, key="user_id",
                          left_ts="view_ts", right_ts="purchase_ts",
                          max_span="1 hour", how="left_outer")
            .select("user_id", "view_id", "purchase_id"))


@register(
    "j19_star_join_rollup",
    """SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_type = 'PROMO' AND o.o_orderstatus = 'F'
       GROUP BY r.r_name, year(o.o_orderdate)""",
    survey="§3 composite (J1/J7/A1 end-to-end, TPC-H Q5 shape)",
    note="the composite star-schema rollup: a 6-table join tree "
         "(fact→fact-dim chain + selective dim filter) feeding a "
         "two-key aggregate — the shape every reference view is a "
         "special case of, and the plan the optimizer must get right "
         "at 100 TB: selective dim filters push into the parquet "
         "scans, small dims broadcast (zero fact shuffles for them), "
         "and only the lineitem↔orders spine pays a shuffle. The "
         "revenue measure rides the exact-decimal-sum rule "
         "(per-row double product cast to DECIMAL before SUM — the "
         "product is bit-identical IEEE on both engines, the sum is "
         "order-independent decimal). Plan shape guarded in "
         "tests/test_plans.py::test_star_join_broadcasts_dims")
def j19_star_join_rollup(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    return (l
            .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
            .join(o, l["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy(F.col("r_name").alias("region"),
                     F.year("o_orderdate").cast("long").alias("order_year"))
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum(rev).cast("double"), 2).alias("sum_revenue")))


@register(
    "j20_scd2_apply",
    """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
            ch AS (SELECT c_custkey, 'RELOCATED' AS seg,
                          DATE '2024-06-01' AS ts
                   FROM customer WHERE c_custkey % 10 = 3
                   UNION ALL
                   SELECT c_custkey + 10000000, 'ONBOARDED',
                          DATE '2024-06-01'
                   FROM customer WHERE c_custkey % 10 = 7)
       SELECT b.c_custkey, b.c_mktsegment,
              DATE '2024-01-01' AS valid_from,
              CASE WHEN c.c_custkey IS NOT NULL
                        AND c.seg <> b.c_mktsegment
                   THEN c.ts END AS valid_to,
              (c.c_custkey IS NULL OR c.seg = b.c_mktsegment)
                AS is_current
       FROM base b LEFT JOIN ch c ON b.c_custkey = c.c_custkey
       UNION ALL
       SELECT c.c_custkey, c.seg, c.ts, CAST(NULL AS DATE), TRUE
       FROM ch c LEFT JOIN base b ON b.c_custkey = c.c_custkey
       WHERE b.c_custkey IS NULL OR c.seg <> b.c_mktsegment""",
    survey="J8 ext (SCD type-2 — history-preserving MERGE)",
    note="type-2 slowly-changing dimension apply "
         "(operators/scd.py:scd2_apply): where the reference's MERGE "
         "OVERWRITES tracked columns on match (J8, "
         "data_loader.py:251-290), SCD2 CLOSES the old row "
         "(valid_to = change date, is_current = false) and opens a new "
         "one — matched-and-changed keys get two rows, unchanged and "
         "absent keys pass through, brand-new keys insert open. One "
         "full-outer join on the business key over the OPEN slice only "
         "(closed history never joins), then projections + union — no "
         "whole-dim window, no driver diffing. The change batch is "
         "derived deterministically from customer (keys %10=3 change "
         "segment, %10=7 spawn new keys) so both engines see the same "
         "delta; invariants (one open row per key, no overlapping "
         "intervals) are property-tested in tests/test_scd.py")
def j20_scd2_apply(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.scd import (
        scd2_apply,
    )
    c = t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey", "c_mktsegment",
        F.to_date(F.lit("2024-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))
    changes = (c.filter(F.col("c_custkey") % 10 == 3)
               .select("c_custkey",
                       F.lit("RELOCATED").alias("c_mktsegment"),
                       F.to_date(F.lit("2024-06-01")).alias("change_ts"))
               .unionByName(
                   c.filter(F.col("c_custkey") % 10 == 7)
                   .select((F.col("c_custkey") + 10000000).alias("c_custkey"),
                           F.lit("ONBOARDED").alias("c_mktsegment"),
                           F.to_date(F.lit("2024-06-01")).alias("change_ts"))))
    return scd2_apply(base, changes, key="c_custkey",
                      attrs=["c_mktsegment"], change_ts="change_ts")


@register(
    "x1_quality_report",
    """SELECT 'price_under_cap' AS check_name,
              CAST(COUNT(*) FILTER (WHERE (o_totalprice <= 300000)
                   IS NOT TRUE) AS BIGINT) AS n_violations FROM orders
       UNION ALL
       SELECT 'status_known',
              CAST(COUNT(*) FILTER (WHERE (o_orderstatus IN ('F','O'))
                   IS NOT TRUE) AS BIGINT) FROM orders
       UNION ALL
       SELECT 'date_not_null',
              CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL)
                   AS BIGINT) FROM orders
       UNION ALL
       SELECT 'unique_orderkey',
              CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
       FROM orders
       UNION ALL
       SELECT 'custkey_in_building_dim', CAST(COUNT(*) AS BIGINT)
       FROM orders o LEFT JOIN
            (SELECT c_custkey FROM customer
             WHERE c_mktsegment = 'BUILDING') c
         ON o.o_custkey = c.c_custkey
       WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL""",
    survey="U5/A11 ext (declarative data-quality expectations)",
    note="the expectation report (operators/quality.py): row checks "
         "(range, accepted values, not-null) fold into ONE conditional-"
         "aggregate scan — adding a check adds a column to the partial "
         "aggregate, not a job; uniqueness is COUNT(*) - "
         "COUNT(DISTINCT); referential integrity is a left-anti count "
         "(here deliberately violated: only BUILDING customers count "
         "as the dim, so most orders orphan — a non-vacuous failing "
         "check). NULL predicate = violation (IS NOT TRUE), the "
         "conservative reading of the reference's TRY_CAST quarantine. "
         "Generalizes the reference's validator (U5) + post-load count "
         "reconciliations (A11) into the dbt-test shape")
def x1_quality_report(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
        expectation_report,
    )
    o = t(spark, sf_dir, "orders")
    building = (t(spark, sf_dir, "customer")
                .filter(F.col("c_mktsegment") == "BUILDING"))
    return expectation_report(
        o,
        row_checks={
            "price_under_cap": F.col("o_totalprice") <= 300000,
            "status_known": F.col("o_orderstatus").isin("F", "O"),
            "date_not_null": F.col("o_orderdate").isNotNull(),
        },
        unique={"unique_orderkey": ["o_orderkey"]},
        references={"custkey_in_building_dim":
                    (building, "o_custkey", "c_custkey")})


@register(
    "x6_profile_table",
    """SELECT 'c_custkey' AS "column", 'bigint' AS dtype,
              (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
              CAST(coalesce(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END),
                   0) AS BIGINT) AS n_nulls,
              CAST(10000 * coalesce(sum(CASE WHEN c_custkey IS NULL
                                    THEN 1 ELSE 0 END), 0)
                   // greatest((SELECT count(*) FROM customer), 1)
                   AS BIGINT) AS null_bp,
              CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
              min(CAST(c_custkey AS VARCHAR)) AS min_value,
              max(CAST(c_custkey AS VARCHAR)) AS max_value
       FROM customer
       UNION ALL
       SELECT 'c_name' AS "column", 'string' AS dtype,
              (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
              CAST(coalesce(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END),
                   0) AS BIGINT) AS n_nulls,
              CAST(10000 * coalesce(sum(CASE WHEN c_name IS NULL
                                    THEN 1 ELSE 0 END), 0)
                   // greatest((SELECT count(*) FROM customer), 1)
                   AS BIGINT) AS null_bp,
              CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct,
              min(c_name) AS min_value,
              max(c_name) AS max_value
       FROM customer
       UNION ALL
       SELECT 'c_nationkey' AS "column", 'int' AS dtype,
              (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
              CAST(coalesce(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END),
                   0) AS BIGINT) AS n_nulls,
              CAST(10000 * coalesce(sum(CASE WHEN c_nationkey IS NULL
                                    THEN 1 ELSE 0 END), 0)
                   // greatest((SELECT count(*) FROM customer), 1)
                   AS BIGINT) AS null_bp,
              CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_distinct,
              min(CAST(c_nationkey AS VARCHAR)) AS min_value,
              max(CAST(c_nationkey AS VARCHAR)) AS max_value
       FROM customer
       UNION ALL
       SELECT 'c_mktsegment' AS "column", 'string' AS dtype,
              (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_rows,
              CAST(coalesce(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END),
                   0) AS BIGINT) AS n_nulls,
              CAST(10000 * coalesce(sum(CASE WHEN c_mktsegment IS NULL
                                    THEN 1 ELSE 0 END), 0)
                   // greatest((SELECT count(*) FROM customer), 1)
                   AS BIGINT) AS null_bp,
              CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct,
              min(c_mktsegment) AS min_value,
              max(c_mktsegment) AS max_value
       FROM customer""",
    survey="EDA surface (data_analyzer.py:102-150)",
    note="per-column table profile — the 'profile this file' menu "
         "entry (operators/quality.py:profile_table): every column's "
         "null count/basis-points, distinct count, min/max ride ONE "
         "partial-aggregate scan, reshaped by unpivot (no driver "
         "loop). Exact distinct here so the oracle can reproduce it; "
         "approx=True (HLL) is the default 100 TB path. Doubles are "
         "excluded from the profiled subset because engine "
         "double->string formatting differs; null_bp is integer basis "
         "points (no float division ties)")
def x6_profile_table(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
        profile_table,
    )
    return profile_table(
        t(spark, sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
        approx=False)


@register(
    "stream_static_enrich",
    """SELECT c_mktsegment, event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS sum_value
       FROM events LEFT JOIN customer ON user_id = c_custkey
       GROUP BY c_mktsegment, event_type""",
    survey="§2.9/§7.5 streaming (stream-static dimension join)",
    note="the batch meaning of the stream-static enrichment join "
         "(streaming/joins.py:static_enrich): events enriched with "
         "the customer dim (user_id = c_custkey) then rolled up per "
         "(segment, event_type). The STATELESS streaming join — no "
         "watermark, no join state, dim broadcast per micro-batch — "
         "vs stream_interval_join's stateful one; left join so "
         "dim-miss events survive with a NULL segment group. "
         "stream==batch pinned in tests/test_streaming_joins.py; the "
         "value sum rides the exact-decimal rule")
def stream_static_enrich(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.joins import (
        static_enrich,
    )
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    dim = (t(spark, sf_dir, "customer")
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    return (static_enrich(ev, dim, "user_id")
            .groupBy("c_mktsegment", "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 4).alias("sum_value")))
