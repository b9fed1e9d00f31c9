"""Fourth coverage batch — engine-surface completion past the third:
selection aggregates (max_by/min_by), bitwise aggregates, ntile
bucketing, higher-order array lambdas, the NULL-semantics scalar
ladder, and the cross join.

None of these appear in the reference (its SQL surface stops at the
SURVEY §2 inventory); they are the "engine completeness" rows the
§2.7/§2.8 closing notes call out — a user of a general Spark engine
expects them, and each one is a distinct Catalyst code path worth
pinning against the oracle:

- max_by/min_by replace the W1 ROW_NUMBER-then-filter idiom with a
  one-pass partially-aggregated selection — at 100 TB that is the
  difference between a full per-partition sort and a mergeable agg;
- bitwise aggregates are exact integer ops (no FP comparability risk);
- ntile is the standard-defined bucket split (first buckets take the
  remainder) — same rule in Spark and DuckDB;
- higher-order functions (filter/exists/zip_with/aggregate) run as
  JVM codegen'd lambdas, the no-UDF path for array work;
- the NULL ladder pins the null-skipping semantics of
  least/greatest (both engines skip, returning NULL only when ALL
  inputs are NULL) and IS DISTINCT FROM (Spark: negated <=>);
- CROSS JOIN of two tiny inputs plans as a broadcast nested loop —
  fine at 5x3, and the shape AQE would warn about at scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


@register(
    "a25_min_max_by",
    """WITH ranked AS (
         SELECT o_orderstatus, o_orderkey,
                ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice DESC, o_orderkey DESC)
                    AS rn_top,
                ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice ASC, o_orderkey ASC)
                    AS rn_bot
         FROM orders)
       SELECT o_orderstatus,
              MAX(CASE WHEN rn_top = 1 THEN o_orderkey END) AS top_orderkey,
              MAX(CASE WHEN rn_bot = 1 THEN o_orderkey END) AS bot_orderkey
       FROM ranked
       GROUP BY o_orderstatus""",
    survey="§2.4 ext (selection aggregates)",
    note="max_by/min_by with a struct tiebreak (totalprice, orderkey): "
         "the one-pass mergeable replacement for the reference's "
         "ROW_NUMBER-rn=1 latest-per-key idiom (W1) — a partial "
         "aggregate per partition instead of a full partition sort, "
         "which is the 100 TB-friendly form. The struct ordering makes "
         "the winner deterministic under price ties; the oracle is the "
         "window rewrite DuckDB understands")
def a25_min_max_by(spark, sf_dir):
    tie = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.max_by("o_orderkey", tie).alias("top_orderkey"),
                 F.min_by("o_orderkey", tie).alias("bot_orderkey")))


@register(
    "a26_bitwise_agg",
    """SELECT o_orderpriority,
              bit_and(o_orderkey) AS key_and,
              bit_or(o_orderkey)  AS key_or,
              bit_xor(o_orderkey) AS key_xor,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM orders
       GROUP BY o_orderpriority""",
    survey="§2.4 ext (bitwise aggregates)",
    note="bit_and/bit_or/bit_xor over bigint keys per priority — exact "
         "integer aggregates (zero FP comparability risk), partially "
         "aggregated map-side like any algebraic agg; bit_xor is the "
         "classic checksum for set-reconciliation at scale")
def a26_bitwise_agg(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.bit_and("o_orderkey").alias("key_and"),
                 F.bit_or("o_orderkey").alias("key_or"),
                 F.bit_xor("o_orderkey").alias("key_xor"),
                 F.count("*").cast("bigint").alias("n")))


@register(
    "w8_ntile",
    """SELECT o_orderkey, o_orderstatus,
              ntile(4) OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice, o_orderkey) AS quartile
       FROM orders""",
    survey="§2.5 ext (ntile bucketing)",
    note="ntile(4) price quartiles per status — the standard bucket "
         "rule (first buckets absorb the remainder) is identical in "
         "Spark and DuckDB, and (o_totalprice, o_orderkey) is a total "
         "order so the assignment is deterministic; one shuffle on the "
         "partition key, same Window spine as w5/w7")
def w8_ntile(spark, sf_dir):
    w = (Window.partitionBy("o_orderstatus")
         .orderBy("o_totalprice", "o_orderkey"))
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus",
                    F.ntile(4).over(w).alias("quartile")))


@register(
    "f24_higher_order",
    """SELECT p_partkey,
              CAST(len(list_filter(range(1, p_size + 1),
                                   x -> x % 3 = 0)) AS BIGINT) AS n_div3,
              len(list_filter(range(1, p_size + 1),
                              x -> x * x = p_size)) > 0 AS has_root,
              CAST(list_sum(list_transform(range(1, p_size + 1),
                   i -> CAST(i AS BIGINT) * (p_size + 1 - i)))
                   AS BIGINT) AS dot_rev
       FROM part""",
    survey="§2.8 ext (higher-order array lambdas)",
    note="filter/exists/zip_with/aggregate over sequence(1, p_size) — "
         "the JVM-codegen lambda path for array work (no UDF): count "
         "of multiples of 3, perfect-square test, and the dot product "
         "of the sequence with its reverse folded through aggregate(). "
         "All integer-valued so engine-portable; the DuckDB oracle "
         "rewrites zip_with algebraically (element i of a zip_with "
         "reverse is i*(n+1-i)) and casts list_sum's HUGEINT back to "
         "BIGINT. Same lambda family the similarity ops build on "
         "(operators/similarity.py)")
def f24_higher_order(spark, sf_dir):
    seq = F.sequence(F.lit(1), F.col("p_size"))
    dot = F.aggregate(
        F.zip_with(seq, F.reverse(seq), lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (t(spark, sf_dir, "part")
            .select("p_partkey",
                    F.size(F.filter(seq, lambda x: x % 3 == 0))
                     .cast("bigint").alias("n_div3"),
                    F.exists(seq, lambda x: x * x == F.col("p_size"))
                     .alias("has_root"),
                    dot.alias("dot_rev")))


@register(
    "f26_null_ladder",
    """SELECT o_orderkey,
              coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_filled,
              o_orderstatus IS DISTINCT FROM nullif(o_orderstatus, 'O')
                  AS was_nulled,
              greatest(o_orderkey, o_custkey, NULL) AS hi_key,
              least(o_orderkey, NULL, o_custkey)    AS lo_key,
              CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                   THEN 'kept' ELSE 'erased' END AS nvl2_tag
       FROM orders""",
    survey="§2.8 ext (NULL-semantics ladder)",
    note="nullif / coalesce / IS DISTINCT FROM / least / greatest / "
         "nvl2 in one projection: pins that both engines SKIP NULL "
         "inputs in least/greatest (NULL only when all inputs are "
         "NULL — verified, not assumed), and that IS DISTINCT FROM is "
         "Spark's negated null-safe <=>. nvl2 has no DuckDB spelling, "
         "so the oracle uses its CASE definition. Pure projection, "
         "no shuffle")
def f26_null_ladder(spark, sf_dir):
    nulled = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    null_long = F.lit(None).cast("bigint")
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey",
                    F.coalesce(nulled, F.lit("open")).alias("status_filled"),
                    (~F.col("o_orderstatus").eqNullSafe(nulled))
                     .alias("was_nulled"),
                    F.greatest("o_orderkey", "o_custkey", null_long)
                     .alias("hi_key"),
                    F.least(F.col("o_orderkey"), null_long,
                            F.col("o_custkey")).alias("lo_key"),
                    F.nvl2(nulled, F.lit("kept"), F.lit("erased"))
                     .alias("nvl2_tag")))


@register(
    "w9_time_range_frame",
    """SELECT event_id, user_id,
              count(*) OVER w AS trailing_n,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                         AS DOUBLE), 6) AS trailing_sum
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                          AND CURRENT ROW)""",
    survey="§2.5 ext (time-range window frames)",
    note="trailing 1-hour count + exact-decimal sum per user via "
         "RANGE BETWEEN INTERVAL — the no-self-join formulation of "
         "trailing-window aggregates: one shuffle on user_id and a "
         "per-partition ordered pass, vs the naive range self-join "
         "that explodes quadratically in bucket size (j14's shape). "
         "Frames are bounded by raw microsecond timestamps on BOTH "
         "engines (an epoch-seconds rewrite would truncate "
         "sub-second precision and shift frame membership); the "
         "window SUM rides the repo's exact-decimal rule so FP "
         "addition order can't bite. SQL surface because interval "
         "frame bounds are SQL-only (Window.rangeBetween takes "
         "longs); WINDOW clause shares one frame definition")
def w9_time_range_frame(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """SELECT event_id, user_id,
                  count(*) OVER w AS trailing_n,
                  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                             AS DOUBLE), 6) AS trailing_sum
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW)""")


@register(
    "a27_stats_moments",
    """SELECT l_returnflag,
              CAST(COUNT(*) AS BIGINT) AS n,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(19,6)))
                         AS DOUBLE), 6) AS sx,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(19,6))
                             * CAST(l_quantity AS DECIMAL(19,6)))
                         AS DOUBLE), 6) AS sxx,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,6)))
                         AS DOUBLE), 6) AS sy,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(19,6))
                             * CAST(l_extendedprice AS DECIMAL(19,6)))
                         AS DOUBLE), 6) AS sxy
       FROM lineitem
       GROUP BY l_returnflag""",
    survey="§2.4 ext (statistical moments)",
    note="the distributed-moments formulation of variance/covariance/"
         "correlation: exact decimal (n, Σx, Σx², Σy, Σxy) per group — "
         "every derived statistic (var = (nΣx²-(Σx)²)/n(n-1), corr, "
         "covar, and their window/rollup variants) is driver-side "
         "arithmetic OVER these mergeable sums, which is exactly how "
         "a 1000-executor job should compute them: one partial-agg "
         "pass, no second scan, no per-group sort. The native "
         "stddev_samp/var_samp/corr/covar_samp functions divide, and "
         "quotients are the cross-engine rounding trap (registry "
         "module docstring), so they are pinned against DuckDB with "
         "tolerance in tests/test_functions.py instead of hashed here")
def a27_stats_moments(spark, sf_dir):
    # width 19 forces int128-backed decimals in DuckDB (<= 18 is
    # int64-backed and its multiply overflows in the INPUT type);
    # products land on (38,12) on both engines — exact for these
    # magnitudes (q*p <= 5e6, sums <= ~1e13)
    dx = F.col("l_quantity").cast("decimal(19,6)")
    dy = F.col("l_extendedprice").cast("decimal(19,6)")
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.sum(dx).cast("double"), 6).alias("sx"),
                 F.round(F.sum(dx * dx).cast("double"), 6).alias("sxx"),
                 F.round(F.sum(dy).cast("double"), 6).alias("sy"),
                 F.round(F.sum(dx * dy).cast("double"), 6).alias("sxy")))


@register(
    "a28_filtered_bool_aggs",
    """SELECT o_orderpriority,
              count(*) FILTER (WHERE o_totalprice > 100000)
                  AS n_big,
              count(*) FILTER (WHERE o_orderstatus = 'F')
                  AS n_final,
              bool_and(o_totalprice > 0) AS all_positive,
              bool_or(o_orderstatus = 'P') AS any_pending
       FROM orders
       GROUP BY o_orderpriority""",
    survey="§2.4 ext (filtered / boolean aggregates)",
    note="the FILTER-clause and boolean-aggregate surface: count_if "
         "(Spark's spelling of a filtered count), an explicit FILTER "
         "(WHERE) aggregate, and bool_and/bool_or — all partially "
         "aggregated map-side like any algebraic agg, and the "
         "SUM(CASE...) idiom the reference uses for the same job (A5, "
         "04_load_calendar.sql:37-40) expressed in its first-class "
         "form. Counts are exact integers, booleans exact — zero FP "
         "comparability risk. Runs through spark.sql to pin the SQL "
         "FILTER-clause parse path")
def a28_filtered_bool_aggs(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """SELECT o_orderpriority,
                  count_if(o_totalprice > 100000) AS n_big,
                  count(*) FILTER (WHERE o_orderstatus = 'F')
                      AS n_final,
                  bool_and(o_totalprice > 0) AS all_positive,
                  bool_or(o_orderstatus = 'P') AS any_pending
           FROM orders
           GROUP BY o_orderpriority""")


@register(
    "j15_cross_join",
    """SELECT r_name, s.o_orderstatus
       FROM region CROSS JOIN
            (SELECT DISTINCT o_orderstatus FROM orders) s""",
    survey="§2.3 ext (cross join)",
    note="explicit CROSS JOIN of two tiny inputs (5 regions x 3 "
         "statuses) — the only reference-absent join type (SURVEY "
         "§2.3 closing note); plans as BroadcastNestedLoopJoin, which "
         "is exactly right for literal-sized sides and exactly the "
         "shape to avoid for anything larger (j14's bucketization is "
         "the at-scale alternative)")
def j15_cross_join(spark, sf_dir):
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "f27_from_json_struct",
    """SELECT event_type,
              CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS BIGINT) AS k_sum,
              count(*) FILTER (WHERE CAST(json_extract(props, '$.k')
                                          AS BIGINT) % 7 = 0) AS k_div7,
              max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
       FROM events
       GROUP BY event_type""",
    survey="§2.8 ext (semi-structured: from_json)",
    note="typed JSON parsing: from_json(props, 'k INT') to a real "
         "struct column, then aggregate over the typed field — the "
         "schema-declared counterpart of f17's get_json_object string "
         "extraction (declare once, prune/push like any column, vs "
         "re-parse per path expression). Malformed documents become "
         "NULL structs (PERMISSIVE), the same null-on-failure spine "
         "as try_cast (SURVEY §1.3). Integer-valued everywhere, so "
         "engine-portable; oracle extracts with DuckDB's json_extract")
def f27_from_json_struct(spark, sf_dir):
    parsed = F.from_json(F.col("props"), "k INT")
    k = parsed.getField("k").cast("bigint")
    return (t(spark, sf_dir, "events")
            .withColumn("k", k)
            .groupBy("event_type")
            .agg(F.sum("k").alias("k_sum"),
                 F.count_if(F.col("k") % 7 == 0).alias("k_div7"),
                 F.max("k").alias("k_max")))


@register(
    "a29_grouping_id",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
              CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
              CAST(2 * grouping(o_orderstatus)
                   + grouping(o_orderpriority) AS BIGINT) AS gid,
              CAST(count(*) AS BIGINT) AS n
       FROM orders
       GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    survey="§2.4 ext (grouping / grouping_id)",
    note="the disambiguation companion to a16's ROLLUP: grouping() "
         "flags and grouping_id() distinguish a subtotal NULL from a "
         "NULL data value — without them rollup output is ambiguous "
         "the moment a grouping column is nullable. Spark's "
         "grouping_id() bit order (leftmost column = most significant "
         "bit) is reproduced in the oracle as 2*g_a + g_b; same "
         "single Expand + single shuffle plan as a16/a21")
def a29_grouping_id(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.grouping("o_orderstatus").cast("bigint")
                  .alias("g_status"),
                 F.grouping("o_orderpriority").cast("bigint")
                  .alias("g_prio"),
                 F.grouping_id().cast("bigint").alias("gid"),
                 F.count("*").cast("bigint").alias("n")))


@register(
    "set_union_by_name",
    """SELECT c_custkey AS entity_key, c_acctbal AS acctbal,
              'customer' AS src
       FROM customer
       UNION ALL
       SELECT n_nationkey AS entity_key, CAST(NULL AS DOUBLE) AS acctbal,
              'nation' AS src
       FROM nation""",
    survey="§2.7 ext (unionByName, missing columns)",
    note="schema-aligned union: unionByName(allowMissingColumns=True) "
         "fills the absent column with NULL and aligns by NAME, not "
         "position — the safe union for evolving schemas (a "
         "positional union of reordered columns corrupts silently; "
         "SURVEY §2.7 exposes union for capability parity). The "
         "oracle is the explicit NULL-padded UNION ALL; acctbal "
         "values are pure selection so raw doubles compare exactly")
def set_union_by_name(spark, sf_dir):
    cust = (t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("entity_key"),
                    F.col("c_acctbal").alias("acctbal"),
                    F.lit("customer").alias("src")))
    nat = (t(spark, sf_dir, "nation")
           .select(F.col("n_nationkey").alias("entity_key"),
                   F.lit("nation").alias("src")))
    return cust.unionByName(nat, allowMissingColumns=True)
