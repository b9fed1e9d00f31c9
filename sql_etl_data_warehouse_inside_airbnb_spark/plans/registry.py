"""Declared-query registry (SURVEY §2 inventory → runnable queries).

Each entry pairs a Spark-first builder ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle. Conventions that
make the driver's order-insensitive value-hash comparison stable:

- every computed column is aliased IDENTICALLY on both sides;
- compared aggregates over doubles are EXACT decimal sums (FP sums
  are order-dependent) and contain NO division: a quotient landing
  on a rounding tie rounds differently across engines at any scale
  (Spark decimal HALF_UP vs double-intermediate rounding) — emit
  sum+count and derive the mean outside the compared columns;
  min/max compare as raw doubles (selection, not arithmetic);
- integer widths are aligned (counts/date-parts cast to BIGINT —
  DuckDB's natural width);
- no nondeterministic output: every top-k has a total-order tiebreak,
  "random" sampling is keyed modulo, dedup winners are deterministic;
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  global-by-default behavior.

Names key the CORRECTNESS_r{N}.json rows and map 1:1 to SURVEY §2 ids.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    TRUTHY_LOADER,
    norm_bool,
    parse_host_location,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
    tsql_week_end,
    tsql_week_start,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import merge_upsert
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None → driver does rows-only check
    survey: str = ""            # SURVEY §2 operator ids covered
    note: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, survey: str = "", note: str = "",
             tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, survey, note, tags)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# The finite-values guard (r12 hostile-data convention): float64 max,
# whose repr both engines parse to the same bit pattern. `x BETWEEN
# -DBL_MAX AND DBL_MAX` keeps exactly the finite non-NULL doubles —
# ±Inf are outside the range and NaN fails `<= DBL_MAX` because both
# engines order NaN above every value. One shared literal so the
# 17-digit constant cannot drift between the Spark and oracle sides
# of an entry (post-review: it was hand-repeated 8x).
DBL_MAX = 1.7976931348623157e308
DBL_MAX_SQL = "1.7976931348623157E308"


def finite_sql(col: str) -> str:
    """SQL fragment keeping only finite (non-NULL, non-NaN, non-Inf)
    values of a double column — identical semantics in Spark SQL and
    DuckDB (see DBL_MAX note)."""
    return f"{col} BETWEEN -{DBL_MAX_SQL} AND {DBL_MAX_SQL}"


def finite_case(col: str) -> str:
    """SQL: the column's value where finite, else NULL — the shared
    NULLs-out wrapper of the quantile/median family (r13 review: it
    was hand-repeated ~9x across five entries; one body so the Spark
    and oracle sides of an entry cannot drift, same rationale as
    DBL_MAX)."""
    return f"CASE WHEN {finite_sql(col)} THEN {col} END"


def finite_col(col: str):
    """Spark Column twin of finite_case."""
    return F.when(F.expr(finite_sql(col)), F.col(col))


def exact_sum(col: str, digits: int):
    """Order-independent SUM over a double column: sum exactly in
    decimal, cast back to double, round. FP addition is not
    associative, so round(sum(double)) can straddle a half-ulp between
    engines/partitionings; the decimal sum can't.
    SQL twin: round(CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE), d)."""
    return F.round(F.sum(F.col(col).cast("decimal(18,6)"))
                   .cast("double"), digits)



# ---------------------------------------------------------------- scans

@register(
    "s1_scan_project",
    "SELECT r_regionkey, r_name FROM region",
    survey="S1/S2",
    note="schema-on-read scan + projection; full table round-trip")
def s1_scan_project(spark, sf_dir):
    return t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "s4_limited_scan",
    "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1000",
    survey="S4/O1", note="deterministic head sample (ordered limit)")
def s4_limited_scan(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .orderBy("o_orderkey").limit(1000))


# ------------------------------------------------- projections / filters

@register(
    "p1_column_prune",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    survey="P1/P3", note="keep-list projection; scan must prune columns")
def p1_column_prune(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")


@register(
    "p4_trycast_filter",
    """SELECT event_id,
              TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
       FROM events
       WHERE TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
             IS NOT NULL""",
    survey="P4/F14", note="null-safe cast filter over semi-structured props")
def p4_trycast_filter(spark, sf_dir):
    k = F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("bigint")
    return (t(spark, sf_dir, "events")
            .select("event_id", k.alias("k"))
            .filter(F.col("k").isNotNull()))


@register(
    "p6_between",
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date FROM orders
       WHERE CAST(o_orderdate AS DATE)
             BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'""",
    survey="P6", note="range predicate; pushes to parquet scan")
def p6_between(spark, sf_dir):
    d = F.to_date("o_orderdate")
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", d.alias("o_date"))
            .filter(d.between("1996-01-01", "1997-12-31")))


@register(
    "p7_isin",
    """SELECT c_custkey, c_mktsegment FROM customer
       WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')""",
    survey="P7", note="IN-list predicate")
def p7_isin(spark, sf_dir):
    return (t(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")))


@register(
    "p9_eq_lookup",
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
    survey="P9", note="equality lookup")
def p9_eq_lookup(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_custkey"))


@register(
    "p10_threshold",
    """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
       FROM lineitem WHERE l_quantity > 45.0""",
    survey="P10", note="threshold predicate on numeric")
def p10_threshold(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") > 45.0)
            .select("l_orderkey", "l_linenumber",
                    F.round("l_quantity", 2).alias("qty")))


@register(
    "p8_interval_overlap",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE CAST(date_trunc('week', CAST(l_shipdate AS DATE) + INTERVAL 1 DAY) AS DATE)
               <= DATE '1997-06-30'
         AND CAST(date_trunc('week', CAST(l_shipdate AS DATE) + INTERVAL 1 DAY) AS DATE)
               + 6 >= DATE '1997-06-01'""",
    survey="P8/F8", note="interval-overlap predicate on derived week bounds")
def p8_interval_overlap(spark, sf_dir):
    ws, we = tsql_week_start("l_shipdate"), tsql_week_end("l_shipdate")
    return (t(spark, sf_dir, "lineitem")
            .filter((ws <= F.lit("1997-06-30").cast("date"))
                    & (we >= F.lit("1997-06-01").cast("date")))
            .select("l_orderkey", "l_linenumber"))


# ----------------------------------------------------------------- joins

@register(
    "j1_fact_dim_join",
    """SELECT l.l_orderkey, l.l_linenumber, s.s_name, n.n_name
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey""",
    survey="J1/J10", note="fact→dim chain; both dims broadcast, zero fact shuffles")
def j1_fact_dim_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .select("l_orderkey", "l_linenumber", "s_name", "n_name"))


@register(
    "j2_derived_date_join",
    """WITH bounds AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                              max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
         d AS (SELECT unnest(range((SELECT lo FROM bounds),
                                   (SELECT hi FROM bounds) + INTERVAL 1 DAY,
                                   INTERVAL 1 DAY))::DATE AS full_date)
       SELECT o.o_orderkey, d.full_date
       FROM orders o JOIN d ON CAST(o.o_orderdate AS DATE) = d.full_date""",
    survey="J2/F7/F10",
    note="join on derived date key against a generated date dimension")
def j2_derived_date_join(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(F.min(F.to_date("o_orderdate")).alias("lo"),
                        F.max(F.to_date("o_orderdate")).alias("hi"))
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("full_date"))
    return (orders.join(F.broadcast(days),
                        F.to_date("o_orderdate") == F.col("full_date"))
            .select("o_orderkey", "full_date"))


@register(
    "j4_left_anti",
    """SELECT c.c_custkey, c.c_name FROM customer c
       LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
         ON c.c_custkey = o.o_custkey
       WHERE o.o_custkey IS NULL""",
    survey="J4/J5", note="insert-if-absent anti join (customers without orders)")
def j4_left_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "j6_left_semi",
    """SELECT c.c_custkey, c.c_mktsegment FROM customer c
       WHERE c.c_custkey IN (SELECT o_custkey FROM orders)""",
    survey="J6/J11", note="semi join (customers with ≥1 order)")
def j6_left_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_mktsegment"))


@register(
    "j7_agg_join",
    """SELECT c.c_custkey, c.c_name, a.order_count, a.total_spend
       FROM customer c
       JOIN (SELECT o_custkey, count(*) AS order_count,
                    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_spend
             FROM orders GROUP BY o_custkey) a
         ON c.c_custkey = a.o_custkey""",
    survey="J7/A8", note="join against a derived aggregate")
def j7_agg_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    agg = (t(spark, sf_dir, "orders").groupBy("o_custkey")
           .agg(F.count("*").alias("order_count"),
                exact_sum("o_totalprice", 2).alias("total_spend")))
    return (c.join(agg, c.c_custkey == agg.o_custkey)
            .select("c_custkey", "c_name", "order_count", "total_spend"))


@register(
    "j8_merge_upsert",
    """WITH delta AS (
         SELECT c_custkey, c_name || '_u' AS c_name, c_nationkey,
                round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
         FROM customer WHERE c_custkey % 7 = 0
         UNION ALL
         SELECT c_custkey + 10000000000, c_name || '_n', c_nationkey,
                round(c_acctbal, 2), c_mktsegment
         FROM customer WHERE c_custkey % 11 = 0)
       SELECT * FROM (
         SELECT c.c_custkey, c.c_name, c.c_nationkey,
                round(c.c_acctbal, 2) AS c_acctbal, c.c_mktsegment
         FROM customer c
         LEFT JOIN delta d ON c.c_custkey = d.c_custkey
         WHERE d.c_custkey IS NULL
         UNION ALL SELECT * FROM delta)""",
    survey="J8/A13",
    note="MERGE upsert join-rewrite: source wins on match, inserts new keys")
def j8_merge_upsert(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment")
    updates = (cust.filter(F.col("c_custkey") % 7 == 0)
               .withColumn("c_name", F.concat("c_name", F.lit("_u")))
               .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)))
    inserts = (cust.filter(F.col("c_custkey") % 11 == 0)
               .withColumn("c_custkey", F.col("c_custkey") + 10_000_000_000)
               .withColumn("c_name", F.concat("c_name", F.lit("_n"))))
    delta = updates.unionByName(inserts)
    return merge_upsert(cust, delta, "c_custkey", count_actions=False).df


@register(
    "j9_update_from_join",
    """SELECT d.doc_id,
              CASE WHEN u.new_lang IS NOT NULL THEN u.new_lang
                   ELSE d.lang END AS lang
       FROM documents d
       LEFT JOIN (SELECT doc_id, 'xx' AS new_lang FROM documents
                  WHERE source = 'src0') u
         ON d.doc_id = u.doc_id""",
    survey="J9", note="UPDATE-from-join as join + coalesce overwrite")
def j9_update_from_join(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    upd = (d.filter(F.col("source") == "src0")
           .select("doc_id", F.lit("xx").alias("new_lang")))
    return (d.join(upd, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("new_lang", "lang").alias("lang")))


# ----------------------------------------------------------- aggregates

@register(
    "a1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              count(*) AS n_rows,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price,
              round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-12-01'
       GROUP BY l_returnflag, l_linestatus""",
    survey="A1/A2", note="TPC-H Q1-shaped multi-key hash aggregate")
def a1_pricing_summary(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    # r13: single-row-group scan = one task; fan_out parallelizes the
    # decimal aggregation (see tpch_q1_pricing_summary — same shape,
    # measured 2x there). Exact sums => bit-identical output.
    return (fan_out(t(spark, sf_dir, "lineitem")
                    .filter(F.to_date("l_shipdate") <= F.lit("1998-12-01")),
                    "l_orderkey")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n_rows"),
                 exact_sum("l_quantity", 2).alias("sum_qty"),
                 exact_sum("l_extendedprice", 2).alias("sum_price"),
                 exact_sum("l_discount", 2).alias("sum_disc")))


@register(
    "a3_count_distinct",
    """SELECT o_orderpriority,
              count(DISTINCT o_custkey) AS unique_customers,
              count(*) AS n_orders,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price
       FROM orders GROUP BY o_orderpriority""",
    survey="A3", note="grouped COUNT DISTINCT (vw_host_activity shape)")
def a3_count_distinct(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("unique_customers"),
                 F.count("*").alias("n_orders"),
                 exact_sum("o_totalprice", 2).alias("sum_price")))


@register(
    "a4_global_count_distinct",
    "SELECT count(DISTINCT o_custkey) AS unique_custkeys FROM orders",
    survey="A4/A11", note="global exact distinct count")
def a4_global_count_distinct(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .agg(F.countDistinct("o_custkey").alias("unique_custkeys")))


@register(
    "a5_conditional_agg",
    """SELECT l_linestatus,
              CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_returned,
              count(*) AS n_total
       FROM lineitem GROUP BY l_linestatus""",
    survey="A5", note="pivot-style SUM(CASE) conditional aggregate")
def a5_conditional_agg(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                  .alias("n_returned"),
                 F.count("*").alias("n_total")))


@register(
    "a6_money_clean_agg",
    """SELECT l_returnflag,
              round(CAST(sum(TRY_CAST(
                  regexp_replace(
                      '$' || CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR),
                      '[$,]', '', 'g')
                  AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_clean_price,
              CAST(count(TRY_CAST(
                  regexp_replace(
                      '$' || CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR),
                      '[$,]', '', 'g')
                  AS DECIMAL(12,2))) AS BIGINT) AS n_clean
       FROM lineitem GROUP BY l_returnflag""",
    survey="A6/F2/F15",
    note="reference money-cleaning aggregate: strip $/, then TRY_CAST "
         "DECIMAL. AVG is computed as exact-decimal SUM / COUNT with one "
         "final double division — decimal-AVG scale rules differ between "
         "engines and round on a half-boundary (SURVEY §7.3 decimals)")
def a6_money_clean_agg(spark, sf_dir):
    money = F.concat(F.lit("$"),
                     F.col("l_extendedprice").cast("decimal(12,2)").cast("string"))
    cleaned = F.regexp_replace(money, r"[$,]", "").try_cast("decimal(12,2)")
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.sum(cleaned).cast("double"), 2)
                  .alias("sum_clean_price"),
                 F.count(cleaned).alias("n_clean")))


@register(
    "a7_weekly_rollup",
    """SELECT l_suppkey,
              CAST(date_trunc('week', CAST(l_shipdate AS DATE) + INTERVAL 1 DAY)
                   AS DATE) AS week_start,
              CAST(date_trunc('week', CAST(l_shipdate AS DATE) + INTERVAL 1 DAY)
                   AS DATE) + 6 AS week_end,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS price_sum_per_week,
              CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS returned_per_week,
              count(*) AS items_per_week
       FROM lineitem GROUP BY 1, 2, 3""",
    survey="A7/F8/A5/A6",
    note="fact_calendar weekly rollup with exact T-SQL week bucketing "
         "(Sunday → next Monday's week). Compared aggregate is the "
         "exact decimal SUM, emitted as round(CAST(... AS DOUBLE), 2) "
         "on both sides: the sum itself is exact in DECIMAL(18,2), but "
         "the driver's hash canonicalizes DuckDB DECIMAL output through "
         "pandas float64 ('15325.8') while Spark keeps Decimal "
         "('15325.80') — the same green-path dtype normalization "
         "a6_money_clean_agg uses. An AVG would be worse: division "
         "quotients on rounding ties diverge across engines at ANY "
         "scale (SURVEY §7.3 decimals)")
def a7_weekly_rollup(spark, sf_dir):
    # week_end is functionally dependent on week_start: derive it after
    # the aggregate so the shuffle key stays (suppkey, week_start) and
    # the per-row date math runs once, not twice. The final select pins
    # the output column order to the oracle's (the driver's value hash
    # is column-position-sensitive) without changing the plan.
    # r13: measured fan_out here and REJECTED it — with ~291k
    # (suppkey, week) groups the map-side partial aggregate barely
    # collapses rows, so pre-spreading the one-task scan just moves
    # the same bytes through an extra exchange (interleaved A/B:
    # 1.55 s vs 1.54 s). Contrast tpch_q1/a1 (6 groups), where the
    # same move is ~1.7x.
    # r14 (guide §2.3 shuffle fewer bytes / narrower types): the price
    # sum runs in exact int64 CENTS instead of DECIMAL(18,2) — the
    # decimal partial sum widens to DECIMAL(28,2), which exceeds the
    # 8-byte inline long and ships as a 16-byte byte-array per group
    # through the 291k-group exchange; cents are one long. Bit-exact:
    # prices carry exactly 2 real decimals (the a36/ts5 finding), so
    # cents are exact int64 (|sum| < 2^53 at any plausible group
    # size), sum order-independent, and round(sum_cents/100.0, 2) ==
    # round(CAST(decimal_sum AS DOUBLE), 2) because both divide paths
    # produce the nearest double to the same rational n/100 (int64 ->
    # double is exact below 2^53; double division is correctly
    # rounded; decimal->double casts to the same nearest double).
    # Oracle SQL unchanged; hash green at 3 SFs.
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_suppkey",
                     tsql_week_start("l_shipdate").alias("week_start"))
            .agg(F.round(F.sum(cents) / F.lit(100), 2)
                  .alias("price_sum_per_week"),
                 F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                  .alias("returned_per_week"),
                 F.count("*").alias("items_per_week"))
            .withColumn("week_end", F.date_add("week_start", 6))
            .select("l_suppkey", "week_start", "week_end",
                    "price_sum_per_week", "returned_per_week",
                    "items_per_week"))


@register(
    "a9_having_dups",
    """SELECT l_orderkey, count(*) AS n FROM lineitem
       GROUP BY l_orderkey HAVING count(*) > 1""",
    survey="A9", note="dup detection: GROUP BY + HAVING")
def a9_having_dups(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1))


@register(
    "a10_minmax",
    """SELECT min(CAST(o_orderdate AS DATE)) AS min_date,
              max(CAST(o_orderdate AS DATE)) AS max_date,
              max(o_orderkey) AS max_key,
              count(*) AS n_rows
       FROM orders""",
    survey="A10/A11", note="global MIN/MAX scalars")
def a10_minmax(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .agg(F.min(F.to_date("o_orderdate")).alias("min_date"),
                 F.max(F.to_date("o_orderdate")).alias("max_date"),
                 F.max("o_orderkey").alias("max_key"),
                 F.count("*").alias("n_rows")))


@register(
    "a12_distinct_count",
    """SELECT count(*) AS n FROM
       (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)""",
    survey="A12/O7", note="COUNT over DISTINCT subquery")
def a12_distinct_count(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey").distinct()
            .agg(F.count("*").alias("n")))


@register(
    "a14_profile",
    """SELECT count(*) AS n_rows,
              count(o_custkey) AS n_custkey_nonnull,
              count(DISTINCT o_orderstatus) AS n_status,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_price,
              min(o_totalprice) AS min_price,
              max(o_totalprice) AS max_price
       FROM orders""",
    survey="A14", note="EDA profiling aggregates (null counts, describe)")
def a14_profile(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .agg(F.count("*").alias("n_rows"),
                 F.count("o_custkey").alias("n_custkey_nonnull"),
                 F.countDistinct("o_orderstatus").alias("n_status"),
                 exact_sum("o_totalprice", 2).alias("sum_price"),
                 F.min("o_totalprice").alias("min_price"),
                 F.max("o_totalprice").alias("max_price")))


# -------------------------------------------------------------- windows

@register(
    "w1_latest_per_key",
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date
       FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                    row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1""",
    survey="W1", note="dedup-by-recency: latest order per customer "
                      "(dim_hosts shape, deterministic tiebreak)")
def w1_latest_per_key(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (t(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("o_custkey", "o_orderkey",
                    F.to_date("o_orderdate").alias("o_date")))


@register(
    "w2_first_per_group",
    """SELECT l_orderkey, l_linenumber, l_partkey
       FROM (SELECT l_orderkey, l_linenumber, l_partkey,
                    row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber, l_partkey) AS rn
             FROM lineitem) WHERE rn = 1""",
    survey="W2",
    note="arbitrary-winner dedup made deterministic; l_linenumber alone is "
         "NOT unique per order in the testdata, so the tiebreak must "
         "totally order the projected columns")
def w2_first_per_group(spark, sf_dir):
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (t(spark, sf_dir, "lineitem")
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("l_orderkey", "l_linenumber", "l_partkey"))


# --------------------------------------------------- sorts / limits / sampling

@register(
    "o2_topk",
    """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    survey="O2", note="true top-k with total-order tiebreak "
                      "(plans as TakeOrderedAndProject)")
def o2_topk(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
            .limit(20))


@register(
    "o3_keyed_sample",
    """SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 < 2""",
    survey="O3/O4/O5",
    note="deterministic keyed sample (ORDER BY NEWID() / seeded-sample "
         "replacement that both engines reproduce)")
def o3_keyed_sample(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 10 < 2)
            .select("o_orderkey", "o_custkey"))


# ------------------------------------------------------------- set ops

@register(
    "set_union_distinct",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
       UNION
       SELECT c_custkey FROM customer WHERE c_acctbal > 5000""",
    survey="§2.7", note="UNION (distinct) of two slices")
def set_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_except",
    """SELECT c_custkey FROM customer
       EXCEPT
       SELECT o_custkey AS c_custkey FROM orders""",
    survey="§2.7", note="EXCEPT (same result as the J4 anti join, set form)")
def set_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@register(
    "set_intersect",
    """SELECT c_custkey FROM customer
       INTERSECT
       SELECT o_custkey AS c_custkey FROM orders""",
    survey="§2.7", note="INTERSECT")
def set_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


# ------------------------------------------------------ scalar functions

@register(
    "f5_parse_location",
    """SELECT n_nationkey,
              n_name || ', ' || r_name AS loc,
              CASE WHEN len(string_split(n_name || ', ' || r_name, ',')) <= 1
                   THEN 'Unknown'
                   ELSE regexp_replace(n_name || ', ' || r_name,
                                       '\\s*,\\s*[^,]+$', '', 'g') END AS host_city,
              trim(regexp_extract(n_name || ', ' || r_name, '([^,]+)$', 1))
                  AS host_country
       FROM nation JOIN region ON n_regionkey = r_regionkey""",
    survey="F5/U1", note="host_location comma-split parse as pure column expr")
def f5_parse_location(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    df = (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("n_nationkey",
                  F.concat_ws(", ", "n_name", "r_name").alias("loc")))
    city, country = parse_host_location("loc")
    return df.select("n_nationkey", "loc", city, country)


@register(
    "f9_date_parts",
    """SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date,
              CAST(year(o_orderdate) AS BIGINT) AS year,
              CAST(quarter(o_orderdate) AS BIGINT) AS quarter,
              CAST(month(o_orderdate) AS BIGINT) AS month,
              monthname(o_orderdate) AS month_name,
              CAST(day(o_orderdate) AS BIGINT) AS day,
              dayname(o_orderdate) AS day_name,
              isodow(o_orderdate) IN (6, 7) AS is_weekend
       FROM orders""",
    survey="F7/F9", note="dim_dates date-part derivation")
def f9_date_parts(spark, sf_dir):
    d = F.to_date("o_orderdate")
    return (t(spark, sf_dir, "orders")
            .select(d.alias("full_date"),
                    F.year(d).cast("bigint").alias("year"),
                    F.quarter(d).cast("bigint").alias("quarter"),
                    F.month(d).cast("bigint").alias("month"),
                    F.date_format(d, "MMMM").alias("month_name"),
                    F.dayofmonth(d).cast("bigint").alias("day"),
                    F.date_format(d, "EEEE").alias("day_name"),
                    F.dayofweek(d).isin(1, 7).alias("is_weekend"))
            .distinct())


@register(
    "f10_date_dimension",
    """WITH bounds AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                              max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
         d AS (SELECT unnest(range((SELECT lo FROM bounds),
                                   (SELECT hi FROM bounds) + INTERVAL 1 DAY,
                                   INTERVAL 1 DAY))::DATE AS full_date)
       SELECT CAST(row_number() OVER (ORDER BY full_date) AS BIGINT) AS date_id,
              full_date,
              CAST(year(full_date) AS BIGINT) AS year,
              CAST(month(full_date) AS BIGINT) AS month,
              isodow(full_date) IN (6, 7) AS is_weekend
       FROM d""",
    survey="F10/F9", note="gap-free date dimension: sequence + explode + "
                          "deterministic surrogate key")
def f10_date_dimension(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(F.min(F.to_date("o_orderdate")).alias("lo"),
                        F.max(F.to_date("o_orderdate")).alias("hi"))
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("full_date"))
    w = Window.orderBy("full_date")
    return days.select(
        F.row_number().over(w).cast("bigint").alias("date_id"),
        "full_date",
        F.year("full_date").cast("bigint").alias("year"),
        F.month("full_date").cast("bigint").alias("month"),
        F.dayofweek("full_date").isin(1, 7).alias("is_weekend"))


@register(
    "f13_bool_norm",
    """SELECT CASE WHEN lower(trim(CASE WHEN l_returnflag = 'R' THEN 't'
                                        WHEN l_returnflag = 'A' THEN 'TRUE'
                                        ELSE 'no' END))
                   IN ('true', '1', 't', 'y', 'yes')
              THEN TRUE ELSE FALSE END AS is_truthy,
              count(*) AS n
       FROM lineitem GROUP BY 1""",
    survey="F13/U3/U5", note="parameterized boolean-ladder normalizer")
def f13_bool_norm(spark, sf_dir):
    boolish = (F.when(F.col("l_returnflag") == "R", "t")
                .when(F.col("l_returnflag") == "A", "TRUE")
                .otherwise("no"))
    return (t(spark, sf_dir, "lineitem")
            .select(norm_bool(boolish, TRUTHY_LOADER).alias("is_truthy"))
            .groupBy("is_truthy").agg(F.count("*").alias("n")))


@register(
    "f3_truncate_substr",
    """SELECT doc_id, substr(text, 1, 50) AS head50,
              CAST(len(substr(text, 1, 50)) AS BIGINT) AS head_len,
              substr(text, 7, 6) AS part2
       FROM documents""",
    survey="F3/F4", note="NVARCHAR(n) truncation + LEFT/SUBSTRING id splits")
def f3_truncate_substr(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.substring("text", 1, 50).alias("head50"),
                    F.length(F.substring("text", 1, 50)).cast("bigint")
                     .alias("head_len"),
                    F.substring("text", 7, 6).alias("part2")))


@register(
    "f15_trycast_decimal",
    """SELECT event_type,
              count(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1)
                    AS DECIMAL(10,2))) AS n_castable,
              round(CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1)
                    AS DECIMAL(10,2))) AS DOUBLE), 2) AS sum_k
       FROM events GROUP BY event_type""",
    survey="F15/F14/P4",
    note="try_cast-to-decimal ladder with null-on-failure. Compared "
         "columns are count + exact decimal SUM — not the mean: a "
         "rounded quotient in a compared column is the forbidden "
         "cross-engine trap (Spark and DuckDB round(double) disagree "
         "on tie-landing quotients; module docstring), and the mean "
         "derives from (sum, count) outside the hash")
def f15_trycast_decimal(spark, sf_dir):
    k = (F.regexp_extract("props", r'"k": (\d+)', 1)
         .try_cast("decimal(10,2)"))
    return (t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(k).alias("n_castable"),
                 F.round(F.sum(k).cast("double"), 2).alias("sum_k")))
