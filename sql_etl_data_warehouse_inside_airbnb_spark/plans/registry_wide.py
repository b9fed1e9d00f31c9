"""Fourth coverage batch — surface widening past the §2 inventory:

- document fingerprinting by TRUE rolling hash (Rabin-Karp fold) and
  by winnowing (SIGMOD'03 window-min over k-gram hashes) — the two
  fingerprint families a training-data dedup pipeline layers between
  exact-md5 (ext_fingerprint) and MinHash/SimHash;
- scalar and correlated (EXISTS) subqueries — the reference only has
  IN/NOT IN subqueries (J5/J6); these complete the subquery surface;
- value-window analytics (first/last/nth_value with explicit frames)
  and distribution ranks (percent_rank/cume_dist), completing §2.5
  beyond w3/w4/w5;
- explicit GROUPING SETS — the third grouping-set form next to
  ROLLUP (a16) and CUBE (a17), via the first-class
  ``DataFrame.groupingSets`` API.

Determinism notes follow the registry conventions: percent_rank /
cume_dist are quotients, so the COMPARED columns are their exact
integer rescalings (rank-1 and running count), never the raw ratio;
the scalar-subquery threshold is division-free (price*n > sum, both
sides exact).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    rolling_hash,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
    winnow_fingerprints,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    finite_case,
    register,
    t,
)

# ------------------------------------------------------- fingerprints

# DuckDB twin of functions.text.rolling_hash: list_reduce's no-init
# fold equals aggregate's init-0 fold because 0*31 + x1 == x1.
_RH_SQL = """CASE WHEN length(substr(text, 1, 64)) = 0 THEN 0 ELSE
    list_reduce(
      list_transform(range(1, length(substr(text, 1, 64)) + 1),
        i -> CAST(ascii(substr(substr(text, 1, 64),
                               CAST(i AS INTEGER), 1)) AS BIGINT)),
      (a, b) -> (a * 31 + b) % 1000000007) END"""


@register(
    "ext_rolling_hash_fingerprint",
    f"""WITH rh AS (SELECT lang, source, {_RH_SQL} AS fp FROM documents)
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fp,
               MIN(fp) AS min_fp, MAX(fp) AS max_fp
        FROM rh GROUP BY lang, source""",
    survey="§7.5 text/dedup (rolling hash)",
    note="TRUE Rabin-Karp rolling-hash fingerprint (base-31 mod 1e9+7 "
         "fold over codepoints, functions/text.py:rolling_hash) — pure "
         "aggregate() column expression, no UDF; distinct-fp counts "
         "per (lang, source) make it a dedup cardinality probe")
def ext_rolling_hash_fingerprint(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (docs.select("lang", "source",
                        rolling_hash("text").alias("fp"))
            .groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("fp").alias("n_fp"),
                 F.min("fp").alias("min_fp"),
                 F.max("fp").alias("max_fp")))


# DuckDB mirror of operators/dedup.py:winnow_fingerprints' k-gram
# hash stage (k=5, first-8-hex-md5) — ONE definition shared by both
# winnowing oracles so the gram semantics can't drift per entry
_WINNOW_GRAMS_SQL = """g AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
                    substr(md5(substr(s, CAST(u.i AS INTEGER), 5)), 1, 8)
                      AS gram_hash
             FROM s, LATERAL unnest(
               range(1, greatest(length(s) - 4, 1) + 1)) AS u(i))"""


@register(
    "ext_winnow_fingerprint",
    f"""WITH s AS (SELECT doc_id, substr(text, 1, 64) AS s FROM documents),
       {_WINNOW_GRAMS_SQL},
       w AS (SELECT doc_id,
                    min(gram_hash) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
             FROM g)
       SELECT doc_id, CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fp,
              MIN(fp) AS min_fp, MAX(fp) AS max_fp
       FROM w GROUP BY doc_id""",
    survey="§7.5 dedup (winnowing)",
    note="winnowing fingerprint set (window-min over k-gram md5 "
         "hashes, k=5 w=4; operators/dedup.py:winnow_fingerprints) — "
         "guarantees any shared run >= w+k-1 chars shares a "
         "fingerprint; single shuffle, partitioned by doc")
def ext_winnow_fingerprint(spark, sf_dir):
    fps = winnow_fingerprints(t(spark, sf_dir, "documents"),
                              "doc_id", "text", k=5, window=4,
                              prefix_len=64)
    return (fps.groupBy("doc_id")
            .agg(F.countDistinct("fp").alias("n_fp"),
                 F.min("fp").alias("min_fp"),
                 F.max("fp").alias("max_fp")))


# --------------------------------------------------------- subqueries

@register(
    "sq_scalar_threshold",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice * (SELECT COUNT(*) FROM orders) >
             (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     AS DOUBLE) FROM orders)""",
    survey="§2.2 ext (scalar subquery)",
    note="orders above the global mean price via a scalar subquery — "
         "division-free form (price*n > sum: both sides exact, so the "
         "cross-engine mean-rounding trap can't bite); Spark plans the "
         "scalar as a broadcast, no per-row recompute")
def sq_scalar_threshold(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    stats = o.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
         .cast("double").alias("s"))
    return (o.join(F.broadcast(stats))
            .filter(F.col("o_totalprice") * F.col("n") > F.col("s"))
            .select("o_orderkey", "o_totalprice"))


@register(
    "sq_exists_correlated",
    """SELECT c_custkey, c_name, c_nationkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderstatus = 'F'
                       AND o.o_totalprice > 150000)""",
    survey="§2.2 ext (correlated EXISTS), J6",
    note="correlated EXISTS decorrelated to a predicated left_semi "
         "join — the filter is pushed below the join so only "
         "qualifying orders shuffle; completes the subquery surface "
         "next to IN (j6) / NOT IN (j5)")
def sq_exists_correlated(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderstatus") == "F")
                 & (F.col("o_totalprice") > 150000))
         .select(F.col("o_custkey").alias("c_custkey")))
    return (c.join(o, "c_custkey", "left_semi")
            .select("c_custkey", "c_name", "c_nationkey"))


# ------------------------------------------------------ value windows

@register(
    "w6_value_windows",
    """SELECT o_custkey, o_orderkey,
              first_value(o_totalprice) OVER wrun AS first_price,
              last_value(o_totalprice)  OVER wfull AS last_price,
              nth_value(o_totalprice, 2) OVER wrun AS second_price
       FROM orders
       WINDOW wrun AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wfull AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)""",
    survey="§2.5 ext (value windows)",
    note="first/last/nth_value with EXPLICIT frames (the default "
         "running frame makes last_value a footgun — spelled out "
         "here); values are pure selection, no arithmetic, so raw "
         "doubles compare exactly; one shuffle, both frames share the "
         "(o_custkey, o_orderdate, o_orderkey) sort")
def w6_value_windows(spark, sf_dir):
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                   "o_orderkey")
    wrun = base.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow)
    wfull = base.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    return t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.first("o_totalprice").over(wrun).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wrun).alias("second_price"))


@register(
    "w7_dist_ladder",
    """SELECT c_custkey, c_nationkey,
              CAST(round(percent_rank() OVER wt *
                   (COUNT(*) OVER wp - 1), 0) AS BIGINT) AS pr_scaled,
              CAST(round(cume_dist() OVER wt *
                   COUNT(*) OVER wp, 0) AS BIGINT) AS cd_scaled
       FROM customer
       WINDOW wt AS (PARTITION BY c_nationkey
                     ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT)),
              wp AS (PARTITION BY c_nationkey)""",
    survey="§2.5 ext (distribution ranks)",
    note="percent_rank/cume_dist on a tie-PRONE key: the raw ratios "
         "are quotients (cross-engine rounding trap), so the compared "
         "columns are the exact integer rescalings pr*(n-1)=rank-1 "
         "and cd*n=running tie-count — bit-deterministic, and still "
         "exercises both distribution functions end-to-end")
def w7_dist_ladder(spark, sf_dir):
    tier = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    wt = Window.partitionBy("c_nationkey").orderBy(tier)
    wp = Window.partitionBy("c_nationkey")
    n = F.count("*").over(wp)
    return t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.round(F.percent_rank().over(wt) * (n - 1), 0)
         .cast("bigint").alias("pr_scaled"),
        F.round(F.cume_dist().over(wt) * n, 0)
         .cast("bigint").alias("cd_scaled"))


# ------------------------------------------------------ grouping sets

@register(
    "a21_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
              CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS sum_qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    survey="§2.4 ext (grouping sets — explicit)",
    note="explicit GROUPING SETS via the first-class "
         "DataFrame.groupingSets API — the irregular-set form ROLLUP "
         "(a16) and CUBE (a17) can't express (per-flag + per-status + "
         "grand total, but NOT the cross); one Expand, one shuffle")
def a21_grouping_sets(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
        exact_sum,
    )
    li = t(spark, sf_dir, "lineitem")
    return (li.groupingSets(
                [["l_returnflag"], ["l_linestatus"], []],
                "l_returnflag", "l_linestatus")
            .agg(F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
                 F.grouping("l_linestatus").cast("bigint")
                  .alias("g_status"),
                 F.count("*").alias("n_items"),
                 exact_sum("l_quantity", 2).alias("sum_qty")))


# ---------------------------------------------------- string functions

@register(
    "f21_string_ladder",
    """SELECT c_custkey,
              lpad(c_mktsegment, 12, '.') AS seg_lpad,
              rpad(c_mktsegment, 12, '*') AS seg_rpad,
              translate(c_name, '#_', '--') AS name_tr,
              CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT)
                AS seg_lev,
              reverse(c_name) AS name_rev,
              repeat(substr(c_mktsegment, 1, 2), 3) AS seg_rep,
              CAST(strpos(c_name, '#') AS BIGINT) AS name_hashpos
       FROM customer""",
    survey="§2.8 ext (string functions — F1-F4 widened)",
    note="string-function ladder past the reference's trim/replace/"
         "substring set: lpad/rpad, translate, levenshtein, reverse, "
         "repeat, strpos — all JVM column expressions verified "
         "value-identical to DuckDB (initcap deliberately excluded: "
         "absent from the oracle engine)")
def f21_string_ladder(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, "*").alias("seg_rpad"),
        F.translate("c_name", "#_", "--").alias("name_tr"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING"))
         .cast("bigint").alias("seg_lev"),
        F.reverse("c_name").alias("name_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("seg_rep"),
        F.instr("c_name", "#").cast("bigint").alias("name_hashpos"))


@register(
    "ext_dedup_winnow_pairs",
    f"""WITH base AS (SELECT doc_id, text FROM documents
                     WHERE doc_id % 10 = 0),
       corpus AS (
         SELECT doc_id, text FROM base
         UNION ALL
         SELECT doc_id + 10000000,
                substr(text, 1, 30) || 'XYZQW' || substr(text, 36)
         FROM base),
       s AS (SELECT doc_id, substr(text, 1, 64) AS s FROM corpus),
       {_WINNOW_GRAMS_SQL},
       w AS (SELECT DISTINCT doc_id,
                    min(gram_hash) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
             FROM g)
       SELECT a.doc_id AS key_a, b.doc_id AS key_b,
              CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM w a JOIN w b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING COUNT(*) >= 5""",
    survey="§7.5 dedup (winnowing pairs)",
    note="near-dup candidate PAIRS from shared winnowing fingerprints "
         "(>= 5 shared window-minima): planted 5-char-overwrite "
         "mutants (key offset +10M) must pair with their originals "
         "because winnowing guarantees shared runs survive; the "
         "fp equi-join is the anti-quadratic step — cost rides "
         "fingerprint bucket sizes, never all pairs")
def ext_dedup_winnow_pairs(spark, sf_dir):
    base = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text"))
    mutated = base.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.substring("text", 1, 30), F.lit("XYZQW"),
                 F.expr("substring(text, 36)")).alias("text"))
    corpus = base.unionByName(mutated)
    fps = winnow_fingerprints(corpus, "doc_id", "text",
                              k=5, window=4, prefix_len=64)
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, on=[F.col("a.fp") == F.col("b.fp"),
                          F.col("a.doc_id") < F.col("b.doc_id")])
            .groupBy(F.col("a.doc_id").alias("key_a"),
                     F.col("b.doc_id").alias("key_b"))
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= 5))


# ------------------------------------------- ordered-set aggregates

@register(
    "a22_percentile_disc",
    f"""SELECT o_orderstatus,
              quantile_disc({finite_case('o_totalprice')}, 0.25)
                  AS p25,
              quantile_disc({finite_case('o_totalprice')}, 0.50)
                  AS p50,
              quantile_disc({finite_case('o_totalprice')}, 0.75)
                  AS p75
       FROM orders GROUP BY o_orderstatus""",
    survey="§2.4 ext (ordered-set aggregate)",
    note="discrete percentiles (WITHIN GROUP ordered-set syntax, the "
         "spark.sql surface) — percentile_disc SELECTS an actual row "
         "value, no interpolation/division, so raw doubles compare "
         "exactly; the interpolating exact-median twin is "
         "ext_grouped_median (applyInPandas). Finite-guarded on both "
         "sides (r13 hostile sweep: NaN placement inside the quantile "
         "order statistic differs across engines; quantiles are over "
         "finite values by contract, identity on finite data)")
def a22_percentile_disc(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_a22")
    fin = finite_case("o_totalprice")
    return spark.sql(
        f"""SELECT o_orderstatus,
                  percentile_disc(0.25) WITHIN GROUP
                    (ORDER BY {fin}) AS p25,
                  percentile_disc(0.50) WITHIN GROUP
                    (ORDER BY {fin}) AS p50,
                  percentile_disc(0.75) WITHIN GROUP
                    (ORDER BY {fin}) AS p75
           FROM orders_a22 GROUP BY o_orderstatus""")


# ----------------------------------------------------- date functions

@register(
    "f22_date_ladder",
    """SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              last_day(o_orderdate) AS eom,
              CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
              CAST(datediff('day', o_orderdate, DATE '1998-01-01')
                   AS BIGINT) AS days_to_98,
              CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
              CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
       FROM orders""",
    survey="§2.8 ext (date functions — F7-F10 widened)",
    note="date-function ladder past the reference's convert/week set: "
         "month truncation, last_day, add_months (both engines clamp "
         "end-of-month), signed datediff, ISO day/week-of-year — all "
         "JVM column expressions, integer/date-valued so "
         "engine-portable")
def f22_date_ladder(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
        F.last_day("o_orderdate").alias("eom"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.datediff(F.lit("1998-01-01").cast("date"), "o_orderdate")
         .cast("bigint").alias("days_to_98"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.weekofyear("o_orderdate").cast("bigint").alias("woy"))


# ---------------------------------------------------- regexp / arrays

@register(
    "f23_regexp_extract_all",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
                AS n_nums,
              COALESCE(array_to_string(
                list_slice(regexp_extract_all(text, '[A-Za-z]{6,}'),
                           1, 3), ','), '') AS first_long
       FROM documents""",
    survey="§2.8 ext (regexp — F2/P4 widened)",
    note="regexp_extract_all surface: digit-run count + first three "
         "6+-letter words (dialect-safe character-class patterns run "
         "identically on Java regex and DuckDB RE2; no-match is '' "
         "on both sides via COALESCE — DuckDB's join of an empty "
         "extract is NULL, Spark's is '')")
def f23_regexp_extract_all(spark, sf_dir):
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]+"), 0))
         .cast("bigint").alias("n_nums"),
        F.array_join(
            F.slice(F.regexp_extract_all("text", F.lit(r"[A-Za-z]{6,}"),
                                         0), 1, 3), ",")
         .alias("first_long"))


@register(
    "a23_collect_sorted",
    """SELECT o_custkey,
              array_to_string(list_sort(list(
                CAST(year(o_orderdate) AS VARCHAR))), '|') AS yrs
       FROM orders GROUP BY o_custkey""",
    survey="§2.4 ext (collect aggregate)",
    note="collect_list made deterministic: the bag of per-customer "
         "order years is order-nondeterministic on both engines, so "
         "array_sort before array_join — the only safe way to "
         "oracle-compare a collected list; exercises the "
         "array-aggregate surface (collect_list/array_sort/array_join "
         "vs DuckDB list/list_sort/array_to_string)")
def a23_collect_sorted(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.array_join(
                F.array_sort(F.collect_list(
                    F.year("o_orderdate").cast("string"))), "|")
                .alias("yrs")))


@register(
    "a24_approx_percentile",
    f"""SELECT o_orderstatus, p25, p50, p75,
              CAST(abs(a25 - p25) <= greatest(0.05 * p25, 1.0)
                   AND abs(a50 - p50) <= greatest(0.05 * p50, 1.0)
                   AND abs(a75 - p75) <= greatest(0.05 * p75, 1.0)
                   AS BIGINT) AS within_tol
       FROM (SELECT o_orderstatus,
                    CAST(quantile_disc(fin, 0.25) AS DOUBLE) AS p25,
                    CAST(quantile_disc(fin, 0.50) AS DOUBLE) AS p50,
                    CAST(quantile_disc(fin, 0.75) AS DOUBLE) AS p75,
                    approx_quantile(CAST(fin AS DOUBLE), 0.25) AS a25,
                    approx_quantile(CAST(fin AS DOUBLE), 0.50) AS a50,
                    approx_quantile(CAST(fin AS DOUBLE), 0.75) AS a75
             FROM (SELECT o_orderstatus,
                          {finite_case('o_totalprice')} AS fin
                   FROM orders)
             GROUP BY o_orderstatus) s""",
    survey="§7.5 scale path for a22 (quantile sketch)",
    note="approx_percentile (Greenwald-Khanna sketch, accuracy 10000) "
         "per o_orderstatus — the 100 TB substitute for exact "
         "percentiles: mergeable per-partition sketches, no global "
         "sort. Oracle-paired via a TOLERANCE CONTRACT (r11 verdict "
         "item 3): sketch internals are engine-specific (Spark GK vs "
         "DuckDB t-digest), so the hash covers (group, exact p25/50/75, "
         "within_tol) where within_tol asserts each engine's OWN "
         "approximation lands within max(5% rel, 1.0 abs) of the "
         "exact discrete percentile — generous vs the GK rank-error "
         "n/10000 bound. (Spark's GK sketch is deterministic on fixed "
         "data; DuckDB's approx_quantile is a t-digest whose result "
         "can vary with parallel merge order — the tolerance is wide "
         "enough to absorb that nondeterminism, which is the contract, "
         "not bitwise stability of the sketch itself.) The exact side "
         "(a22's percentile_disc expression inline) exists to make "
         "the sketch hash-checkable; the production scale path is the "
         "sketch alone (tracking also asserted in tests/test_ext.py). "
         "Inputs finite-guarded on both sides (r13 hostile sweep; "
         "identity on finite data)")
def a24_approx_percentile(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_a24")
    return spark.sql(
        f"""SELECT o_orderstatus, p25, p50, p75,
                  CAST(abs(a25 - p25) <= greatest(0.05 * p25, 1.0)
                       AND abs(a50 - p50) <= greatest(0.05 * p50, 1.0)
                       AND abs(a75 - p75) <= greatest(0.05 * p75, 1.0)
                       AS BIGINT) AS within_tol
           FROM (SELECT o_orderstatus,
                        CAST(percentile_disc(0.25) WITHIN GROUP
                          (ORDER BY fin) AS DOUBLE) AS p25,
                        CAST(percentile_disc(0.50) WITHIN GROUP
                          (ORDER BY fin) AS DOUBLE) AS p50,
                        CAST(percentile_disc(0.75) WITHIN GROUP
                          (ORDER BY fin) AS DOUBLE) AS p75,
                        CAST(approx_percentile(fin, 0.25, 10000)
                             AS DOUBLE) AS a25,
                        CAST(approx_percentile(fin, 0.50, 10000)
                             AS DOUBLE) AS a50,
                        CAST(approx_percentile(fin, 0.75, 10000)
                             AS DOUBLE) AS a75
                 FROM (SELECT o_orderstatus,
                              {finite_case('o_totalprice')} AS fin
                       FROM orders_a24)
                 GROUP BY o_orderstatus) s""")


@register(
    "p11_like_predicates",
    """SELECT p_partkey, p_name, p_type FROM part
       WHERE (p_name LIKE '%gold%' OR p_type LIKE 'SMALL%')
         AND p_name ILIKE '%RO%'""",
    survey="§2.2 ext (LIKE predicates)",
    note="LIKE/prefix-LIKE/ILIKE ladder. Predicate structure is the "
         "point: an OR pushes to parquet only if EVERY leaf is a "
         "source filter, so the pushable contains/startswith "
         "disjunction is kept as its OWN conjunct (pushed as "
         "Or(StringContains, StringStartsWith), guarded in "
         "tests/test_plans.py) while the function-wrapped ILIKE "
         "(lower() both sides) rides as a residual conjunct — mixing "
         "it into the OR would un-push the whole disjunction")
def p11_like_predicates(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (p.filter((F.col("p_name").like("%gold%")
                      | F.col("p_type").like("SMALL%"))
                     & F.col("p_name").ilike("%RO%"))
            .select("p_partkey", "p_name", "p_type"))
