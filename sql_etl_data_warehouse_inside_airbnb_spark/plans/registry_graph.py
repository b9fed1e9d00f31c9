"""Graph clustering, robust outliers, and time-series interpolation.

The dedup family (registry_ext) stops at candidate PAIRS; these
queries add the steps a training-data pipeline runs after that:
transitive closure into clusters (connected components, the only
iterative algorithm in the registry — oracle'd against a DuckDB
recursive CTE), canonical-document assignment over a planted-duplicate
corpus, robust per-group outlier flagging (median/MAD, the
distribution-free sibling of a27's moment statistics), and per-key
linear interpolation of missing time-series points (the value-filling
sibling of f32's zero-filling gap-fill).

Determinism note: the interpolation emits exact integer
numerator/denominator pairs instead of the quotient — cross-engine
double division on rounding ties is the one thing the oracle harness
cannot absorb (see SKILL.md gotchas).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    finite_case,
    finite_col,
    register,
    t,
)

_FP_SQL = "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"


def successor_edges(d, steps=(1,)):
    """Same-lang successor edges (doc_id -> doc_id + step), derived as
    ONE equi-join whose keys are (doc_id + step, lang) — the step
    explodes on the probe side so Catalyst extracts a full composite
    hash key. Never write this as an OR of doc_id equalities: the OR
    can't be extracted as an equi-key and the join degrades to a hash
    join on bare low-cardinality ``lang`` with the doc_id test as a
    residual — O((N/|langs|)²) probe work, the exact hot-key shape the
    plan audit's bucketing note forbids."""
    a = d.select(F.col("doc_id"), F.col("lang"),
                 F.explode(F.array(*[F.lit(int(s)) for s in steps]))
                 .alias("__step"))
    b = d.select(F.col("doc_id").alias("__dst_id"),
                 F.col("lang").alias("__dst_lang"))
    return (a.join(b, (F.col("__dst_id")
                       == F.col("doc_id") + F.col("__step"))
                   & (F.col("__dst_lang") == F.col("lang")))
            .select(F.col("doc_id").alias("src"),
                    F.col("__dst_id").alias("dst")))


@register(
    "g1_connected_components",
    """WITH RECURSIVE e AS (
         SELECT a.doc_id AS src, b.doc_id AS dst
         FROM documents a JOIN documents b
           ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
       sym AS (SELECT src AS a, dst AS b FROM e
               UNION SELECT dst, src FROM e),
       walk(node, comp) AS (
         SELECT a, a FROM sym
         UNION
         SELECT s.b, w.comp FROM walk w JOIN sym s ON s.a = w.node)
       SELECT node, MIN(comp) AS component FROM walk GROUP BY node""",
    survey="§7.5 dedup ext (connected components)",
    note="connected components (operators/graph.py) on a data-derived "
         "graph: adjacent doc_ids sharing a language are edges, so "
         "components are maximal same-language runs — sizes vary, "
         "non-vacuous. Spark side is iterative min-label propagation "
         "with pointer halving (O(log diameter) rounds, each one "
         "equi-join + one map-side-combinable min agg, "
         "localCheckpoint'd to stop lineage blowup); convergence is "
         "an exact type-agnostic changed-label probe (join + limit 1) "
         "per round. The oracle is the transitive-closure recursive CTE — "
         "O(component²) row pairs, fine at test scale, exactly what "
         "the distributed formulation avoids at 100 TB. Edge "
         "derivation is an equi-join on doc_id+1, not a global-order "
         "window (which would single-partition at scale)")
def g1_connected_components(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        connected_components,
    )
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return connected_components(successor_edges(d))


@register(
    "g2_dedup_clusters",
    f"""WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
         UNION ALL
         SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 21 = 0)
       SELECT doc_id,
              MIN(doc_id) OVER (PARTITION BY {_FP_SQL}) AS cluster_id
       FROM corpus""",
    survey="§7.5 dedup ext (cluster assignment)",
    note="end-to-end dedup clustering: corpus with planted exact "
         "duplicates (copies at +1M/+2M key offsets; every 21st doc "
         "forms a 3-clique) -> fingerprint-equality pairs -> "
         "assign_clusters (components + singleton fallback), so every "
         "row gets the cluster's min doc_id and `one row per cluster` "
         "is a plain filter. Because the planted edges are exact-dup "
         "cliques, the oracle needs no recursion: cluster == min "
         "doc_id over the fingerprint partition. The same Spark path "
         "handles NEAR-dup pairs (minhash/simhash), where transitivity "
         "is real and only the component closure is correct")
def g2_dedup_clusters(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        fingerprint,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        assign_clusters,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    c1 = (docs.filter(F.col("doc_id") % 7 == 0)
          .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    c2 = (docs.filter(F.col("doc_id") % 21 == 0)
          .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    corpus = docs.unionByName(c1).unionByName(c2)
    fp = corpus.select("doc_id", fingerprint("text").alias("fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("key_a"),
                     F.col("b.doc_id").alias("key_b")))
    return (assign_clusters(corpus, "doc_id", pairs)
            .select("doc_id", "cluster_id"))


@register(
    "x2_outlier_mad",
    f"""WITH c AS (SELECT c_mktsegment,
                         CAST({finite_case('c_acctbal')}
                              AS DOUBLE) AS bal
                  FROM customer),
       med AS (SELECT c_mktsegment, median(bal) AS med
               FROM c GROUP BY 1),
       dev AS (SELECT c.c_mktsegment, abs(c.bal - m.med) AS adev
               FROM c JOIN med m ON c.c_mktsegment = m.c_mktsegment),
       mad AS (SELECT c_mktsegment, median(adev) AS mad
               FROM dev GROUP BY 1)
       SELECT d.c_mktsegment,
              CAST(COUNT(*) FILTER (WHERE d.adev > 1.5 * m.mad)
                   AS BIGINT) AS n_outliers,
              CAST(COUNT(*) AS BIGINT) AS n_rows
       FROM dev d JOIN mad m ON d.c_mktsegment = m.c_mktsegment
       GROUP BY 1""",
    survey="§2.4 ext (robust outlier detection, median/MAD)",
    note="robust per-group outlier count: |x - median| > 1.5 * MAD, "
         "the distribution-free screen a data-quality pass runs where "
         "a27's mean/stddev z-score is skew-fragile. Two exact-median "
         "aggregates; the per-group (median, MAD) tables are tiny and "
         "broadcast back, so the fact table is scanned twice and never "
         "shuffled on a data key. Exact median is a full per-group "
         "sort — at 100 TB swap in approx_percentile (a24) and the "
         "plan shape is unchanged. Compared columns are integer "
         "counts; the 1.5*MAD threshold comparison is double but both "
         "engines compute it from identical operands (CAST to DOUBLE "
         "pinned in the oracle — DuckDB median over DECIMAL truncates). "
         "bal finite-guarded on both sides (r13 hostile sweep: a NaN "
         "inside either median shifted the MAD differently per engine; "
         "non-finite rows keep their row for n_rows, contribute NULL "
         "deviations which both engines' medians and filtered counts "
         "skip; identity on finite data)")
def x2_outlier_mad(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        finite_col("c_acctbal").cast("double").alias("bal"))
    med = c.groupBy("c_mktsegment").agg(F.median("bal").alias("med"))
    dev = (c.join(F.broadcast(med), "c_mktsegment")
           .select("c_mktsegment",
                   F.abs(F.col("bal") - F.col("med")).alias("adev")))
    mad = dev.groupBy("c_mktsegment").agg(F.median("adev").alias("mad"))
    return (dev.join(F.broadcast(mad), "c_mktsegment")
            .groupBy("c_mktsegment")
            .agg(F.sum(F.when(F.col("adev") > 1.5 * F.col("mad"), 1)
                       .otherwise(0)).cast("bigint").alias("n_outliers"),
                 F.count("*").cast("bigint").alias("n_rows")))


@register(
    "ts1_interpolate",
    """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m
                  FROM orders WHERE o_custkey < 40),
       spans AS (SELECT o_custkey, min(m) AS lo, max(m) AS hi
                 FROM o GROUP BY o_custkey),
       months AS (SELECT o_custkey, g.m FROM spans,
                  LATERAL unnest(generate_series(lo, hi,
                                 INTERVAL 1 MONTH)) AS g(m)),
       cnt AS (SELECT o_custkey, m, COUNT(*) AS c
               FROM o GROUP BY o_custkey, m),
       j AS (SELECT months.o_custkey, months.m AS month, cnt.c
             FROM months LEFT JOIN cnt
               ON months.o_custkey = cnt.o_custkey AND months.m = cnt.m),
       w AS (SELECT o_custkey, month, c,
               last_value(CASE WHEN c IS NOT NULL THEN month END
                          IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS pm,
               last_value(c IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS pv,
               first_value(CASE WHEN c IS NOT NULL THEN month END
                           IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY month
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS nm,
               first_value(c IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY month
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS nv
             FROM j)
       SELECT o_custkey, month,
              CAST(CASE WHEN c IS NOT NULL THEN c
                   ELSE pv * (datediff('month', pm, nm)
                              - datediff('month', pm, month))
                        + nv * datediff('month', pm, month)
                   END AS BIGINT) AS interp_num,
              CAST(CASE WHEN c IS NOT NULL THEN 1
                   ELSE datediff('month', pm, nm)
                   END AS BIGINT) AS interp_den
       FROM w""",
    survey="F10 ext (per-key linear interpolation)",
    note="per-key linear interpolation: f32's gap-free monthly axis, "
         "but missing months take the straight line between their "
         "bracketing present months instead of zero — the standard "
         "time-series repair before rate-of-change features. "
         "prev/next value and position come from "
         "last/first(IGNORE NULLS) over running frames — two window "
         "passes over ONE partitioning (custkey), no self-join, no "
         "driver loop; the axis ends are always present months, so "
         "the brackets never dangle. Emits exact integer "
         "numerator/denominator (value = num/den) instead of the "
         "quotient: lerp division on rounding ties is exactly the "
         "cross-engine trap the oracle harness can't absorb")
def ts1_interpolate(spark, sf_dir):
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 40)
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
    j = months.join(cnt, ["o_custkey", "month"], "left")
    wp = (Window.partitionBy("o_custkey").orderBy("month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("o_custkey").orderBy("month")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    present_m = F.when(F.col("c").isNotNull(), F.col("month"))
    w = j.select(
        "o_custkey", "month", "c",
        F.last(present_m, ignorenulls=True).over(wp).alias("pm"),
        F.last("c", ignorenulls=True).over(wp).alias("pv"),
        F.first(present_m, ignorenulls=True).over(wn).alias("nm"),
        F.first("c", ignorenulls=True).over(wn).alias("nv"))
    k = F.months_between("month", "pm")
    n = F.months_between("nm", "pm")
    return w.select(
        "o_custkey", "month",
        F.when(F.col("c").isNotNull(), F.col("c"))
        .otherwise(F.col("pv") * (n - k) + F.col("nv") * k)
        .cast("bigint").alias("interp_num"),
        F.when(F.col("c").isNotNull(), F.lit(1))
        .otherwise(n).cast("bigint").alias("interp_den"))


@register(
    "x3_snapshot_diff",
    """WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                    FROM orders),
       new AS (
         SELECT o_orderkey,
                CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1
                     ELSE o_totalprice END AS o_totalprice,
                o_orderstatus
         FROM orders WHERE o_orderkey % 13 <> 0
         UNION ALL
         SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
         FROM orders WHERE o_orderkey % 19 = 0)
       SELECT * FROM (
         SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                     WHEN n.o_orderkey IS NULL THEN 'delete'
                     WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM
                                 n.o_totalprice
                               AND o.o_orderstatus IS NOT DISTINCT FROM
                                 n.o_orderstatus)
                     THEN 'update' ELSE 'unchanged' END AS change_type
         FROM old o FULL OUTER JOIN new n
           ON o.o_orderkey = n.o_orderkey)
       WHERE change_type <> 'unchanged'""",
    survey="§2.3/§3.2 ext (snapshot CDC diff)",
    note="snapshot reconciliation (operators/merge.py:snapshot_diff): "
         "recover the insert/update/delete delta between two full "
         "table versions — the inverse of j8's MERGE, and what a "
         "pipeline runs when the upstream re-ships whole files with "
         "no change log (exactly the reference's re-load situation, "
         "SURVEY §3.2). New snapshot is derived deterministically "
         "(every 13th key deleted, 17th repriced, 19th re-keyed as an "
         "insert) so all three change types are non-vacuous. One "
         "full-outer shuffle join; column comparison is ONE null-safe "
         "struct equality, JVM-side, no hash round-trip; bucketed "
         "snapshots make the join co-located at scale")
def x3_snapshot_diff(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
        snapshot_diff,
    )
    old = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    base = old.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 17 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus")
    inserts = (old.filter(F.col("o_orderkey") % 19 == 0)
               .select((F.col("o_orderkey") + 100000000)
                       .alias("o_orderkey"),
                       "o_totalprice", "o_orderstatus"))
    return snapshot_diff(old, base.unionByName(inserts), "o_orderkey")


@register(
    "m1_frequent_itemsets",
    """WITH b AS (SELECT DISTINCT l_orderkey, n_name
                  FROM lineitem
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey),
       n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
       singles AS (SELECT [n_name] AS items, COUNT(*) AS freq
                   FROM b GROUP BY n_name),
       pairs AS (SELECT [a.n_name, b2.n_name] AS items, COUNT(*) AS freq
                 FROM b a JOIN b b2
                   ON a.l_orderkey = b2.l_orderkey
                  AND a.n_name < b2.n_name
                 GROUP BY a.n_name, b2.n_name)
       SELECT array_to_string(list_sort(items), ',') AS items,
              CAST(freq AS BIGINT) AS freq
       FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
       WHERE freq >= (SELECT CEIL(0.02 * n) FROM n_orders)""",
    survey="§7.5 ext (frequent-itemset mining, FPGrowth)",
    note="market-basket mining via pyspark.ml FPGrowth: baskets are "
         "the distinct supplier-nations per order (25-symbol alphabet "
         "keeps co-occurrence dense enough to be non-vacuous at every "
         "sf). FPGrowth's distributed form is conditional-tree "
         "partitioning — each worker mines the projected tree of its "
         "item partition, no candidate-generation shuffle storm (vs "
         "Apriori). Support counts are exact longs, and both engines "
         "apply the same ceil(minSupport*n) cutoff to the same IEEE "
         "double product, so the boundary agrees. Oracle enumerates "
         "size-1/2 itemsets by exact GROUP BY; the Spark side filters "
         "to size<=2 (size-3 sets exist below threshold only). The "
         "itemset column is emitted as a sorted comma-joined STRING "
         "on both sides: the r5 driver's canonicalizer cannot hash "
         "array-typed columns (pandas sort_values on lists), and the "
         "registry output contract stays inside its hashable set")
def m1_frequent_itemsets(spark, sf_dir):
    from pyspark.ml.fpm import FPGrowth

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    su = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    baskets = (li.join(F.broadcast(su),
                       li["l_suppkey"] == su["s_suppkey"])
               .join(F.broadcast(na),
                     su["s_nationkey"] == na["n_nationkey"])
               .select("l_orderkey", "n_name").distinct()
               .groupBy("l_orderkey")
               .agg(F.collect_set("n_name").alias("items")))
    model = FPGrowth(itemsCol="items", minSupport=0.02,
                     minConfidence=0.5).fit(baskets)
    return (model.freqItemsets
            .filter(F.size("items") <= 2)
            .select(F.array_join(F.sort_array("items"), ",").alias("items"),
                    F.col("freq").cast("bigint").alias("freq")))


@register(
    "x4_fuzzy_match",
    """WITH dirty AS (
         SELECT s_suppkey + 500000 AS dirty_key,
                s_suppkey,
                CASE WHEN s_suppkey % 3 = 0
                     THEN replace(s_name, '#', '##')
                     WHEN s_suppkey % 3 = 1
                     THEN substring(s_name, 1, length(s_name) - 1)
                     ELSE s_name END AS dirty_name
         FROM supplier WHERE s_suppkey % 2 = 0)
       SELECT d.dirty_key, s.s_suppkey AS matched_key,
              CAST(levenshtein(d.dirty_name, s.s_name) AS INT) AS dist
       FROM dirty d JOIN supplier s
         ON substring(d.dirty_name, 1, 4) = substring(s.s_name, 1, 4)
        AND levenshtein(d.dirty_name, s.s_name) <= 2""",
    survey="§2.8/§7.5 ext (fuzzy entity matching, edit distance)",
    note="fuzzy entity resolution: a derived 'dirty' feed (every other "
         "supplier, names mutated by doubled '#' or truncated last "
         "char) is matched back to the clean dimension by Levenshtein "
         "<= 2 — the reference's host-name/location cleanup theme "
         "(pretreatment.py) done as a set operation. The join is "
         "BLOCKED on a 4-char name prefix, so the edit-distance "
         "(quadratic per pair, JVM levenshtein, no UDF) runs only "
         "inside prefix buckets — an equi-join at scale, never "
         "all-pairs; mutations preserve the prefix so blocking costs "
         "no recall here (the general recipe is multi-pass blocking). "
         "Both engines implement classic Wagner-Fischer, so distances "
         "compare exactly; ambiguous multi-matches are kept (it's a "
         "candidate-scoring op, winner selection is w1/w2's job)")
def x4_fuzzy_match(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dirty = (s.filter(F.col("s_suppkey") % 2 == 0)
             .select((F.col("s_suppkey") + 500000).alias("dirty_key"),
                     F.when(F.col("s_suppkey") % 3 == 0,
                            F.regexp_replace("s_name", "#", "##"))
                     .when(F.col("s_suppkey") % 3 == 1,
                           F.expr("substring(s_name, 1, length(s_name) - 1)"))
                     .otherwise(F.col("s_name")).alias("dirty_name")))
    dist = F.levenshtein(F.col("dirty_name"), F.col("s_name"))
    return (dirty.join(
        s,
        (F.substring("dirty_name", 1, 4) == F.substring("s_name", 1, 4))
        & (dist <= 2))
        .select("dirty_key", F.col("s_suppkey").alias("matched_key"),
                dist.cast("int").alias("dist")))


@register(
    "x5_incremental_agg",
    """SELECT o_custkey,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS sum_price
       FROM orders GROUP BY o_custkey""",
    survey="A8/A11 ext (incremental aggregate maintenance)",
    note="materialized-aggregate maintenance: the per-customer rollup "
         "is computed as HISTORY (orders before 1998) + DELTA (1998 "
         "onward) merged by re-aggregating the PARTIAL aggregates — "
         "sum-of-sums, sum-of-counts — never rescanning history rows. "
         "The oracle is the one-shot full aggregate, so the parity "
         "match IS the algebraic-correctness proof (count/sum are "
         "mergeable; avg/stddev derive from merged sums, a27; exact "
         "quantiles are NOT algebraic — that's what a24/a33's "
         "mergeable sketches are for). At 100 TB this is the daily "
         "pattern: yesterday's partials are a small table, only the "
         "delta partition is scanned; partial sums stay DECIMAL until "
         "the final round so merge order can't move the result")
def x5_incremental_agg(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,6)").alias("p"))
    cutoff = F.lit("1998-01-01").cast("date")

    def partial(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("pn"), F.sum("p").alias("ps"))

    hist = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (hist.unionByName(delta)
            .groupBy("o_custkey")
            .agg(F.sum("pn").cast("bigint").alias("n_orders"),
                 F.round(F.sum("ps").cast("double"), 2).alias("sum_price")))


@register(
    "w10_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders) WHERE rn <= 3""",
    survey="§2.5/§2.6 ext (top-k per group)",
    note="per-group top-k (3 priciest orders per customer, orderkey "
         "tiebreak for a total order): the grouped sibling of o2's "
         "global top-k and the k>1 generalization of w2's "
         "first-per-group. One shuffle on the group key; rank "
         "truncation happens inside the window sort, so only k rows "
         "per group survive the exchange — never a per-group "
         "collect/sort in Python")
def w10_topk_per_group(spark, sf_dir):
    from pyspark.sql import Window as W
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3)
            .drop("rn"))


@register(
    "e1_funnel_stages",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
       s AS (SELECT user_id, MIN(ts) AS t1 FROM events
             WHERE event_type = 'signup' GROUP BY user_id),
       v AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN s ON e.user_id = s.user_id AND e.ts > s.t1
             WHERE e.event_type = 'view' GROUP BY e.user_id),
       p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN v ON e.user_id = v.user_id AND e.ts > v.t2
             WHERE e.event_type = 'purchase' GROUP BY e.user_id)
       SELECT u.user_id,
              CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                        WHEN v.user_id IS NOT NULL THEN 2
                        WHEN s.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS INT) AS funnel_stage
       FROM u LEFT JOIN s ON u.user_id = s.user_id
              LEFT JOIN v ON u.user_id = v.user_id
              LEFT JOIN p ON u.user_id = p.user_id""",
    survey="§2.9/§7.5 ext (ordered funnel analysis)",
    note="ordered funnel: signup -> first view AFTER signup -> first "
         "purchase AFTER that view, per user — the sequence constraint "
         "(each stage strictly later than the previous) is what plain "
         "per-type counts get wrong. Three per-user min-aggregates "
         "chained by equi-joins on user_id — every join and agg shares "
         "ONE partitioning key, so at scale this is one shuffle then "
         "map-side work; no window over the full event stream, no "
         "match_recognize engine needed. Timestamps only compare "
         "WITHIN an engine (the cross-engine columns are user_id and "
         "the integer stage), so event-time precision is not on the "
         "oracle boundary here (cf. sources/io.py nanos note)")
def e1_funnel_stages(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    v = (ev.filter(F.col("event_type") == "view").alias("e")
         .join(s.alias("s"), (F.col("e.user_id") == F.col("s.user_id"))
               & (F.col("e.ts") > F.col("s.t1")))
         .groupBy(F.col("e.user_id").alias("user_id"))
         .agg(F.min("e.ts").alias("t2")))
    p = (ev.filter(F.col("event_type") == "purchase").alias("e")
         .join(v.alias("v"), (F.col("e.user_id") == F.col("v.user_id"))
               & (F.col("e.ts") > F.col("v.t2")))
         .groupBy(F.col("e.user_id").alias("user_id"))
         .agg(F.min("e.ts").alias("t3")))
    stage = (F.when(F.col("t3").isNotNull(), 3)
             .when(F.col("t2").isNotNull(), 2)
             .when(F.col("t1").isNotNull(), 1)
             .otherwise(0)).cast("int")
    return (u.join(s, "user_id", "left")
            .join(v.select("user_id", "t2"), "user_id", "left")
            .join(p.select("user_id", "t3"), "user_id", "left")
            .select("user_id", stage.alias("funnel_stage")))


@register(
    "e2_retention_cohorts",
    """WITH firsts AS (SELECT user_id,
                              date_trunc('week', MIN(ts)) AS cohort_week
                       FROM events GROUP BY user_id),
       active AS (SELECT DISTINCT user_id,
                         date_trunc('week', ts) AS active_week
                  FROM events)
       SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
              CAST(datediff('day', f.cohort_week, a.active_week) / 7
                   AS INT) AS week_offset,
              CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users
       FROM firsts f JOIN active a ON f.user_id = a.user_id
       GROUP BY 1, 2""",
    survey="§2.9/§7.5 ext (retention cohort analysis)",
    note="retention triangle: users bucketed by first-seen ISO week, "
         "counted once per later active week — the standard "
         "growth-analytics rollup. Per-user first-event agg + distinct "
         "(user, week) pairs + one join, all partitioned by user_id; "
         "the final (cohort, offset) aggregate is tiny. Week "
         "bucketing here is plain date_trunc('week') (ISO Monday, "
         "identical in both engines) — deliberately NOT the "
         "reference's Sunday->next-Monday T-SQL week (a7/F9), which "
         "exists separately; the offset is an exact integer because "
         "both operands are Monday boundaries")
def e2_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    active = (ev.select("user_id",
                        F.date_trunc("week", "ts").alias("active_week"))
              .distinct())
    return (firsts.join(active, "user_id")
            .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"),
                     F.expr("datediff(active_week, cohort_week) div 7")
                     .cast("int").alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


_SHINGLE5_SQL = """list_distinct(list_transform(
             generate_series(1,
               len(string_split_regex(trim(text), '\\s+')) - 4),
             i -> string_split_regex(trim(text), '\\s+')[i] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+2] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+3] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+4]))"""


@register(
    "ext_decontaminate",
    f"""WITH eval_sh AS (
         SELECT DISTINCT g.sh FROM documents,
                LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
         WHERE doc_id % 17 = 0
           AND len(string_split_regex(trim(text), '\\s+')) >= 5),
       corpus_sh AS (
         SELECT doc_id, g.sh FROM documents,
                LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
         WHERE len(string_split_regex(trim(text), '\\s+')) >= 5)
       SELECT DISTINCT c.doc_id AS contaminated_doc_id
       FROM corpus_sh c JOIN eval_sh e ON c.sh = e.sh""",
    survey="§7.5 ext (benchmark decontamination)",
    note="eval-set decontamination: flag every training document "
         "sharing ANY 5-gram shingle with the held-out eval corpus "
         "(planted here as every 17th doc, so recall is exactly "
         "verifiable) — the pre-training hygiene step next to dedup. "
         "Shape matters: explode shingles on both sides and LEFT SEMI "
         "join on the shingle string — a hash join on short keys that "
         "scales linearly in total shingle count, NOT a pairwise "
         "document comparison (the Jaccard ops' O(pairs) is exactly "
         "what contamination checks against a small eval set never "
         "need). At 100 TB: eval shingle set is millions of rows -> "
         "broadcast; corpus side is one projection+explode, no "
         "shuffle of document text")
def ext_decontaminate(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        shingles,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_sh = (docs.filter(F.col("doc_id") % 17 == 0)
               .select(F.explode(shingles("text", 5)).alias("sh"))
               .distinct())
    corpus_sh = docs.select(
        "doc_id", F.explode(shingles("text", 5)).alias("sh"))
    return (corpus_sh.join(F.broadcast(eval_sh), "sh", "left_semi")
            .select(F.col("doc_id").alias("contaminated_doc_id"))
            .distinct())


@register(
    "ext_train_split",
    """SELECT doc_id, lang,
              CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                   WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM documents""",
    survey="§7.5 ext (deterministic train/val/test split)",
    note="reproducible 80/10/10 split: multiplicative (Knuth) hash of "
         "the key, modulo-bucketed — pure arithmetic, so the SAME doc "
         "lands in the SAME split on every engine, every run, every "
         "repartitioning (rand()-based splits violate all three; "
         "engine hash functions differ cross-engine, which is why "
         "this is arithmetic and not xxhash64). Stateless map, no "
         "shuffle; stratification is free downstream because the "
         "hash is independent of lang — assert per-lang ratios with "
         "a5-style conditional aggs if the corpus needs proof")
def ext_train_split(spark, sf_dir):
    m = F.col("doc_id") * F.lit(2654435761)
    return (t(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    F.when(m % 100 < 80, "train")
                    .when(m % 100 < 90, "val")
                    .otherwise("test").alias("split")))


@register(
    "ext_data_prep_pipeline",
    f"""WITH scored AS (
         SELECT doc_id, lang, text,
                (5 * least(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 100)
                 + 300 - least(floor(300 *
                     ((len(string_split(' ' || trim(text) || ' ', ' the ')) - 1)
                      + (len(string_split(' ' || trim(text) || ' ', ' a ')) - 1)
                     )::BIGINT / greatest(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 1)), 300)
                 + least(floor(25 *
                     len(regexp_replace(trim(text), '\\s+', '', 'g'))::BIGINT
                     / greatest(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 1)), 200))::BIGINT AS q
         FROM documents),
       quality AS (
         SELECT doc_id, lang, text FROM scored WHERE q >= 600),
       deduped AS (
         SELECT min(doc_id) AS doc_id FROM quality
         GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))),
       kept AS (
         SELECT q.doc_id, q.lang, q.text FROM quality q
         JOIN deduped d ON q.doc_id = d.doc_id),
       eval_sh AS (
         SELECT DISTINCT g.sh FROM documents,
                LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
         WHERE doc_id % 17 = 0
           AND len(string_split_regex(trim(text), '\\s+')) >= 5),
       contaminated AS (
         SELECT DISTINCT k.doc_id FROM kept k,
                LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
         WHERE g.sh IN (SELECT sh FROM eval_sh)
           AND len(string_split_regex(trim(k.text), '\\s+')) >= 5),
       clean AS (
         SELECT doc_id, lang FROM kept
         WHERE doc_id % 17 <> 0
           AND doc_id NOT IN (SELECT doc_id FROM contaminated))
       SELECT doc_id, lang,
              CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                   WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM clean""",
    survey="§7.5 ext (composed training-data prep)",
    note="the end-to-end pre-training data prep pipeline as ONE lazy "
         "lineage composed from the individual operators: quality "
         "filter (quality_score >= 600, integer milli-score) -> exact "
         "dedup winner (min doc_id per md5 fingerprint groupBy) -> "
         "decontamination (drop eval docs AND any doc sharing a "
         "5-gram shingle with the eval set — explode + broadcast semi "
         "join, linear) -> deterministic arithmetic-hash 80/10/10 "
         "split. Every stage is the operator the registry checks "
         "individually; this entry proves they COMPOSE into the shape "
         "a real pipeline runs — one scan of documents feeds all "
         "stages, the only shuffle is the dedup groupBy, the eval "
         "shingle set broadcasts")
def ext_data_prep_pipeline(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        fingerprint,
        quality_score,
        shingles,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    quality = docs.filter(quality_score("text") >= 600)
    winners = (quality
               .groupBy(fingerprint("text").alias("__fp"))
               .agg(F.min("doc_id").alias("doc_id")))
    kept = quality.join(winners.select("doc_id"), "doc_id", "left_semi")
    eval_sh = (docs.filter(F.col("doc_id") % 17 == 0)
               .select(F.explode(shingles("text", 5)).alias("sh"))
               .distinct())
    corpus_sh = kept.select("doc_id", F.explode(shingles("text", 5))
                            .alias("sh"))
    contaminated = (corpus_sh.join(F.broadcast(eval_sh), "sh", "left_semi")
                    .select("doc_id").distinct())
    clean = (kept.filter(F.col("doc_id") % 17 != 0)
             .join(contaminated, "doc_id", "left_anti"))
    m = F.col("doc_id") * F.lit(2654435761)
    return clean.select(
        "doc_id", "lang",
        F.when(m % 100 < 80, "train")
         .when(m % 100 < 90, "val")
         .otherwise("test").alias("split"))


def planted_clone_clusters(spark, sf_dir):
    """Shared known-answer dedup workload for the survivor-policy
    entries (g3 min-key, g4 argmax): plant +1M/+2M exact clones of
    the %7/%21 docs, pair them by md5-fingerprint self-join, run
    connected components, and return the corpus with ``cluster_id``
    attached (doc_id, text, cluster_id). ONE definition so the two
    policies can't silently diverge on the clone-planting or pair
    predicate."""
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        fingerprint,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        assign_clusters,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    c1 = (docs.filter(F.col("doc_id") % 7 == 0)
          .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    c2 = (docs.filter(F.col("doc_id") % 21 == 0)
          .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    corpus = docs.unionByName(c1).unionByName(c2)
    fp = corpus.select("doc_id", fingerprint("text").alias("fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("key_a"),
                     F.col("b.doc_id").alias("key_b")))
    return assign_clusters(corpus, "doc_id", pairs)


@register(
    "g3_dedup_survivors",
    f"""WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
         UNION ALL
         SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 21 = 0)
       SELECT MIN(doc_id) AS canonical_id,
              CAST(count(*) AS BIGINT) AS cluster_size,
              CAST(count(*) - 1 AS BIGINT) AS n_dropped
       FROM corpus GROUP BY {_FP_SQL}""",
    survey="\u00a77.5 dedup ext (survivor materialization)",
    note="the dedup story's final act after g2's cluster assignment: "
         "materialize ONE canonical row per cluster (min doc_id — the "
         "policy slot where 'longest doc wins' or quality-score argmax "
         "plug in via max_by) plus the cluster-size/drop accounting a "
         "curation report needs. Spark side runs the REAL graph path "
         "(pair join -> connected components -> per-cluster min/count); "
         "the oracle collapses to a fingerprint GROUP BY because the "
         "planted duplicates are exact cliques — near-dup pairs reuse "
         "the identical Spark lineage where only the closure is "
         "correct. Dropping N-1 of each cluster is then one "
         "broadcast-able semi join on canonical_id")
def g3_dedup_survivors(spark, sf_dir):
    return (planted_clone_clusters(spark, sf_dir)
            .groupBy("cluster_id")
            .agg(F.min("doc_id").alias("canonical_id"),
                 F.count("*").alias("cluster_size"),
                 (F.count("*") - 1).alias("n_dropped"))
            .select("canonical_id", "cluster_size", "n_dropped"))


@register(
    "e3_event_transitions",
    """WITH seq AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                    AS prev_type
         FROM events)
       SELECT prev_type, event_type AS next_type,
              CAST(count(*) AS BIGINT) AS n_transitions,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM seq WHERE prev_type IS NOT NULL
       GROUP BY prev_type, event_type""",
    survey="§2.5/§7.5 ext (behavioral transition matrix)",
    note="first-order Markov transition counts over per-user event "
         "sequences — the behavioral-analytics sibling of e1's funnel "
         "and e2's cohorts, and the count table a sequence model's "
         "transition probabilities derive from (probabilities are "
         "quotients of these counts — derived client-side per the "
         "no-division rule; the counts themselves are mergeable "
         "across days). One shuffle on user_id for the lag window "
         "((ts, event_id) total order), one map-side-combinable "
         "count groupBy on the (prev, next) pair — at 100 TB the "
         "pair space is tiny (|event types|^2) so the final "
         "aggregate is a broadcast-sized table")
def e3_event_transitions(spark, sf_dir):
    from pyspark.sql import Window as W
    ev = t(spark, sf_dir, "events").select("user_id", "event_type",
                                           "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (seq.filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count("*").alias("n_transitions"),
                 F.countDistinct("user_id").alias("n_users")))


@register(
    "e4_conversion_latency",
    """WITH firsts AS (
         SELECT user_id,
                min(ts) FILTER (WHERE event_type = 'view') AS first_view,
                min(ts) FILTER (WHERE event_type = 'purchase')
                    AS first_purchase
         FROM events GROUP BY user_id),
       conv AS (
         SELECT user_id,
                epoch_us(first_purchase) - epoch_us(first_view)
                    AS latency_us
         FROM firsts
         WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
           AND first_purchase >= first_view)
       SELECT CAST(count(*) AS BIGINT) AS n_converted,
              CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_us)
                   AS BIGINT) AS p50_us,
              CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_us)
                   AS BIGINT) AS p90_us,
              CAST(max(latency_us) AS BIGINT) AS max_us
       FROM conv""",
    survey="§2.4/§7.5 ext (conversion-latency distribution)",
    note="time-to-convert: per user, first 'view' to first subsequent "
         "'purchase', then the latency distribution — the two-event "
         "product-analytics shape next to e1's funnel. Latencies are "
         "exact integer epoch-second diffs and the percentiles are "
         "percentile_disc (SELECTION of an actual value, no "
         "interpolation/division), so every compared column is "
         "bit-deterministic cross-engine (MICROsecond diffs — second-"
         "granularity epoch()/unix_timestamp truncate sub-second "
         "parts differently across engines, found at sf0.01). One "
         "conditional-min groupBy "
         "on user_id, then a single tiny global aggregate; at 100 TB "
         "swap percentile_disc for the mergeable approx_percentile "
         "sketch (a24) with the plan shape unchanged")
def e4_conversion_latency(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.when(F.col("event_type") == "view",
                                F.col("ts"))).alias("first_view"),
                   F.min(F.when(F.col("event_type") == "purchase",
                                F.col("ts"))).alias("first_purchase")))
    conv = (firsts
            .filter(F.col("first_view").isNotNull()
                    & F.col("first_purchase").isNotNull()
                    & (F.col("first_purchase") >= F.col("first_view")))
            .select((F.unix_micros("first_purchase")
                     - F.unix_micros("first_view"))
                    .alias("latency_us")))
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_us)")
         .cast("bigint").alias("p50_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_us)")
         .cast("bigint").alias("p90_us"),
        F.max("latency_us").alias("max_us"))
