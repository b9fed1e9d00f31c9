"""Second coverage batch: remaining SURVEY §2 rows not in the core
registry — defaults/null predicates, cast-key joins, catalog-style
multi-way joins, full sorts, merge action counts, metadata math, and
the spark.sql text surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    dedup_source,
    merge_upsert,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import register, t


@register(
    "p2_add_default_column",
    """SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS comment_col,
              'Unknown' AS source_city
       FROM region""",
    survey="P2",
    note="column add-with-default for missing expected columns")
def p2_add_default_column(spark, sf_dir):
    return (t(spark, sf_dir, "region")
            .withColumn("comment_col", F.lit(None).cast("string"))
            .withColumn("source_city", F.lit("Unknown")))


@register(
    "p5_null_empty_predicates",
    """SELECT doc_id, lang FROM documents
       WHERE (lang IS NOT NULL AND lang <> '')
         AND text IS NOT NULL AND len(text) > 0""",
    survey="P5/F4",
    note="null / empty-string predicate ladder (language-detection "
         "candidate filter shape)")
def p5_null_empty_predicates(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .filter(F.col("lang").isNotNull() & (F.col("lang") != "")
                    & F.col("text").isNotNull() & (F.length("text") > 0))
            .select("doc_id", "lang"))


@register(
    "j3_cast_key_join",
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
       FROM lineitem l
       JOIN orders o
         ON CAST(l.l_orderkey AS VARCHAR) = CAST(o.o_orderkey AS VARCHAR)""",
    survey="J3",
    note="equi-join on a cast-derived key (TRY_CAST(r.listing_id) = "
         "l.listing_id shape)")
def j3_cast_key_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (li.join(o, li.l_orderkey.cast("string")
                    == o.o_orderkey.cast("string"))
            .select("l_orderkey", "l_linenumber", "o_orderstatus"))


@register(
    "j10_catalog_join",
    """WITH stats AS (
         SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
         UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         UNION ALL SELECT 'customer', count(*) FROM customer
         UNION ALL SELECT 'supplier', count(*) FROM supplier),
       kinds AS (
         SELECT 'orders' AS table_name, 'fact' AS kind
         UNION ALL SELECT 'lineitem', 'fact'
         UNION ALL SELECT 'customer', 'dim'
         UNION ALL SELECT 'supplier', 'dim')
       SELECT k.kind, count(*) AS n_tables,
              CAST(sum(s.n_rows) AS BIGINT) AS total_rows
       FROM stats s JOIN kinds k ON s.table_name = k.table_name
       GROUP BY k.kind""",
    survey="J10/A11/F16",
    note="catalog-style multi-way join: per-table stats ⋈ metadata "
         "(sys.tables ⋈ sys.partitions shape)")
def j10_catalog_join(spark, sf_dir):
    stats = None
    for name, kind in [("orders", "fact"), ("lineitem", "fact"),
                       ("customer", "dim"), ("supplier", "dim")]:
        s = (t(spark, sf_dir, name)
             .agg(F.count("*").alias("n_rows"))
             .select(F.lit(name).alias("table_name"),
                     F.lit(kind).alias("kind"), "n_rows"))
        stats = s if stats is None else stats.unionByName(s)
    return (stats.groupBy("kind")
            .agg(F.count("*").alias("n_tables"),
                 F.sum("n_rows").alias("total_rows")))


@register(
    "o6_full_sort",
    """SELECT p_partkey, p_name, p_brand FROM part
       ORDER BY p_name, p_partkey""",
    survey="O6",
    note="full sort by name (hash compare is order-insensitive; the "
         "sort itself is the exercised operator)")
def o6_full_sort(spark, sf_dir):
    return (t(spark, sf_dir, "part")
            .orderBy("p_name", "p_partkey")
            .select("p_partkey", "p_name", "p_brand"))


@register(
    "o7_distinct_sorted_limit",
    """SELECT DISTINCT o_custkey FROM orders
       ORDER BY o_custkey LIMIT 20""",
    survey="O7",
    note="DISTINCT + ORDER BY + LIMIT on anti-join-shaped output")
def o7_distinct_sorted_limit(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .select("o_custkey").distinct()
            .orderBy("o_custkey").limit(20))


@register(
    "a13_merge_action_counts",
    """WITH delta AS (
         SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0
         UNION ALL
         SELECT c_custkey + 1000000 FROM customer WHERE c_custkey % 11 = 0)
       SELECT CASE WHEN c.c_custkey IS NOT NULL THEN 'UPDATE'
                   ELSE 'INSERT' END AS action,
              count(*) AS n
       FROM delta d LEFT JOIN customer c ON d.c_custkey = c.c_custkey
       GROUP BY 1""",
    survey="A13/J8",
    note="MERGE OUTPUT $action parity: UPDATE vs INSERT counts from the "
         "same join that drives the upsert")
def a13_merge_action_counts(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
    inserts = (cust.filter(F.col("c_custkey") % 11 == 0)
               .select((F.col("c_custkey") + 1000000).alias("c_custkey")))
    delta = updates.unionByName(inserts)
    matched = delta.join(cust.select(F.col("c_custkey").alias("t_key")),
                         delta.c_custkey == F.col("t_key"), "left")
    return (matched
            .select(F.when(F.col("t_key").isNotNull(), "UPDATE")
                     .otherwise("INSERT").alias("action"))
            .groupBy("action").agg(F.count("*").alias("n")))


@register(
    "f16_metadata_math",
    """SELECT o_orderpriority,
              count(*) AS n,
              round(count(*) * 8.0 / 1024, 6) AS pseudo_mb,
              CAST((100000000 * count(*))
                   // (SELECT count(*) FROM orders) AS BIGINT) AS pct_ppm
       FROM orders GROUP BY o_orderpriority""",
    survey="F16/A11",
    note="metadata math: size/percentage arithmetic over counts. "
         "pseudo_mb's n/128 is binary-EXACT (safe to round); the "
         "share is integer parts-per-million via floor division — a "
         "rounded double quotient is the cross-engine tie trap. The "
         "corpus total comes from a window sum over the 5-row "
         "aggregate, not a second full scan + driver count()")
def f16_metadata_math(spark, sf_dir):
    from pyspark.sql import Window
    agg = (t(spark, sf_dir, "orders")
           .groupBy("o_orderpriority")
           .agg(F.count("*").alias("n")))
    total = F.sum("n").over(Window.partitionBy())
    return (agg
            .select("o_orderpriority", "n",
                    F.round(F.col("n") * 8.0 / 1024, 6).alias("pseudo_mb"),
                    total.alias("__total"))
            .select("o_orderpriority", "n", "pseudo_mb",
                    F.expr("(100000000 * n) div __total")
                    .cast("bigint").alias("pct_ppm")))


@register(
    "sql_surface_view_query",
    """SELECT n.n_name, count(*) AS n_customers,
              round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS total_acctbal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
    survey="§3 spark.sql surface / A1 / vw_* shape",
    note="the spark.sql(text) surface: temp views + SQL string, same "
         "engine path as the reference's CREATE VIEW layer; the "
         "compared balance sum follows the exact-decimal convention "
         "(raw double sums are partition-order noisy)")
def sql_surface_view_query(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql("""
        SELECT n.n_name, count(*) AS n_customers,
               round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6)))
                     AS DOUBLE), 2) AS total_acctbal
        FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""")


@register(
    "w1_merge_dedup_latest",
    """SELECT o_custkey AS c_custkey, o_orderkey, o_orderpriority
       FROM (SELECT o_custkey, o_orderkey, o_orderpriority,
                    row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1""",
    survey="W1/J8",
    note="merge-source pre-dedup through the engine's dedup_source "
         "operator (latest-by-recency winner)")
def w1_merge_dedup_latest(spark, sf_dir):
    src = (t(spark, sf_dir, "orders")
           .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey",
                   "o_orderpriority", "o_orderdate"))
    deduped = dedup_source(src, "c_custkey",
                           order_by=[F.col("o_orderdate").desc(),
                                     F.col("o_orderkey").desc()])
    return deduped.select("c_custkey", "o_orderkey", "o_orderpriority")
