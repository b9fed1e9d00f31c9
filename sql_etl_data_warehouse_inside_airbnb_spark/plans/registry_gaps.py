"""Third coverage batch — the SURVEY §2 rows without a dedicated
registry entry so far: column drop (P3), NOT-IN anti join (J5),
broadcast membership semi join (J11), the second analytical-view shape
(A2), per-key denormalization counts (A8), scalar count ladder (A11),
string→date conversion with null-on-failure (F7), CASE-conditional
country normalization (F12), and pandas-Int64-style numeric coercion
(F14).

Reference citations are in each query's note; the shapes come from
modules/data_cleaner.py, sql/data/02_load_hosts.sql,
scripts/maintenance/pretreatment.py, and sql/schema/03_create_views.sql
in /root/reference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    sanitize_numstr,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    exact_sum,
    finite_case,
    register,
    t,
)


@register(
    "p3_column_drop",
    """SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer""",
    survey="P3",
    note="column drop after derivation (drop host_location / "
         "neighbourhood_cleansed shape, data_cleaner.py:120-128)")
def p3_column_drop(spark, sf_dir):
    return t(spark, sf_dir, "customer").drop("c_acctbal")


@register(
    "j5_not_in_anti",
    """SELECT o_orderkey, o_custkey FROM orders
       WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer
              WHERE c_mktsegment = 'BUILDING')""",
    survey="J5",
    note="NOT-IN subquery as left_anti (non-null key side, so 3-valued "
         "NOT IN == anti join; run_move_steps.py:28 shape)")
def j5_not_in_anti(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    building = (t(spark, sf_dir, "customer")
                .filter(F.col("c_mktsegment") == "BUILDING")
                .select(F.col("c_custkey").alias("o_custkey")))
    return (o.join(building, "o_custkey", "left_anti")
            .select("o_orderkey", "o_custkey"))


@register(
    "j11_broadcast_semi",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)""",
    survey="J11/J6",
    note="broadcast membership semi join (the pandas set-membership "
         "loop in check_calendar_joinability.py:25-47 as a hinted "
         "broadcast left_semi — dim side is small by construction)")
def j11_broadcast_semi(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    big_parts = (t(spark, sf_dir, "part")
                 .filter(F.col("p_size") > 40)
                 .select(F.col("p_partkey").alias("l_partkey")))
    return (li.join(F.broadcast(big_parts), "l_partkey", "left_semi")
            .select("l_orderkey", "l_linenumber", "l_extendedprice"))


@register(
    "a2_region_segment_view",
    """SELECT n.n_name AS nation, c.c_mktsegment AS segment,
              CAST(COUNT(*) AS BIGINT) AS customer_count,
              round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_acctbal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name, c.c_mktsegment""",
    survey="A2",
    note="vw_neighborhood_performance shape: GROUP BY geo+category -> "
         "count/avg ladder (03_create_views.sql:30-42)")
def a2_region_segment_view(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n),
                   c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("customer_count"),
                 exact_sum("c_acctbal", 2).alias("sum_acctbal")))


@register(
    "a8_per_key_count",
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS total_orders
       FROM orders GROUP BY o_custkey""",
    survey="A8",
    note="per-key count for a denormalized attribute "
         "(total_listings per host, 02_load_hosts.sql:25-32)")
def a8_per_key_count(spark, sf_dir):
    return (t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("total_orders")))


@register(
    "a11_count_scalars",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(value) AS BIGINT) AS n_value,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events""",
    survey="A11/A4",
    note="scalar COUNT(*) / null-skipping COUNT(col) / COUNT(DISTINCT) "
         "ladder (data_loader.py:233-240,313-316)")
def a11_count_scalars(spark, sf_dir):
    return (t(spark, sf_dir, "events")
            .agg(F.count("*").alias("n_rows"),
                 F.count("value").alias("n_value"),
                 F.countDistinct("user_id").alias("n_users")))


@register(
    "f7_date_conversion",
    """SELECT o_orderkey,
              TRY_CAST(substring(CAST(o_orderdate AS VARCHAR), 1, 10)
                       AS DATE) AS order_day,
              TRY_CAST(o_orderpriority AS DATE) AS bad_date
       FROM orders""",
    survey="F7",
    note="string->date with null-on-failure both for a well-formed and "
         "a garbage input (TRY_CONVERT(DATE, r.date), "
         "05_load_reviews.sql:42)")
def f7_date_conversion(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.substring(F.col("o_orderdate").cast("string"), 1, 10))
         .alias("order_day"),
        F.expr("try_cast(o_orderpriority as date)").alias("bad_date"))


@register(
    "f12_case_conditional",
    """SELECT n_nationkey,
              CASE WHEN n_name IN ('UNITED STATES', 'CANADA', 'BRAZIL',
                                   'ARGENTINA', 'PERU')
                   THEN 'AMERICAS' ELSE n_name END AS normalized_name,
              CASE WHEN n_regionkey = 1 THEN 1 ELSE 0 END AS is_region_one
       FROM nation""",
    survey="F12/P7",
    note="CASE-conditional normalization (US-state->country rewrite + "
         "is_local_host flag, pretreatment.py:57-80)")
def f12_case_conditional(spark, sf_dir):
    amers = ["UNITED STATES", "CANADA", "BRAZIL", "ARGENTINA", "PERU"]
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.when(F.col("n_name").isin(amers), "AMERICAS")
         .otherwise(F.col("n_name")).alias("normalized_name"),
        F.when(F.col("n_regionkey") == 1, 1).otherwise(0)
         .cast("int").alias("is_region_one"))


@register(
    "f14_numeric_coercion",
    """SELECT o_orderkey,
              TRY_CAST(regexp_replace(trim(o_orderkey || '.0'),
                                      '\\.0+$', '', 'g') AS BIGINT)
                  AS coerced_id,
              TRY_CAST(o_orderpriority AS BIGINT) AS bad_id
       FROM orders""",
    survey="F14/F2",
    note="pandas to_numeric(errors='coerce').astype('Int64') as "
         "try_cast over a '.0'-suffix-sanitized string "
         "(data_loader.py:433)")
def f14_numeric_coercion(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        sanitize_numstr(F.concat(F.col("o_orderkey").cast("string"),
                                 F.lit(".0")))
        .try_cast("bigint").alias("coerced_id"),
        F.expr("try_cast(o_orderpriority as bigint)").alias("bad_id"))


@register(
    "f17_json_extract",
    """SELECT event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                  AS sum_k
       FROM events
       WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
       GROUP BY event_type""",
    survey="§2.8 ext (JSON)",
    note="semi-structured surface: get_json_object extract + filter + "
         "agg (no JSON in the reference — free via Spark; SURVEY §2.8 "
         "closing note)")
def f17_json_extract(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (ev.filter(k > 50)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(k).alias("sum_k")))


@register(
    "j12_salted_skew_join",
    """SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
              o.o_orderstatus, o.o_orderpriority
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    survey="§7.5 skew (J1 under skew)",
    note="salted join rewrite: big side salted deterministically, "
         "small side replicated 8x, join on (key, salt) — "
         "oracle-checked identical to the plain equi-join")
def j12_salted_skew_join(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.skew import (
        salted_join,
    )
    li = (t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice"))
    o = (t(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").alias("l_orderkey"),
                 "o_orderstatus", "o_orderpriority"))
    return salted_join(li, o, "l_orderkey", n_salts=8)


@register(
    "a15_two_stage_salted_agg",
    """SELECT l_returnflag,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              ROUND(SUM(l_quantity), 2) AS sum_l_quantity
       FROM lineitem GROUP BY l_returnflag""",
    survey="§7.5 skew (A1 under skew)",
    note="two-stage salted aggregate (partial on (key,salt), final on "
         "key) for a dominant grouping key; oracle-checked identical "
         "to the direct groupBy")
def a15_two_stage_salted_agg(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.skew import (
        two_stage_agg,
    )
    out = two_stage_agg(t(spark, sf_dir, "lineitem"), ["l_returnflag"],
                        ["l_quantity"], n_salts=8)
    return out.withColumn("sum_l_quantity",
                          F.round("sum_l_quantity", 2))


@register(
    "stream_stateful_totals",
    """SELECT user_id,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                AS sum_value,
              MAX(ts) AS last_seen
       FROM events GROUP BY user_id""",
    survey="§7.5 streaming (applyInPandasWithState)",
    note="batch meaning of the custom stateful running-totals operator "
         "(streaming/stateful.py, applyInPandasWithState with "
         "event-time timeout); stream==batch asserted in tests")
def stream_stateful_totals(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful import (
        user_totals_batch,
    )
    return user_totals_batch(t(spark, sf_dir, "events"))


# Quantizer cache: the IVF fit is an offline build artifact, not part
# of the query path — one KMeansModel per (session, table).
_IVF_MODELS: dict = {}


def ivf_model(spark, sf_dir, emb, n_clusters: int = 16):
    """The session-cached offline coarse quantizer for ``embeddings``
    — shared by every registry entry that needs cluster assignment
    (IVF probe, semantic dedup) so no entry ever fits on its own
    query path."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        fit_ivf_quantizer,
    )
    cache_key = (spark.sparkContext.applicationId, sf_dir, n_clusters)
    model = _IVF_MODELS.get(cache_key)
    if model is None:
        model = fit_ivf_quantizer(emb, n_clusters=n_clusters)
        _IVF_MODELS[cache_key] = model
    return model


@register(
    "ext_ann_ivf_topk", None,
    survey="§7.5 similarity (IVF scale path)",
    note="IVF approximate top-k: pre-fit KMeans coarse quantizer "
         "(fit_ivf_quantizer, cached per session+table — no fit in the "
         "per-query plan), probe the n_probe nearest clusters, exact "
         "cosine re-rank (operators/similarity.py:ivf_topk); KMeans "
         "init is engine-specific -> rows-only; full-probe==brute "
         "equivalence asserted in tests")
def ext_ann_ivf_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivf_topk,
    )
    emb = t(spark, sf_dir, "embeddings")
    model = ivf_model(spark, sf_dir, emb, n_clusters=16)
    q = emb.filter(F.col("vec_id") == 0)
    return ivf_topk(emb, q, k=10, model=model, n_probe=4)


@register(
    "f6_filename_geography",
    """SELECT n_nationkey,
              replace(n_name, '_', '-') || '_Capital-City_listings_'
                  || '2025-06-01.csv.gz' AS fname,
              replace(n_name, '_', '-') AS country,
              'Capital-City' AS city
       FROM nation""",
    survey="F6/U2",
    note="filename -> geography parse: build a "
         "{Country}_{City}_listings_{date}.csv.gz name per nation, then "
         "recover (country, city) with the engine's "
         "geography_from_filename regexes (data_cleaner.py:24-46)")
def f6_filename_geography(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
        geography_from_filename,
    )
    n = t(spark, sf_dir, "nation")
    fname = F.concat(F.regexp_replace("n_name", "_", "-"),
                     F.lit("_Capital-City_listings_2025-06-01.csv.gz"))
    named = n.select("n_nationkey", fname.alias("fname"))
    city, country = geography_from_filename("fname")
    return named.select("n_nationkey", "fname",
                        country.alias("country"), city.alias("city"))


@register(
    "ext_bpe_token_count",
    """SELECT doc_id,
              CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                   ELSE len(regexp_extract_all(text,
                     '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
              END::BIGINT AS n_bpe_tokens
       FROM documents""",
    survey="§7.5 text (BPE-ish tokenizer)",
    note="GPT-2-style pre-tokenizer match count; lookahead-free "
         "pattern runs identically on Java regex and RE2")
def ext_bpe_token_count(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        bpe_token_count,
    )
    return (t(spark, sf_dir, "documents")
            .select("doc_id", bpe_token_count("text").alias("n_bpe_tokens")))


@register(
    "ext_grouped_median",
    f"""SELECT c_mktsegment,
              quantile_cont({finite_case('c_acctbal')}, 0.5)
                  AS median_acctbal,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM customer GROUP BY c_mktsegment""",
    survey="§2.10 UDF surface (applyInPandas grouped-map)",
    note="per-group median via applyInPandas (pandas quantile, linear "
         "interpolation == DuckDB quantile_cont); the grouped-map "
         "Arrow surface the reference's generic-UDF row promises. "
         "Quantile input finite-guarded on both sides (r13 hostile "
         "sweep: pandas quantile skips NaN but lets ±Inf participate "
         "in the order statistic, DuckDB's NULL-skip differs — "
         "quantiles are over finite values by contract; n still "
         "counts every row; identity on finite data)")
def ext_grouped_median(spark, sf_dir):
    import numpy as np
    import pandas as pd

    def median(pdf: "pd.DataFrame") -> "pd.DataFrame":
        fin = pdf["c_acctbal"][np.isfinite(pdf["c_acctbal"])]
        return pd.DataFrame({
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            # None, not pandas' NaN-on-empty: a group with NO finite
            # value must emit NULL like quantile_cont over all-NULL
            "median_acctbal": [fin.quantile(0.5) if len(fin) else None],
            "n": [len(pdf)],
        })

    return (t(spark, sf_dir, "customer")
            .select("c_mktsegment", "c_acctbal")
            .groupBy("c_mktsegment")
            .applyInPandas(
                median,
                schema="c_mktsegment string, median_acctbal double, n long"))


@register(
    "u7_pandas_udaf_maxgap",
    """SELECT o_custkey,
              CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days
       FROM (SELECT o_custkey,
                    date_diff('day',
                              lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                     ORDER BY o_orderdate),
                              o_orderdate) AS gap
             FROM orders)
       GROUP BY o_custkey""",
    survey="§2.10 UDF surface (grouped-agg pandas UDAF)",
    note="the third Arrow surface after scalar pandas_udf (ext_lang_id"
         "_udf) and grouped-map applyInPandas (ext_grouped_median): a "
         "GROUPED_AGG pandas UDAF inside .agg() — per-customer max gap "
         "in days between consecutive orders, sorted and diffed in "
         "pandas per Arrow batch (ArrowAggregatePython node, whitelisted "
         "in tests/test_plan_audit.py). One shuffle on the group key, "
         "same as a JVM aggregate, but NO partial map-side combine — "
         "the documented cost of a pandas UDAF vs built-ins; use one "
         "only when the per-group computation (here an order-dependent "
         "fold) has no pyspark.sql.functions form. Result is an "
         "integer day count, and the max over consecutive diffs of a "
         "sorted multiset is tie-permutation-invariant — exact across "
         "engines; the oracle is the lag-window rewrite")
def u7_pandas_udaf_maxgap(spark, sf_dir):
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: inference from hints needs module-level
    # pandas + unstringified annotations (see memory: pandas_udf trap)
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def max_gap_days(d):
        # normalize to midnight so the gap counts DAY-BOUNDARY
        # CROSSINGS like the oracle's date_diff('day') — a raw
        # elapsed-time .dt.days would truncate a 23:00->01:00 pair
        # to 0 where the oracle says 1 (latent until non-midnight
        # timestamps appear in the data)
        days = (d.sort_values().dt.normalize().diff()
                .dt.days.dropna())
        return 0 if days.empty else int(days.max())

    return (t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(max_gap_days("o_orderdate").alias("max_gap_days")))
