"""Fifth coverage batch: product-analytics trio (sessionization,
last-touch attribution, OHLC resample), training-pipeline curation
ops (hashed-linear quality scoring, deterministic source mixing,
TF-IDF top terms, target encoding), a grid-blocked spatial distance
join, and a warehouse integrity report.

The event trio completes the behavioral-analytics family started in
registry_graph.py (e1 funnel, e2 retention, e3 transitions, e4
latency); the curation ops extend the Gopher/C4/trigram family
(registry_curation.py) with the classifier-scoring, data-mixing, and
feature-engineering steps between filtering and training; the
spatial join covers the proximity query the reference's lat/lon
columns invite. Oracle conventions follow
plans/registry.py: identical aliases both sides, BIGINT-aligned
integers, exact decimal sums, integer microsecond diffs (the e4
lesson: second-granularity epoch() truncates sub-second parts
differently across engines), total-order (ts, event_id) everywhere a
winner is picked, and no division in any compared column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    hashed_linear_score,
    mixture_sample,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    last_touch_attribution,
    resample_ohlc,
    sessionize,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    exact_sum,
    register,
    t,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph import (
    _SHINGLE5_SQL,
    planted_clone_clusters,
)

# ------------------------------------------------- event analytics

@register(
    "e5_sessionization",
    """WITH g AS (
         SELECT user_id, event_type, ts, event_id,
                epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    AS gap_us
         FROM events),
       s AS (
         SELECT user_id, event_type, ts,
                SUM(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_idx
         FROM g)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
                  AS duration_us,
              CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
       FROM s GROUP BY user_id, session_idx""",
    survey="§2.5/§7.5 ext (gap sessionization)",
    note="30-min-gap sessionization (operators/events.py:sessionize) "
         "— the batch twin of the streaming session window "
         "(stream_session): same boundary rule (delta >= gap opens a "
         "new session, exactly session_window's merge-iff-strictly-"
         "less), equivalence asserted in tests; derived here by a "
         "lag-gap window + running sum instead of state. One shuffle "
         "on user_id shared by the window and the session groupBy; "
         "duration is an exact integer microsecond diff")
def e5_sessionization(spark, sf_dir):
    return sessionize(t(spark, sf_dir, "events"), gap_minutes=30)


# events hold 5 types; the 4 non-conversion channels get dense codes
# (sorted order) so the carry encoding matches the oracle CASE ladder
_CHANNELS = {"click": 1, "error": 2, "signup": 3, "view": 4}


@register(
    "e6_attribution_last_touch",
    """WITH r AS (
         SELECT user_id, event_type, ts, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
         FROM events),
       c AS (
         SELECT user_id, event_type,
                max(CASE WHEN event_type <> 'purchase' THEN
                      CAST(rn AS BIGINT) * 5 + CASE event_type
                        WHEN 'click' THEN 1 WHEN 'error' THEN 2
                        WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END
                    END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS carry
         FROM r)
       SELECT CASE carry % 5 WHEN 1 THEN 'click' WHEN 2 THEN 'error'
                   WHEN 3 THEN 'signup' WHEN 4 THEN 'view' END
                  AS channel,
              CAST(count(*) AS BIGINT) AS n_attributed,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM c WHERE event_type = 'purchase'
       GROUP BY 1""",
    survey="§2.5/§7.5 ext (last-touch attribution)",
    note="each purchase credited to the user's most recent preceding "
         "non-purchase event type "
         "(operators/events.py:last_touch_attribution). The carry is "
         "a running max over rn*K+code — an integer-encoded argmax "
         "both engines express without IGNORE-NULLS windows; "
         "purchases with no prior touch land in channel NULL. One "
         "user_id shuffle, then a 5-row groupBy")
def e6_attribution_last_touch(spark, sf_dir):
    return last_touch_attribution(
        t(spark, sf_dir, "events"), conversion_type="purchase",
        type_codes=_CHANNELS)


@register(
    "ts2_resample_ohlc",
    """WITH b AS (
         SELECT CASE WHEN epoch_us(ts) >= 0
                     THEN epoch_us(ts) // 900000000
                     ELSE -((-epoch_us(ts) + 899999999) // 900000000)
                END AS bucket_id, value, ts, event_id
         FROM events),
       r AS (
         SELECT bucket_id, value,
                row_number() OVER (PARTITION BY bucket_id
                                   ORDER BY ts, event_id) AS rn,
                count(*) OVER (PARTITION BY bucket_id) AS n
         FROM b)
       SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
              max(CASE WHEN rn = 1 THEN value END) AS open,
              max(value) AS high,
              min(value) AS low,
              max(CASE WHEN rn = n THEN value END) AS close,
              CAST(count(*) AS BIGINT) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
                  AS value_sum
       FROM r GROUP BY bucket_id""",
    survey="§2.4/§7.5 ext (time-bucket resample)",
    note="15-minute OHLC downsample of the event value stream "
         "(operators/events.py:resample_ohlc) — the weekly-rollup "
         "shape (A7) at stream granularity. Bucket id is exact "
         "integer FLOOR division of unix micros (a double quotient "
         "can land a half-ulp under a boundary; toward-zero div "
         "would collapse pre-1970 buckets); open/close SELECT raw "
         "values at "
         "the (ts,event_id) order endpoints so doubles compare "
         "bit-exactly; the window and groupBy share one bucket-key "
         "exchange")
def ts2_resample_ohlc(spark, sf_dir):
    return resample_ohlc(t(spark, sf_dir, "events"), bucket_minutes=15)


# ------------------------------------------------- curation ops

_TOK_HASH = """((list_reduce(
      list_transform(range(1, length(tk) + 1),
        i -> CAST(ascii(substr(tk, CAST(i AS INTEGER), 1)) AS BIGINT)),
      (a, b) -> (a * 31 + b) % 1000000007) % 4096)
    * 2654435761) % 1001 - 500"""


@register(
    "ext_hashed_linear_score",
    f"""WITH toks AS (
         SELECT doc_id,
                list_filter(
                  regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                  x -> length(x) > 0) AS tks
         FROM documents)
       SELECT doc_id,
              CAST(len(tks) AS BIGINT) AS n_tokens,
              CAST(CASE WHEN len(tks) = 0 THEN 0 ELSE
                list_sum(list_transform(tks, tk -> {_TOK_HASH}))
              END AS BIGINT) AS score,
              CASE WHEN CAST(CASE WHEN len(tks) = 0 THEN 0 ELSE
                     list_sum(list_transform(tks, tk -> {_TOK_HASH}))
                   END AS BIGINT) >= 0
                   THEN 'keep' ELSE 'drop' END AS verdict
       FROM toks""",
    survey="§7.5 curation ext (hashed linear classifier)",
    note="fasttext-shape hashed bag-of-words scoring "
         "(operators/curation.py:hashed_linear_score): token -> "
         "base-31 Rabin-Karp hash -> 4096-bucket weight -> Σ weights "
         "-> keep/drop. All int64-exact nested transform/aggregate "
         "inside codegen (no UDF); a deterministic weight FORMULA "
         "stands in for trained weights so the op stays "
         "oracle-checkable — deployment swaps in a broadcast weight "
         "map with the same stateless-map plan")
def ext_hashed_linear_score(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_score(docs, "doc_id", "text")


# target mixture in basis points per source (src0..src19 in the
# testdata) — the knob a data-mixing run turns (down-weight crawl-ish
# sources, keep curated ones whole); the tiered ladder exercises
# full-keep, heavy-keep, and heavy-drop rates. The oracle replays the
# same rates in closed form; the Spark side consumes them as the
# broadcast dim a real run would load.
_MIX_BP = {f"src{i}": 10_000 - (i % 5) * 2_000 for i in range(20)}


@register(
    "ext_source_mixture",
    """WITH kept AS (
         SELECT source, doc_id FROM documents
         WHERE ((doc_id % 100003) * 2654435761) % 10000 <
               10000 - (CAST(substr(source, 4) AS BIGINT) % 5) * 2000)
       SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
              MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
       FROM kept GROUP BY source""",
    survey="§7.5 curation ext (source mixing)",
    note="deterministic source-mixture sampling "
         "(operators/curation.py:mixture_sample): keep each row with "
         "its source's target rate, gated by a multiplicative hash of "
         "doc_id — same verdict per row under any partitioning/retry "
         "(the cap_reviews xxhash lesson), replayable by the oracle. "
         "Rates ride a broadcast join; the corpus pass is "
         "shuffle-free at any scale")
def ext_source_mixture(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("source", "doc_id")
    rates = docs.sparkSession.createDataFrame(
        sorted(_MIX_BP.items()), "source string, rate_bp int")
    # rates are derived from the corpus's own distinct sources two
    # lines up — complete by construction, so skip the eager orphan
    # scan (the error contract is pinned in tests/test_events.py)
    kept = mixture_sample(docs, rates, "source", "doc_id",
                          on_missing="drop")
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


# ------------------------------------------------- spatial / integrity

@register(
    "j25_grid_distance_join",
    """WITH s AS (SELECT s_suppkey, (s_suppkey * 37) % 1000 AS sx,
                         (s_suppkey * 61) % 1000 AS sy FROM supplier),
         c AS (SELECT c_custkey, (c_custkey * 41) % 1000 AS cx,
                      (c_custkey * 53) % 1000 AS cy FROM customer)
       SELECT s.s_suppkey AS left_s_suppkey,
              c.c_custkey AS right_c_custkey,
              CAST((sx - cx) * (sx - cx) + (sy - cy) * (sy - cy)
                   AS BIGINT) AS dist_sq
       FROM s, c
       WHERE (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) <= 625""",
    survey="§2.3 ext (spatial distance join)",
    note="pairs within planar distance 25 on a synthetic 1000x1000 "
         "integer grid (coordinates derived from keys — the testdata "
         "has no geo columns; the reference's listings do, and this "
         "is the lat/lon proximity join its geography columns invite). "
         "Spark side is the real grid-blocked plan "
         "(operators/spatial.py:grid_distance_join): 3x3 cell "
         "neighborhood explode on the small side + cell equi-join + "
         "exact integer re-check — each true pair meets exactly once, "
         "never a cross join; the oracle is the naive theta join, "
         "feasible only at oracle scale")
def j25_grid_distance_join(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.spatial import (
        grid_distance_join,
    )
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 37) % 1000).alias("sx"),
        ((F.col("s_suppkey") * 61) % 1000).alias("sy"))
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 41) % 1000).alias("cx"),
        ((F.col("c_custkey") * 53) % 1000).alias("cy"))
    return grid_distance_join(sup, cust, 25,
                              ("s_suppkey", "sx", "sy"),
                              ("c_custkey", "cx", "cy"))


@register(
    "x9_integrity_report",
    """SELECT 'customer_dup_pk' AS check_name,
              CAST((SELECT count(*) FROM (
                 SELECT c_custkey FROM customer GROUP BY c_custkey
                 HAVING count(*) > 1)) AS BIGINT) AS violation_count
       UNION ALL
       SELECT 'lineitem_dup_pk',
              CAST((SELECT count(*) FROM (
                 SELECT l_orderkey, l_linenumber FROM lineitem
                 GROUP BY l_orderkey, l_linenumber
                 HAVING count(*) > 1)) AS BIGINT)
       UNION ALL
       SELECT 'lineitem_orphan_orderkey',
              CAST((SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))
                   AS BIGINT)
       UNION ALL
       SELECT 'orders_null_custkey',
              CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                   AS BIGINT)
       UNION ALL
       SELECT 'orders_orphan_custkey',
              CAST((SELECT count(*) FROM orders o
                    WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                      SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)) AS BIGINT)""",
    survey="§2.4/§7.4 ext (data-contract report)",
    note="warehouse integrity contract in one long-format report: "
         "duplicate primary keys, FK orphans (left-anti counts), "
         "null FKs — the checks the reference runs implicitly through "
         "its NOT-NULL/FK DDL, surfaced as data because a lake table "
         "has no enforcing constraint layer. Each check is a "
         "key-projected anti join or count-having aggregate; at "
         "100 TB the orphan checks broadcast/shuffle KEYS only "
         "(the J4 discipline) and the five scans prune to 1-2 "
         "columns each")
def x9_integrity_report(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def one(name, cnt_df):
        return cnt_df.select(F.lit(name).alias("check_name"),
                             F.col("cnt").cast("bigint")
                             .alias("violation_count"))

    cust_dup = (c.groupBy("c_custkey").count()
                .filter(F.col("count") > 1)
                .agg(F.count("*").alias("cnt")))
    li_dup = (li.groupBy("l_orderkey", "l_linenumber").count()
              .filter(F.col("count") > 1)
              .agg(F.count("*").alias("cnt")))
    li_orphan = (li.select("l_orderkey")
                 .join(o.select(F.col("o_orderkey").alias("l_orderkey")),
                       "l_orderkey", "left_anti")
                 .agg(F.count("*").alias("cnt")))
    o_nullfk = (o.filter(F.col("o_custkey").isNull())
                .agg(F.count("*").alias("cnt")))
    o_orphan = (o.filter(F.col("o_custkey").isNotNull())
                .select("o_custkey")
                .join(c.select(F.col("c_custkey").alias("o_custkey")),
                      "o_custkey", "left_anti")
                .agg(F.count("*").alias("cnt")))
    return (one("customer_dup_pk", cust_dup)
            .unionByName(one("lineitem_dup_pk", li_dup))
            .unionByName(one("lineitem_orphan_orderkey", li_orphan))
            .unionByName(one("orders_null_custkey", o_nullfk))
            .unionByName(one("orders_orphan_custkey", o_orphan)))


# ------------------------------------------------- feature engineering

@register(
    "ext_target_encoding",
    """WITH seg AS (
         SELECT c.c_mktsegment,
                CAST(count(*) AS BIGINT) AS seg_n_orders,
                round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6)))
                           AS DOUBLE), 2) AS seg_price_sum
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment)
       SELECT c.c_custkey, c.c_mktsegment, seg.seg_n_orders,
              seg.seg_price_sum
       FROM customer c JOIN seg ON c.c_mktsegment = seg.c_mktsegment""",
    survey="§7.5 ext (target encoding)",
    note="category-level target statistics joined back onto entities "
         "— the classic ML feature-encoding join. Encodings are "
         "(count, exact decimal sum): the target MEAN is their "
         "client-side quotient (no-division rule), and sums+counts "
         "stay MERGEABLE across folds/days where means don't. The "
         "stats table is |categories| rows -> broadcast; at 100 TB "
         "the entity table never shuffles for the encode join")
def ext_target_encoding(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    seg = (o.join(c.select("c_custkey", "c_mktsegment"),
                  o.o_custkey == c.c_custkey)
           .groupBy("c_mktsegment")
           .agg(F.count("*").alias("seg_n_orders"),
                exact_sum("o_totalprice", 2).alias("seg_price_sum")))
    return (c.select("c_custkey", "c_mktsegment")
            .join(F.broadcast(seg), "c_mktsegment")
            .select("c_custkey", "c_mktsegment", "seg_n_orders",
                    "seg_price_sum"))


@register(
    "ext_tfidf_topterms",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(
                  regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                  x -> length(x) > 0)) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY doc_id, term),
       dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
       r AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                    row_number() OVER (PARTITION BY tf.doc_id
                                       ORDER BY tf.tf DESC, dfq.df ASC,
                                                tf.term ASC) AS rank
             FROM tf JOIN dfq USING (term))
       SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
       FROM r WHERE rank <= 3""",
    survey="§7.5 text ext (tf-idf terms)",
    note="top-3 characteristic terms per document by (tf DESC, df "
         "ASC, term ASC) — TF-IDF's selection semantics with the "
         "float score derived client-side "
         "(operators/curation.py:tfidf_top_terms): integer (tf, df) "
         "order the candidates, so the comparison never touches "
         "log/division. One explode total (df re-aggregates from the "
         "tf relation); word-level df broadcasts; per-doc top-k "
         "window, no global sort")
def ext_tfidf_topterms(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        tfidf_top_terms,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


# ------------------------------------------------- dedup / hygiene

# integer survivor-policy encoding: longest text wins, ties to the
# LOWEST doc_id (originals beat their planted clones). length(text)
# <= ~1e4 and doc_id < 3e6, so len*1e7 - doc_id is unique and int64-safe
_SURVIVOR_ORD = "CAST(length(text) AS BIGINT) * 10000000 - doc_id"


@register(
    "g4_dedup_survivors_argmax",
    f"""WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
         UNION ALL
         SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 21 = 0)
       SELECT arg_max(doc_id, {_SURVIVOR_ORD}) AS canonical_id,
              CAST(count(*) AS BIGINT) AS cluster_size,
              CAST(count(*) - 1 AS BIGINT) AS n_dropped
       FROM corpus
       GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))""",
    survey="§7.5 dedup ext (survivor policy argmax)",
    note="g3's canonical-row materialization with the OTHER survivor "
         "policy slot filled: max_by over an integer policy encoding "
         "(longest text wins, ties to the lowest doc_id — so planted "
         "clones never displace originals) instead of min-key. The "
         "policy is one argmax aggregate swapped into the identical "
         "cluster groupBy — quality-score argmax or newest-version "
         "plug in the same way; everything else (pair join, connected "
         "components, one semi join to keep survivors) is unchanged "
         "and unchanged-cost")
def g4_dedup_survivors_argmax(spark, sf_dir):
    return (planted_clone_clusters(spark, sf_dir)
            .groupBy("cluster_id")
            .agg(F.expr(f"max_by(doc_id, {_SURVIVOR_ORD})")
                 .alias("canonical_id"),
                 F.count("*").alias("cluster_size"),
                 (F.count("*") - 1).alias("n_dropped"))
            .select("canonical_id", "cluster_size", "n_dropped"))


_CONTAM_ORACLE = f"""
    WITH eval_sh AS (
      SELECT DISTINCT lang AS eval_suite, g.sh
      FROM documents, LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
      WHERE doc_id % 17 = 0
        AND len(string_split_regex(trim(text), '\\s+')) >= 5),
    corpus_sh AS (
      SELECT doc_id, source, g.sh
      FROM documents, LATERAL unnest({_SHINGLE5_SQL}) AS g(sh)
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 5),
    hits AS (
      SELECT DISTINCT c.source, e.eval_suite, c.doc_id
      FROM corpus_sh c JOIN eval_sh e ON c.sh = e.sh)
    SELECT source, eval_suite, CAST(count(*) AS BIGINT) AS n_contaminated
    FROM hits GROUP BY source, eval_suite"""


@register(
    "ext_contamination_matrix",
    _CONTAM_ORACLE,
    survey="§7.5 ext (contamination matrix)",
    note="eval-hygiene REPORT shape on top of ext_decontaminate: per "
         "(corpus source, eval suite) count of contaminated documents "
         "— the table a curation run publishes so each eval suite's "
         "blast radius per source is visible before training. Eval "
         "suites are proxied by the planted eval set's lang. Same "
         "linear shingle-join plan as decontamination (broadcast eval "
         "shingles, no pairwise step), one extra distinct on (source, "
         "suite, doc) so a doc sharing many shingles counts once per "
         "suite")
def ext_contamination_matrix(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        shingles,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang",
                                                "source", "text")
    eval_sh = (docs.filter(F.col("doc_id") % 17 == 0)
               .select(F.col("lang").alias("eval_suite"),
                       F.explode(shingles("text", 5)).alias("sh"))
               .distinct())
    corpus_sh = docs.select("doc_id", "source",
                            F.explode(shingles("text", 5)).alias("sh"))
    hits = (corpus_sh.join(F.broadcast(eval_sh), "sh")
            .select("source", "eval_suite", "doc_id").distinct())
    return (hits.groupBy("source", "eval_suite")
            .agg(F.count("*").alias("n_contaminated")))


@register(
    "ext_semantic_dedup", None,
    survey="§7.5 dedup ext (semantic / SemDeDup)",
    note="SemDeDup (Abbas et al., arXiv:2303.09540): KMeans-cluster "
         "the embedding space (the SAME session-cached offline "
         "quantizer the IVF probe uses — no fit on the query path), "
         "pairwise cosine WITHIN clusters only (sub-quadratic by the "
         "cluster bound), transitive closure into duplicate groups, "
         "keep the group member LEAST similar to its cluster centroid "
         "(the paper's survivor policy, min-key tiebreak). The driver "
         "corpus is near-orthogonal random vectors (max pairwise "
         "cosine ~0.51), so — same device as g4's planted clones — "
         "every vec_id % 7 == 0 row is cloned under id+1000000 with a "
         "deterministic ~0.1% multiplicative perturbation (cosine to "
         "its original > 0.999); the quantizer is the session-cached "
         "offline fit on the BASE corpus (clones assign to their "
         "original's centroid — the production shape: the index "
         "predates the near-dup ingest). KMeans init is "
         "engine-specific -> rows-only; the invariants (partition "
         "into groups, one survivor each, no surviving near-dup "
         "pair, threshold monotonicity) are property-tested in "
         "tests/test_semantic_dedup.py")
def ext_semantic_dedup(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        semantic_dedup,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_gaps import (
        ivf_model,
    )
    emb = t(spark, sf_dir, "embeddings")
    clones = (emb.filter(F.col("vec_id") % 7 == 0)
              .select((F.col("vec_id") + 1000000).alias("vec_id"),
                      F.expr("transform(embedding, (x, i) -> "
                             "CAST(x * (1.0d + 0.001d * cos(CAST(i AS "
                             "DOUBLE) + CAST(vec_id AS DOUBLE))) AS "
                             "FLOAT))").alias("embedding"),
                      F.col("label")))
    corpus = emb.unionByName(clones)
    model = ivf_model(spark, sf_dir, emb, n_clusters=16)
    return semantic_dedup(corpus, model=model, threshold=0.95)


# ------------------------------------------------ stats / diagnostics

_HIST_BOUNDS = """SELECT
         percentile_disc(0.125) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
         percentile_disc(0.250) WITHIN GROUP (ORDER BY o_totalprice) AS q2,
         percentile_disc(0.375) WITHIN GROUP (ORDER BY o_totalprice) AS q3,
         percentile_disc(0.500) WITHIN GROUP (ORDER BY o_totalprice) AS q4,
         percentile_disc(0.625) WITHIN GROUP (ORDER BY o_totalprice) AS q5,
         percentile_disc(0.750) WITHIN GROUP (ORDER BY o_totalprice) AS q6,
         percentile_disc(0.875) WITHIN GROUP (ORDER BY o_totalprice) AS q7"""

_HIST_BUCKET = ("1 + CASE WHEN o_totalprice > b.q1 THEN 1 ELSE 0 END"
                + "".join(f" + CASE WHEN o_totalprice > b.q{i} "
                          f"THEN 1 ELSE 0 END" for i in range(2, 8)))


@register(
    "a35_equidepth_histogram",
    f"""WITH b AS (SELECT
           quantile_disc(o_totalprice, 0.125) AS q1,
           quantile_disc(o_totalprice, 0.250) AS q2,
           quantile_disc(o_totalprice, 0.375) AS q3,
           quantile_disc(o_totalprice, 0.500) AS q4,
           quantile_disc(o_totalprice, 0.625) AS q5,
           quantile_disc(o_totalprice, 0.750) AS q6,
           quantile_disc(o_totalprice, 0.875) AS q7
         FROM orders)
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
              min(o_totalprice) AS lo, max(o_totalprice) AS hi,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                         AS DOUBLE), 2) AS price_sum
       FROM (SELECT o_totalprice, {_HIST_BUCKET} AS bucket
             FROM orders CROSS JOIN b)
       GROUP BY bucket""",
    survey="§2.4 ext (equi-depth histogram)",
    note="8-bucket equi-depth histogram of order value — the optimizer-"
         "statistics shape (count/min/max/exact-sum per depth bucket). "
         "Boundaries are percentile_disc VALUES (actual rows — exact "
         "cross-engine, no interpolation) collected into ONE row and "
         "cross-joined back (the allowlisted 1-row-broadcast global "
         "pattern; plan-audited); bucket assignment is value-based "
         "(ties never split, unlike a global ntile window, and there "
         "is NO single-partition global sort in the plan — the 100 TB "
         "shape). Depth skew at boundary ties is the designed "
         "semantics of a value-based cut")
def a35_equidepth_histogram(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_a35")
    return spark.sql(
        f"""WITH b AS ({_HIST_BOUNDS} FROM orders_a35)
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
                   min(o_totalprice) AS lo, max(o_totalprice) AS hi,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                              AS DOUBLE), 2) AS price_sum
            FROM (SELECT o_totalprice, {_HIST_BUCKET} AS bucket
                  FROM orders_a35 CROSS JOIN b)
            GROUP BY bucket""")


@register(
    "x10_skew_report",
    """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY o_custkey)
       SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(cnt) AS BIGINT) AS total_rows,
              CAST(max(cnt) AS BIGINT) AS max_cnt,
              CAST(quantile_disc(cnt, 0.50) AS BIGINT) AS p50_cnt,
              CAST(quantile_disc(cnt, 0.90) AS BIGINT) AS p90_cnt,
              CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt
       FROM c""",
    survey="§7.5 ext (skew diagnostics)",
    note="join/agg-key skew report: per-key cardinality quantiles + "
         "max for orders.o_custkey, the measurement that DECIDES "
         "whether a key needs the salted twin (j12/a15) before the "
         "shuffle is launched. Two map-side-combinable aggregates "
         "(count per key, then moments over counts — second input is "
         "|keys| rows, tiny); percentile_disc picks actual count "
         "values so every column is an exact BIGINT. The p99/max gap "
         "is the skew signal: max_cnt >> p99_cnt means salt that key")
def x10_skew_report(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_x10")
    return spark.sql(
        """WITH c AS (SELECT o_custkey, count(*) AS cnt
                      FROM orders_x10 GROUP BY o_custkey)
           SELECT CAST(count(*) AS BIGINT) AS n_keys,
                  CAST(sum(cnt) AS BIGINT) AS total_rows,
                  CAST(max(cnt) AS BIGINT) AS max_cnt,
                  CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cnt)
                       AS BIGINT) AS p50_cnt,
                  CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY cnt)
                       AS BIGINT) AS p90_cnt,
                  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)
                       AS BIGINT) AS p99_cnt
           FROM c""")


_DSIR_BUCKET = """list_reduce(
      list_transform(range(1, length(term) + 1),
        i -> CAST(ascii(substr(term, CAST(i AS INTEGER), 1)) AS BIGINT)),
      (a, b) -> (a * 31 + b) % 1000000007) % 4096"""


@register(
    "ext_dsir_components",
    f"""WITH tok AS (
         SELECT doc_id, lang = 'en' AS is_target, tt.term
         FROM documents,
              UNNEST(string_split_regex(lower(trim(text)),
                                        '[ \\t\\n\\x0b\\f\\r]+')) AS tt(term)
         WHERE tt.term <> ''),
       b AS (SELECT doc_id, is_target, {_DSIR_BUCKET} AS h FROM tok),
       per AS (SELECT doc_id, is_target, h,
                      CAST(count(*) AS BIGINT) AS cnt
               FROM b GROUP BY doc_id, is_target, h),
       model AS (SELECT h,
                 CAST(coalesce(sum(CASE WHEN is_target THEN cnt END), 0)
                      AS BIGINT) AS ct,
                 CAST(coalesce(sum(CASE WHEN NOT is_target THEN cnt END), 0)
                      AS BIGINT) AS cs
                 FROM per GROUP BY h)
       SELECT doc_id, is_target,
              CAST(sum(cnt) AS BIGINT) AS n_tokens,
              CAST(sum(cnt * ct) AS BIGINT) AS sum_ct,
              CAST(sum(cnt * cs) AS BIGINT) AS sum_cs
       FROM per JOIN model USING (h)
       GROUP BY doc_id, is_target""",
    survey="§7.5 curation ext (DSIR importance weighting)",
    note="DSIR (Xie et al., arXiv:2302.03169): hashed-bag importance "
         "weights p_target/p_source with target = the English slice "
         "(operators/curation.py:dsir_components) — the principled "
         "domain-matching data selector. One explode (persisted "
         "per-(doc,bucket) counts, the trigram shape); the "
         "target/source model is ≤4096 rows AT ANY CORPUS SIZE "
         "(bounded by the hash space — DSIR's web-scale trick) and "
         "broadcasts back. Compared columns are the exact integer "
         "components (the a34 convention); the float log-weight "
         "derives from the same relation client-side and stays out "
         "of the hash. Tokens/buckets share the ONE portable "
         "rolling-hash family (functions/text.py:rolling_hash == the "
         "oracle's BIGINT list_reduce fold)")
def ext_dsir_components(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        dsir_components,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return dsir_components(
        docs, "doc_id", "text",
        target=(F.col("lang") == "en")).drop("log_weight")


@register(
    "ext_bpe_train_merges", None,
    survey="§7.5 tokenizer ext (BPE training)",
    note="distributed BPE tokenizer training (Sennrich et al., "
         "arXiv:1508.07909; operators/tokenizer.py:bpe_train): corpus "
         "collapses to the word-frequency vocab FIRST (merges depend "
         "only on (word,count) — every round runs over |distinct "
         "words|, not corpus rows), then each round is one explode + "
         "combinable pair-count groupBy + a 1-row top-pair collect "
         "(the CC scalar-probe pattern) + a pure column-expression "
         "greedy merge fold, localCheckpoint()ed per round. "
         "Deterministic (integer counts, total-order pair tiebreak) "
         "but iterative -> no SQL oracle, rows-only; the merge table "
         "is asserted EQUAL to an independent pure-Python BPE in "
         "tests/test_tokenizer.py (incl. the canonical "
         "low/lower/newest/widest example)")
def ext_bpe_train_merges(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train,
        merges_df,
    )
    docs = t(spark, sf_dir, "documents").select("text")
    merges, _vocab = bpe_train(docs, "text", n_merges=8)
    return merges_df(spark, merges)


# Trained-merge cache: the BPE fit is an offline build artifact (the
# IVF-quantizer convention) — one merge table per (session, table).
_BPE_MERGES: dict = {}


@register(
    "ext_bpe_encode_counts", None,
    survey="§7.5 tokenizer ext (BPE encode / token budget)",
    note="per-document token-budget accounting under the TRAINED BPE "
         "tokenizer (operators/tokenizer.py:bpe_encode_counts): the "
         "8-merge table from ext_bpe_train_merges (session-cached — "
         "training is an offline artifact, never the query path) "
         "applies to DISTINCT words only (the vocabulary trick in "
         "reverse; the merge cascade never touches corpus-sized "
         "data), then an equi-join + groupBy closes per-doc (n_words, "
         "n_bpe_tokens). Deterministic but model-dependent -> "
         "rows-only; the encoder is asserted equal to a sequential "
         "Python BPE encoder in tests/test_tokenizer.py")
def ext_bpe_encode_counts(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_encode_counts,
        bpe_train,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    merges = _BPE_MERGES.get(cache_key)
    if merges is None:
        merges, _vocab = bpe_train(docs, "text", n_merges=8)
        _BPE_MERGES[cache_key] = merges
    return bpe_encode_counts(docs, "doc_id", "text", merges)
