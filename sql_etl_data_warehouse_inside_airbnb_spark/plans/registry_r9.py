"""Round-9 additions.

- ``ext_ann_ivfadc_portable_topk``: a fully ORACLE-EXPRESSIBLE twin
  of the composed IVF+PQ probe (``ext_ann_ivf_pq_topk``). The KMeans
  version can never be hash-checked — its fitted centroids are
  data-dependent while oracle SQL is one static string across scale
  factors (VERIFICATION_r08.md) — so the composed prune → ADC-score
  → exact-rerank PIPELINE had only rows-only verdicts. This twin
  swaps each tier for the data-independent sibling that already has
  a hash-green anchor: the coarse quantizer is the seeded-hyperplane
  bucket (the ``ext_hard_negatives`` oracle technique — plane
  literals reproduced verbatim in the SQL) with Hamming-radius-2
  multiprobe, and the fine quantizer is the per-dimension int8 grid
  (the ``ext_ann_quantized_topk`` idiom — integer ADC, bit-exact
  across engines). Every stage of the composition — prune, ADC
  shortlist, exact cosine re-rank — is now value-hash-checked,
  anchoring the production IVFADC shape the KMeans twin serves.
  Operator: ``operators/similarity.py:ivfadc_portable_topk``.
- ``ext_domain_quota_sample``: per-source quota cap (rank-based
  domain balancing) with the kept/dropped audit matrix.
- ``ext_label_outliers``: noisy-label mining — lowest cosine to the
  own-label centroid, exact cross-engine via integer-grid
  quantization and integer-sum centroids.
- ``ext_retrieval_eval``: MRR / recall@10 integer components — the
  evaluation loop the retrieval family was missing.
- ``e10_cohort_retention``: the weekly cohort retention triangle,
  two-exchange plan (window + distinct share one user shuffle).
- ``x15_referential_integrity``: FK orphan audit over all six
  star-schema edges (left-anti join counts).
- ``stream_quota_admission``: batch twin of the stateful ingest
  admission quota (``streaming/admission.py``) — at most N events
  per key in declared (ts, event_id) order; stream==batch pinned.
- ``ts6_twap_components``: time-weighted-average components — the
  TWAP sibling of ts5's VWAP, mergeable integer components
  (Σ duration·cents, Σ duration), single-exchange plan.
- ``ext_mmr_portable_topk``: the quantized-MMR twin — greedy
  diversity re-rank unrolled into k static argmax steps over exact
  int64 scores (7·rel − 3·max_sim on int8-grid dots), fully
  oracle-expressible. Operator:
  ``operators/similarity.py:mmr_quantized_topk``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


# shared int8-grid quantizer CTEs (operators/similarity.py:grid_codes
# twin) — single-sourced so the IVFADC and MMR oracles can never
# drift from each other. The codebook fit is CORPUS-ONLY (vec_id <> 0
# is the entries' candidate set — the r10 re-encode: a stats fit over
# candidates ∪ query is coupled to the query and can never be an
# offline index artifact); every row clamps into [mn, mx] at encode
# time, a no-op for the corpus and the saturating-quantizer rule for
# the query row.
_GRID_CODES_SQL = """flat AS MATERIALIZED (
         SELECT vec_id,
                generate_subscripts(embedding, 1) AS pos,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM embeddings),
       stats AS MATERIALIZED (
         SELECT pos, min(x) AS mn, max(x) AS mx FROM flat
         WHERE vec_id <> 0 GROUP BY pos),
       codes AS MATERIALIZED (
         SELECT flat.vec_id, flat.pos,
                CAST(CASE WHEN s.mx = s.mn THEN 0
                          ELSE floor((least(greatest(flat.x, s.mn),
                                            s.mx) - s.mn) * 255.0
                                     / (s.mx - s.mn))
                     END AS BIGINT) - 128 AS c
         FROM flat JOIN stats s USING (pos))"""


# Materialized portable-grid index: the (pos, mn, mx) codebook and
# the bucketed int8 code table (vec_id, bucket, pos, c) are the
# index-BUILD artifacts shared by the two portable ANN twins (at
# 100 TB: written at ingest, the code table partitioned by bucket).
# localCheckpoint(eager) materializes both ONCE per (session, table)
# and truncates lineage, so no probe plan contains the corpus
# posexplode or the min/max codebook fit — the r9-verdict fix (both
# twins used to re-fit the grid over candidates ∪ query per call).
# Keyed by (applicationId, sf_dir) only — the artifacts are pure
# functions of the table (fixed-seed hyperplanes, deterministic grid),
# so the cache is bounded by the number of sf dirs a session touches.
_PORTABLE_GRID_INDEX: dict = {}

# Constructed quantized-MMR probes, keyed (applicationId, sf_dir) —
# see ext_mmr_portable_topk for why construction itself is cached.
_MMR_PORTABLE: dict = {}


def portable_grid_index(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        grid_code_index,
        grid_stats,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PORTABLE_GRID_INDEX.get(key)
    if got is None:
        corpus = (t(spark, sf_dir, "embeddings")
                  .select("vec_id", "embedding")
                  .filter(F.col("vec_id") != 0))
        stats = grid_stats(corpus).localCheckpoint(eager=True)
        codes = (grid_code_index(corpus, stats=stats)
                 .localCheckpoint(eager=True))
        got = (stats, codes)
        _PORTABLE_GRID_INDEX[key] = got
    return got


def _ivfadc_oracle() -> str:
    """DuckDB oracle running the ENTIRE IVFADC pipeline: seeded-
    hyperplane coarse assignment (plane literals from the same
    fixed-seed generator the Spark side uses), Hamming-radius-2
    multiprobe prune (10 arms + the own cell — radius 1 measured
    recall@5 0.2 at sf0.01, see the entry note), int8-grid ADC
    scoring of the survivors, top-20 shortlist on the integer score,
    exact-cosine re-rank."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        _hyperplanes,
        _probe_masks,
    )
    planes = _hyperplanes(64, 4)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product(v, {lit}) > 0 "
                     f"THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(terms)
    probe_arms = "".join(f" OR b.bkt = xor(q.qb, {m})"
                         for m in _probe_masks(4, 2))
    return f"""WITH e AS (
         SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       b AS (SELECT vec_id, v, {bucket} AS bkt FROM e),
       q AS (SELECT v AS qv, bkt AS qb FROM b WHERE vec_id = 0),
       surv AS (
         SELECT b.vec_id FROM b, q
         WHERE b.vec_id <> 0 AND (b.bkt = q.qb{probe_arms})),
       {_GRID_CODES_SQL},
       qc AS (SELECT pos, c AS qcode FROM codes WHERE vec_id = 0),
       adc AS (
         SELECT codes.vec_id,
                CAST(sum(codes.c * qc.qcode) AS BIGINT) AS qdot
         FROM codes JOIN qc USING (pos)
         WHERE codes.vec_id IN (SELECT vec_id FROM surv)
         GROUP BY codes.vec_id),
       short AS (SELECT vec_id FROM adc
                 ORDER BY qdot DESC, vec_id LIMIT 20),
       rer AS (
         SELECT e.vec_id,
                round(list_dot_product(e.v, q.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.qv, q.qv))), 6)
                    AS cosine
         FROM e JOIN short USING (vec_id) CROSS JOIN q)
       SELECT vec_id, cosine,
              CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                   AS BIGINT) AS rank
       FROM rer ORDER BY cosine DESC, vec_id LIMIT 5"""


@register(
    "ext_ann_ivfadc_portable_topk",
    _ivfadc_oracle(),
    survey="§7.5 similarity ext (IVFADC, oracle-checkable twin)",
    note="the composed IVF→ADC→rerank probe with every tier "
         "data-independent, so the FULL pipeline is value-hash-"
         "checked (the KMeans twin ext_ann_ivf_pq_topk can only ever "
         "be rows-only — fitted centroids are data-dependent, oracle "
         "SQL is one static string across sfs). Coarse: fixed-seed "
         "hyperplane buckets (16 cells), query probes its own cell "
         "plus all Hamming-1/2 arms = 11/16 of the corpus (radius 1 "
         "measured recall@5 0.2 at sf0.01 — the synthetic corpus's "
         "top cosines are ~0.35, too weak for tight LSH cells; "
         "radius 2 measures 0.8/0.6/1.0 across the three sfs). Fine: "
         "per-dimension int8 grid codes, ADC = INTEGER dot of code "
         "vectors (bit-exact cross-engine; the codebook is fit "
         "CORPUS-ONLY and the query clamps into it — r10 re-encode, "
         "so the stats + bucketed code table are genuine offline "
         "artifacts, session-cached eager checkpoints via "
         "portable_grid_index exactly like registry_r7.ivf_pq_index). "
         "Top-20 shortlist on the exact integer score (ties broken "
         "by key), exact-cosine re-rank to top-5. Plan: the probe "
         "arms broadcast-semi-prune the checkpointed code index on "
         "its own bucket column (partition pruning at scale — no "
         "corpus expression eval, no key shuffle, no corpus-wide "
         "aggregate anywhere on the probe path — pinned in "
         "tests/test_r10.py), ADC is one equi-join + combinable "
         "sum-groupBy, rerank touches 20 vectors. Recall-vs-brute "
         "floor pinned in tests/test_r9.py",
    tags=("llm-pipeline",))
def ext_ann_ivfadc_portable_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivfadc_portable_topk,
    )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stats, codes = portable_grid_index(spark, sf_dir)
    return ivfadc_portable_topk(
        emb.filter(F.col("vec_id") != 0),
        emb.filter(F.col("vec_id") == 0),
        k=5, n_planes=4, dim=64, hamming_probes=2, rerank=20,
        stats=stats, codes=codes)


@register(
    "ext_domain_quota_sample",
    """WITH ranked AS (
         SELECT source, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id)
                    AS rn
         FROM documents)
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
              CAST(sum(CASE WHEN rn <= 8 THEN n_chars ELSE 0 END)
                   AS BIGINT) AS kept_chars,
              CAST(sum(CASE WHEN rn > 8 THEN n_chars ELSE 0 END)
                   AS BIGINT) AS dropped_chars
       FROM ranked GROUP BY source""",
    survey="§7.5 curation ext (per-domain quota cap + audit)",
    note="per-source quota sampling — the C4/Gopher-style domain "
         "balancing pass: no source may contribute more than N docs "
         "(N=8 here), the kept set is the deterministic top-N by a "
         "declared quality ordering (n_chars DESC, doc_id tiebreak — "
         "swap in any scored rank), and the OUTPUT is the audit a "
         "pipeline reviews before committing the cut: per-source "
         "total/kept counts and the char volume the cap kept vs "
         "discarded. Complements ext_train_split (rate-based) and "
         "ext_kfold_assign (hash-based): quota is RANK-based, the "
         "only family that bounds a heavy domain's contribution "
         "regardless of corpus growth. ONE shuffle: the rank window "
         "partitions on source and the audit groupBy reuses the same "
         "clustering (subset key), so Catalyst inserts no second "
         "exchange. All-integer outputs",
    tags=("llm-pipeline",))
def ext_domain_quota_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("source", "n_chars",
                                             "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                             "doc_id")
    kept = F.col("__rn") <= 8
    return (d.withColumn("__rn", F.row_number().over(w))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(kept, 1).otherwise(0)).cast("long")
                 .alias("n_kept"),
                 F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
                 .cast("long").alias("kept_chars"),
                 F.sum(F.when(~kept, F.col("n_chars")).otherwise(0))
                 .cast("long").alias("dropped_chars")))


@register(
    "ext_label_outliers",
    """WITH flat AS (
         SELECT vec_id, label,
                generate_subscripts(embedding, 1) AS pos,
                CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                           * 1048576) AS BIGINT) AS xq
         FROM embeddings),
       cent AS (
         SELECT label, pos, CAST(sum(xq) AS BIGINT) AS s
         FROM flat GROUP BY label, pos),
       parts AS (
         SELECT f.vec_id, f.label,
                CAST(sum(f.xq * c.s) AS BIGINT) AS xc,
                CAST(sum(f.xq * f.xq) AS BIGINT) AS xx
         FROM flat f JOIN cent c
           ON f.label = c.label AND f.pos = c.pos
         GROUP BY f.vec_id, f.label),
       cnorm AS (
         SELECT label, CAST(sum(s * s) AS BIGINT) AS cc
         FROM cent GROUP BY label),
       scored AS (
         SELECT p.vec_id, p.label,
                round(CAST(p.xc AS DOUBLE)
                      / (sqrt(CAST(p.xx AS DOUBLE))
                         * sqrt(CAST(n.cc AS DOUBLE))), 6) AS cosine
         FROM parts p JOIN cnorm n USING (label))
       SELECT label, vec_id, cosine,
              CAST(rnk AS BIGINT) AS rank
       FROM (SELECT scored.*,
                    row_number() OVER (PARTITION BY label
                                       ORDER BY cosine, vec_id) AS rnk
             FROM scored)
       WHERE rnk <= 3""",
    survey="§7.5 curation ext (noisy-label detection, centroid dist)",
    note="label-error mining (confident-learning-lite): each label's "
         "centroid over its member embeddings, then the 3 members "
         "per label with the LOWEST cosine to their own centroid — "
         "the mislabeled-candidate review queue every labeled-data "
         "pipeline runs. Cross-engine exactness by construction: "
         "components are quantized to a 2^20 integer grid with "
         "floor() (no rounding-tie semantics), the centroid is the "
         "integer SUM vector (order-free, exact — dividing by n "
         "would reintroduce engine-ordered float error and cancels "
         "out of cosine anyway), and all three inner products "
         "(x·s, x·x, s·s) are exact int64 sums, so the one float "
         "division both engines perform sees bit-identical inputs. "
         "Magnitudes: |xq| <= 6.2e5, per-label n ~ 200 at sf0.1 so "
         "s <= 1.3e8, s·s sums to ~1e18 < int64 max; at larger "
         "corpus scale switch s to the mean-scaled variant and cc "
         "to DECIMAL(38,0) (documented, not needed at bench sfs). "
         "Plan: one explode (scan-stage), two combinable groupBys, "
         "the centroid join broadcasts (labels x 64 dims rows), "
         "per-label top-3 via window. At 100 TB: flat layout is the "
         "columnar index scan, centroids are an offline artifact",
    tags=("llm-pipeline",))
def ext_label_outliers(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    flat = (emb.select(
        "vec_id", "label",
        F.posexplode(F.transform("embedding",
                                 lambda x: x.cast("double")))
        .alias("pos0", "x"))
        .select("vec_id", "label", (F.col("pos0") + 1).alias("pos"),
                F.floor(F.col("x") * 1048576).cast("long").alias("xq")))
    cent = (flat.groupBy("label", "pos")
            .agg(F.sum("xq").alias("s")))
    parts = (flat.join(F.broadcast(cent), ["label", "pos"])
             .groupBy("vec_id", "label")
             .agg(F.sum(F.col("xq") * F.col("s")).alias("xc"),
                  F.sum(F.col("xq") * F.col("xq")).alias("xx")))
    cnorm = (cent.groupBy("label")
             .agg(F.sum(F.col("s") * F.col("s")).alias("cc")))
    cos = F.round(F.col("xc").cast("double")
                  / (F.sqrt(F.col("xx").cast("double"))
                     * F.sqrt(F.col("cc").cast("double"))), 6)
    scored = (parts.join(F.broadcast(cnorm), "label")
              .select("vec_id", "label", cos.alias("cosine")))
    w = Window.partitionBy("label").orderBy("cosine", "vec_id")
    return (scored.withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= 3)
            .select("label", "vec_id", "cosine",
                    F.col("__rnk").cast("long").alias("rank")))


from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_search import (  # noqa: E402
    _TOK_SQL,
)

# compose the shared portable tokenizer (the ext_keyword_search
# pattern) rather than duplicating it — the whitespace class was
# tuned for Java-vs-RE2 \\s semantics and must stay single-sourced
_EVAL_TOK_SQL = f"{_TOK_SQL} AND tt.term IN ('spark', 'window', 'merge')"


@register(
    "ext_retrieval_eval",
    f"""WITH tok AS ({_EVAL_TOK_SQL}),
       tf AS (SELECT doc_id, term, count(*) AS tf
              FROM tok GROUP BY doc_id, term),
       ranked AS (
         SELECT term, doc_id,
                row_number() OVER (PARTITION BY term
                                   ORDER BY tf DESC, doc_id) AS rnk
         FROM tf),
       rel AS (
         SELECT r.term, r.rnk, (d.lang = 'en') AS is_rel
         FROM ranked r JOIN documents d USING (doc_id))
       SELECT term,
              CAST(min(CASE WHEN is_rel THEN rnk END) AS BIGINT)
                  AS first_rel_rank,
              CAST(sum(CASE WHEN is_rel AND rnk <= 10
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS rel_in_top10,
              CAST(count(*) AS BIGINT) AS n_candidates
       FROM rel GROUP BY term""",
    survey="§7.5 retrieval ext (ranking evaluation: MRR/recall@k)",
    note="retrieval EVALUATION — the metrics loop that closes the "
         "search family (index/BM25/phrase/RRF build rankings; "
         "nothing graded them): per query term, rank candidate docs "
         "by exact term frequency (tf DESC, doc_id tiebreak — the "
         "integer core of any lexical ranker), mark docs relevant by "
         "a declared labeling (lang='en' stands in for the judgment "
         "file of a real eval set), and emit the integer metric "
         "COMPONENTS: rank of the first relevant hit (reciprocal = "
         "MRR, derived client-side under the registry quotient "
         "rule), relevant-in-top-10 (recall@10 numerator), and the "
         "candidate count. Tokens use the engine-portable explicit "
         "whitespace class (registry_search._TOK_SQL discipline). "
         "Plan: tokenize+filter in the scan stage, one (doc,term) "
         "combinable agg, per-term rank window, broadcast-size "
         "doc-metadata join. At 100 TB the judgment join keys on "
         "(query, doc) pairs that fit memory per eval set",
    tags=("llm-pipeline",))
def ext_retrieval_eval(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    d = t(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(tokens("text")).alias("term"))
           .filter(F.col("term").isin("spark", "window", "merge")))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    ranked = tf.withColumn("rnk", F.row_number().over(w))
    rel = (ranked.join(d.select("doc_id", "lang"), "doc_id")
           .select("term", "rnk",
                   (F.col("lang") == "en").alias("is_rel")))
    return (rel.groupBy("term")
            .agg(F.min(F.when(F.col("is_rel"), F.col("rnk")))
                 .cast("long").alias("first_rel_rank"),
                 F.sum(F.when(F.col("is_rel") & (F.col("rnk") <= 10),
                              1).otherwise(0)).cast("long")
                 .alias("rel_in_top10"),
                 F.count("*").cast("long").alias("n_candidates")))


@register(
    "e10_cohort_retention",
    """WITH wk AS (
         SELECT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS w,
                CAST(date_trunc('week', min(ts) OVER (
                     PARTITION BY user_id)) AS DATE) AS cohort_week
         FROM events),
       act AS (SELECT DISTINCT user_id, w, cohort_week FROM wk)
       SELECT cohort_week,
              CAST((w - cohort_week) // 7 AS BIGINT) AS week_offset,
              CAST(count(*) AS BIGINT) AS n_users
       FROM act GROUP BY cohort_week, week_offset""",
    survey="§7.5 events ext (cohort retention matrix)",
    note="weekly cohort retention — the canonical engagement triangle "
         "(cohort = ISO week of a user's FIRST event; cell (c, k) = "
         "distinct cohort-c users active in week c+k). Both engines "
         "truncate weeks to Monday (Spark trunc(d,'week') == DuckDB "
         "date_trunc('week')), offsets are exact integer day "
         "differences // 7, counts are integers. The cohort week "
         "comes from a min-over-user WINDOW rather than a self-join "
         "with a per-user aggregate, so the plan needs only TWO "
         "exchanges: one user_id shuffle feeds the window AND the "
         "(user, week, cohort) distinct (HashPartitioning(user) "
         "satisfies the wider clustering), then the tiny distinct "
         "frame shuffles once onto the (cohort, offset) matrix "
         "cells. At 100 TB the events table is time-partitioned and "
         "the user shuffle is the one unavoidable move; the matrix "
         "is weeks x offsets rows — nothing wide ever materializes",
    tags=("llm-pipeline",))
def e10_cohort_retention(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        normalize_event_time,
    )

    ev = normalize_event_time(t(spark, sf_dir, "events"))
    wu = Window.partitionBy("user_id")
    wk = (ev.select(
        "user_id",
        F.trunc(F.col("ts").cast("date"), "week").alias("w"),
        F.trunc(F.min(F.col("ts").cast("date")).over(wu), "week")
        .alias("cohort_week")))
    act = wk.distinct()
    return (act.groupBy(
        "cohort_week",
        (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
        .cast("long").alias("week_offset"))
        .agg(F.count("*").alias("n_users")))


@register(
    "x15_referential_integrity",
    """WITH pairs AS (
         SELECT 'lineitem->orders' AS relationship,
                (SELECT count(*) FROM lineitem) AS n_child,
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                    AS n_orphans
         UNION ALL
         SELECT 'orders->customer',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
         UNION ALL
         SELECT 'lineitem->part',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
         UNION ALL
         SELECT 'lineitem->supplier',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
         UNION ALL
         SELECT 'customer->nation',
                (SELECT count(*) FROM customer),
                (SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
         UNION ALL
         SELECT 'supplier->nation',
                (SELECT count(*) FROM supplier),
                (SELECT count(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = s.s_nationkey)))
       SELECT relationship,
              CAST(n_child AS BIGINT) AS n_child,
              CAST(n_orphans AS BIGINT) AS n_orphans
       FROM pairs""",
    survey="§7.5 quality ext (referential-integrity audit)",
    note="foreign-key orphan audit across the whole star schema — "
         "the load-validation gate a warehouse runs after every "
         "batch (the reference's quality checks validate "
         "single-table shape; this validates the JOINS its marts "
         "depend on: every fact row must resolve its dimension "
         "keys). One row per declared FK edge: child cardinality + "
         "orphan count via LEFT ANTI join (null-safe NOT EXISTS "
         "semantics, the j4/j5 family applied as an audit). Spark "
         "plan: each anti-join broadcasts the smaller dim or "
         "shuffles on the key, counts are map-side-combinable; the "
         "six audits are independent branches unioned into a "
         "6-row report. At 100 TB run per-partition after each "
         "incremental load — the anti-join prunes to the loaded "
         "partitions",
    tags=())
def x15_referential_integrity(spark, sf_dir):
    def audit(rel, child, ckey, parent, pkey):
        c = t(spark, sf_dir, child)
        p = t(spark, sf_dir, parent).select(pkey)
        orphans = c.join(p, c[ckey] == p[pkey], "left_anti")
        return (c.agg(F.count("*").alias("n_child"))
                .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
                .select(F.lit(rel).alias("relationship"),
                        F.col("n_child").cast("long"),
                        F.col("n_orphans").cast("long")))

    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("customer->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
    ]
    out = audit(*edges[0])
    for e in edges[1:]:
        out = out.unionByName(audit(*e))
    return out


@register(
    "stream_quota_admission",
    """WITH r AS (
         SELECT event_type,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) AS rn
         FROM events)
       SELECT event_type,
              CAST(sum(CASE WHEN rn <= 1000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_admitted,
              CAST(sum(CASE WHEN rn > 1000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_rejected
       FROM r GROUP BY event_type""",
    survey="§7.5 streaming ext (stateful admission quota / rate limit)",
    note="batch meaning of the custom stateful admission-quota "
         "operator (streaming/admission.py, applyInPandasWithState): "
         "the stream keeps (admitted, rejected) running totals per "
         "event_type as explicit state and admits at most 1000 "
         "events per key in the DECLARED order (ts, event_id) — the "
         "ingest-tier rate limiter every pipeline front door runs. "
         "stream==batch equivalence — a key crossing its cap "
         "MID-micro-batch and a later batch arriving fully over-cap "
         "— is pinned in tests/test_r9.py. Batch twin is the "
         "rank-and-count idiom (ext_domain_quota_sample applied to "
         "events): window + same-key groupBy, one shuffle. At 100 TB "
         "stream state is two longs per key — O(keys), never "
         "O(events)",
    tags=("llm-pipeline",))
def stream_quota_admission(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        normalize_event_time,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.admission import (
        quota_admit_batch,
    )

    return quota_admit_batch(
        normalize_event_time(t(spark, sf_dir, "events")), cap=1000)


@register(
    "ts6_twap_components",
    """WITH o AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(CAST(value AS DECIMAL(19,2)) * 100 AS BIGINT)
                    AS cents,
                epoch_us(lead(ts) OVER (
                    PARTITION BY event_type, CAST(ts AS DATE)
                    ORDER BY ts, event_id)) - epoch_us(ts) AS dur
         FROM events)
       SELECT event_type, day,
              CAST(count(*) AS BIGINT) AS n_intervals,
              CAST(sum(dur) AS BIGINT) AS sum_dur_us,
              CAST(sum(cents * dur) AS BIGINT) AS sum_cents_dur
       FROM o WHERE dur IS NOT NULL
       GROUP BY event_type, day""",
    survey="§7.5 temporal ext (time-weighted average components)",
    note="TWAP components per (event_type, day) — the time-weighted "
         "sibling of ts5's VWAP: each observation holds until the "
         "next one (dur = lead(ts) - ts within the partition, the "
         "last observation of a day carries no interval — declared), "
         "and the average derives client-side as sum_cents_dur / "
         "(100 * sum_dur_us) under the registry quotient rule. "
         "Components are MERGEABLE integers: value carries exactly 2 "
         "real decimals so per-row CENTS are exact (double->decimal "
         "on the RAW column, the ts5 idiom — DECIMAL(19,2) in DuckDB "
         "so the x100 multiplies in int128, decimal(18,2) in Spark "
         "so precision stays under 38), durations are exact integer "
         "micros, and cents x dur sums to ~1e17 at sf0.1 — inside "
         "int64 (document: at much larger day-partitions scale dur "
         "to millis). ONE exchange: the lead window and the groupBy "
         "share the (event_type, day) clustering. At 100 TB the "
         "events table is day-partitioned so both are partition-local",
    tags=())
def ts6_twap_components(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        normalize_event_time,
    )

    ev = normalize_event_time(t(spark, sf_dir, "events"))
    # materialize day as an ATTRIBUTE before the window: partitioning
    # on the cast-expression would leave the downstream groupBy's
    # clustering unrecognized and buy a second exchange
    ev = ev.select(
        "event_type", F.col("ts").cast("date").alias("day"),
        "ts", "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        .alias("cents"))
    w = Window.partitionBy("event_type", "day").orderBy("ts",
                                                        "event_id")
    ev = ev.select(
        "event_type", "day", "cents",
        (F.unix_micros(F.lead("ts").over(w))
         - F.unix_micros(F.col("ts"))).alias("dur"))
    return (ev.filter(F.col("dur").isNotNull())
            .groupBy("event_type", "day")
            .agg(F.count("*").alias("n_intervals"),
                 F.sum("dur").alias("sum_dur_us"),
                 F.sum(F.col("cents") * F.col("dur"))
                 .alias("sum_cents_dur")))


def _mmr_oracle(k: int = 5) -> str:
    """DuckDB oracle for the quantized-MMR twin: the greedy loop
    unrolled into k static argmax CTEs. Each step cross-joins the
    1-row earlier picks, excludes them, penalizes by the max pairwise
    integer dot to the selected set, and takes the single best by
    (mmr DESC, key) — bit-determined because every score is int64."""
    steps = ["""s1 AS (SELECT vec_id, r, CAST(7 * r AS BIGINT) AS mmr
                FROM short ORDER BY r DESC, vec_id LIMIT 1)"""]
    for i in range(2, k + 1):
        prevs = list(range(1, i))
        tables = ", ".join([f"s{j}" for j in prevs]
                           + [f"pair p{j}" for j in prevs])
        notin = ", ".join(f"s{j}.vec_id" for j in prevs)
        conds = " AND ".join(
            f"p{j}.va = s.vec_id AND p{j}.vb = s{j}.vec_id"
            for j in prevs)
        pens = ", ".join(f"p{j}.d" for j in prevs)
        pen = pens if i == 2 else f"greatest({pens})"
        steps.append(
            f"""s{i} AS (
         SELECT s.vec_id, s.r,
                CAST(7 * s.r - 3 * {pen} AS BIGINT) AS mmr
         FROM short s, {tables}
         WHERE s.vec_id NOT IN ({notin}) AND {conds}
         ORDER BY 7 * s.r - 3 * {pen} DESC, s.vec_id LIMIT 1)""")
    unions = "\n       UNION ALL\n       ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, mmr AS mmr_score "
        f"FROM s{i}" for i in range(1, k + 1))
    steps_sql = ",\n       ".join(steps)
    return f"""WITH {_GRID_CODES_SQL},
       qc AS (SELECT pos, c AS qcode FROM codes WHERE vec_id = 0),
       rel AS (
         SELECT codes.vec_id,
                CAST(sum(codes.c * qc.qcode) AS BIGINT) AS r
         FROM codes JOIN qc USING (pos)
         WHERE codes.vec_id <> 0
         GROUP BY codes.vec_id),
       short AS MATERIALIZED (
                 SELECT vec_id, r FROM rel
                 ORDER BY r DESC, vec_id LIMIT 20),
       sc AS MATERIALIZED (
              SELECT codes.vec_id, pos, c
              FROM codes JOIN short USING (vec_id)),
       pair AS MATERIALIZED (
         SELECT a.vec_id AS va, b.vec_id AS vb,
                CAST(sum(a.c * b.c) AS BIGINT) AS d
         FROM sc a JOIN sc b USING (pos)
         WHERE a.vec_id <> b.vec_id
         GROUP BY a.vec_id, b.vec_id),
       {steps_sql}
       {unions}"""


@register(
    "ext_mmr_portable_topk",
    _mmr_oracle(5),
    survey="§7.5 retrieval ext (MMR diversity re-rank, quantized twin)",
    note="the oracle-checkable twin of ext_mmr_diversify (which is "
         "deliberately rows-only: float greedy argmax has no SQL "
         "form). Two moves make MMR hash-checkable: greedy selection "
         "over a FIXED k unrolls into k static argmax steps (no "
         "recursion — each step excludes the earlier 1-row picks and "
         "takes the best by score then key), and int8-grid dots "
         "(grid_codes, the quantized-ANN 'codebook') replace float "
         "cosines so the MMR score 7·rel − 3·max_sim (λ=0.7 ×10) is "
         "exact int64 — every comparison bit-determined on both "
         "engines. Pipeline: integer-ADC relevance scan over the "
         "session-cached codes index (portable_grid_index — the r10 "
         "re-encode: corpus-only codebook, query clamps in, no "
         "corpus-wide fit on the probe path), top-20 shortlist, ONE "
         "pairwise integer dot table (shortlist² bounded rows), "
         "then the 5 greedy argmax steps as higher-order ARRAY "
         "expressions over the collected shortlist/pair arrays — "
         "one projection on a 1-row frame (r10: the r9 shape ran "
         "the constant-bounded greedy tail as ~17 adaptive micro-"
         "stages costing more than the corpus scan; constant work "
         "belongs in one task. The shortlist/pair frames stay "
         "lazily checkpointed — short feeds its array AND both "
         "pair sides, else the ADC scan re-runs 3× per probe — so "
         "an uncached build still pays ~7 AQE stage jobs, absorbed "
         "once per session by the _MMR_PORTABLE cache). "
         "Independent-model check + selection-diversity property "
         "in tests/test_r9.py. At 100 TB: corpus cost is the ADC "
         "scan; everything after is shortlist-bounded",
    tags=("llm-pipeline",))
def ext_mmr_portable_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        mmr_quantized_topk,
    )

    # Session-cache the CONSTRUCTED probe (r9 advisor): the
    # shortlist/pair checkpoints are lazy, but under AQE even a lazy
    # localCheckpoint materializes its upstream shuffle stages at
    # plan-to-RDD time (all but the final stage), so an UNCACHED
    # build still costs ~7 jobs — measured, index pre-built — on
    # every schema-only registry sweep. One construction per
    # (session, table); bounded like _PORTABLE_GRID_INDEX.
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _MMR_PORTABLE.get(key)
    if got is None:
        emb = t(spark, sf_dir, "embeddings").select("vec_id",
                                                    "embedding")
        stats, codes = portable_grid_index(spark, sf_dir)
        got = mmr_quantized_topk(
            emb.filter(F.col("vec_id") != 0),
            emb.filter(F.col("vec_id") == 0),
            k=5, shortlist=20, stats=stats, codes=codes)
        _MMR_PORTABLE[key] = got
    return got
