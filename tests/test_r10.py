"""Round-10 additions and repairs:

- The portable ANN twins' grid codebook is now an OFFLINE artifact
  (the r9-verdict item 1): grid stats fit corpus-only (never
  candidates ∪ query — the query clamps into the grid instead), and
  the registry probe paths read session-cached eager-checkpointed
  (stats, bucketed-codes) tables via registry_r9.portable_grid_index
  — zero corpus-wide aggregates on any probe plan.
- g8_label_propagation gains a DuckDB oracle (5 synchronous rounds
  unrolled into static CTEs — the r9 MMR playbook applied to integer
  min-label/argmax propagation).
- ext_bm25_portable_topk: hash-checkable BM25 twin (fixed-order
  per-term sum of rounded contributions).
- g9_k_core_portable: bounded-round integer peeling twin.
- g6_pagerank_portable: int64 fixed-point PageRank twin (damping as
  85/100 multiply-then-floor-divide, 5 fixed rounds).
- ext_decontaminate_bloom_portable: the Bloom prefilter re-hashed
  with the portable rolling-hash family (32-bit bitmap words) so the
  flagged set is bit-identical cross-engine.
- mmr_quantized_topk's greedy tail re-shaped into higher-order array
  expressions over the collected shortlist/pair arrays (one
  projection instead of ~17 adaptive micro-stages; 0.87 s → 0.32 s
  steady-state at sf0.1).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------- portable ANN index probes


def test_portable_ann_probe_plans_use_materialized_index(spark, sf_dir):
    """The r9-verdict item-1 pin (the ivf_pq pattern applied to the
    portable twins): neither probe plan may contain the grid codebook
    FIT — no min/max aggregate over the corpus posexplode anywhere —
    and both must read the checkpointed index (ExistingRDD). The only
    explode allowed in the IVFADC plan is the 1-row query branch; the
    MMR plan (post-checkpoint) contains none at all. No
    SortMergeJoin: the bucket prune is a broadcast semi on the code
    index's own bucket column, never a corpus × corpus key shuffle."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    ivfadc = _plan(REGISTRY["ext_ann_ivfadc_portable_topk"]
                   .build(spark, sf_dir))
    assert "ExistingRDD" in ivfadc
    for tok in ("partial_min", "partial_max", "min(x", "max(x",
                "SortMergeJoin", "ArrowEvalPython", "BatchEvalPython"):
        assert tok not in ivfadc, (tok, ivfadc[:3000])
    assert ivfadc.count("posexplode") == 1, ivfadc[:3000]

    # MMR: the probe plan is two checkpointed bounded frames
    # (shortlist + pair table) collected to arrays and one greedy
    # array-expression projection — the ADC scan, the query explode,
    # and the codebook live INSIDE the checkpoints, so the steady
    # plan has no parquet scan, no explode, no codebook fit, no
    # shuffle-merge join at all
    mmr = _plan(REGISTRY["ext_mmr_portable_topk"].build(spark, sf_dir))
    assert "ExistingRDD" in mmr
    for tok in ("partial_min", "min(x", "max(x", "posexplode",
                "SortMergeJoin", "Scan parquet"):
        assert tok not in mmr, (tok, mmr[:3000])


def test_portable_ann_warm_rebuild_runs_no_jobs(spark, sf_dir):
    """Schema-only registry sweeps must stay free (r9 advisor): once
    the session caches are warm, re-BUILDING either portable twin
    runs zero Spark jobs — the index build and the MMR shortlist/pair
    stages are once-per-(session, table) costs, not per-build
    costs."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    names = ("ext_ann_ivfadc_portable_topk", "ext_mmr_portable_topk")
    for n in names:  # warm the caches
        REGISTRY[n].build(spark, sf_dir)
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(name):
        # compare MAX job id (global, monotonic), never len(): the
        # status tracker retains a bounded job list, so late in a
        # long suite len() deltas corrupt as old ids are evicted
        # while new ones append (flaked once at ~1000 suite jobs)
        before = max(tracker.getJobIdsForGroup(), default=-1)
        REGISTRY[name].build(spark, sf_dir)
        return (max(tracker.getJobIdsForGroup(), default=before)
                - before)

    # the MMR probe is construction-cached outright: zero jobs
    assert jobs_for("ext_mmr_portable_topk") == 0
    # the IVFADC build may only pay what ANY parquet-reading builder
    # pays (spark.read.parquet's 1-task footer job) — nothing from
    # the probe itself (no stats fit, no shortlist/pair stages)
    assert jobs_for("ext_ann_ivfadc_portable_topk") \
        <= jobs_for("s1_scan_project")


def test_grid_codes_clamp_saturates(spark):
    """The corpus-only codebook rule: a query dimension outside the
    corpus [mn, mx] codes to the nearest grid edge (-128 / 127), the
    saturating-quantizer behavior that keeps the fit
    query-independent."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        grid_codes,
        grid_stats,
    )

    corpus = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0])],
        "vec_id bigint, embedding array<double>")
    query = spark.createDataFrame(
        [(0, [-5.0, 25.0])], "vec_id bigint, embedding array<double>")
    stats = grid_stats(corpus)
    got = {r.pos: r.c for r in
           grid_codes(query, stats=stats).collect()}
    assert got == {1: -128, 2: 127}
    # corpus rows are unaffected by the clamp (it is a no-op inside
    # the fitted range): edges code to -128 / 127 exactly
    cc = {(r.vec_id, r.pos): r.c for r in
          grid_codes(corpus, stats=stats).collect()}
    assert cc == {(1, 1): -128, (1, 2): -128, (2, 1): 127, (2, 2): 127}


def test_portable_grid_index_is_session_cached(spark, sf_dir):
    """Same (session, table) → the SAME checkpointed artifacts (no
    refit, identity equality — the ivf_pq_index discipline); the
    cache is keyed per table so distinct sf dirs stay distinct."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r9 import (
        portable_grid_index,
    )

    s1, c1 = portable_grid_index(spark, sf_dir)
    s2, c2 = portable_grid_index(spark, sf_dir)
    assert s1 is s2 and c1 is c2
    assert set(c1.columns) == {"vec_id", "bucket", "pos", "c"}


# ------------------------------------------------------- g8 oracle


def test_g8_oracle_matches_independent_python_lpa(spark, sf_dir):
    """g8's new DuckDB oracle is the unrolled twin of the Spark loop;
    this keeps the ORIGINAL r6 pin too — an independent Python LPA
    (synchronous, most-frequent-neighbor-label, ties to smallest)
    must agree with the Spark entry exactly."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    ev = read_table(spark, sf_dir, "events")
    edges = {(int(r.u), int(r.v)) for r in
             ev.select(F.col("user_id").alias("u"),
                       (F.lit(1000) + F.col("event_id") % 50)
                       .alias("v")).distinct().collect()}
    sym = edges | {(v, u) for u, v in edges}
    nbrs: dict[int, list[int]] = {}
    for u, v in sym:
        nbrs.setdefault(u, []).append(v)
    labels = {n: n for n in nbrs}
    for _ in range(5):
        new = {}
        for n, vs in nbrs.items():
            cnt: dict[int, int] = {}
            for v in vs:
                lv = labels[v]
                cnt[lv] = cnt.get(lv, 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new

    got = {r.node: r.label for r in
           REGISTRY["g8_label_propagation"].build(spark, sf_dir)
           .collect()}
    assert got == labels


# ---------------------------------------------------- bm25 portable


def test_bm25_portable_matches_float_twin_and_python_model(spark,
                                                           sf_dir):
    """The portable twin must be the SAME ranker, just re-encoded:
    its rounded scores equal the float bm25_topk's rounded scores on
    the same corpus/terms, and both match the independent Python
    model (bm25_score_py) within rounding."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        bm25_score_py,
        bm25_topk,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    terms = ["spark", "window", "merge"]
    got = {r.doc_id: r.score for r in
           REGISTRY["ext_bm25_portable_topk"].build(spark, sf_dir)
           .collect()}
    assert len(got) == 20

    docs_df = read_table(spark, sf_dir, "documents")
    flt = {r.doc_id: round(r.score, 6) for r in
           bm25_topk(docs_df, "doc_id", "text", terms, k=20).collect()}
    assert got == flt

    docs = {r.doc_id: r.text for r in
            docs_df.select("doc_id", "text").collect()}
    model = bm25_score_py(docs, terms)
    for d, s in got.items():
        assert abs(model[d] - s) < 1e-6, (d, s, model[d])


# ------------------------------------------------- k-core portable


def test_k_core_rounds_equals_fixpoint_where_converged(spark, sf_dir):
    """At sf0.001 the doc-successor 2-core peel converges in 6 rounds
    (measured), so the bounded-round twin must equal the true k_core
    fixpoint exactly — nodes AND in-core degrees. Also pin the
    non-vacuity that motivated this graph: the peel removes nodes
    (the raw node set strictly shrinks), so the entry exercises
    iteration, not just a degree filter."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        k_core,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph import (
        successor_edges,
    )

    docs = read_table(spark, sf_dir, "documents")
    edges = successor_edges(docs, steps=(1, 2))
    got = {(r.node, r.core_degree) for r in
           REGISTRY["g9_k_core_portable"].build(spark, sf_dir)
           .collect()}
    fix = {(r.node, r.core_degree) for r in
           k_core(edges, k=2).collect()}
    assert got == fix
    n_raw = (edges.selectExpr("src AS n").union(
        edges.selectExpr("dst AS n")).distinct().count())
    assert len(got) < n_raw


# ------------------------------------------- bounded index caches


def test_ivf_pq_index_cache_is_bounded_lru(spark, sf_dir):
    """r9 advisor: pinned index checkpoints must be hard-bounded; a
    replacement fitted model must get a fresh index, never the stale
    one (the r8 rule kept). r10 advisor: two LIVE models alternating
    in one session (a recall-ladder sweep comparing quantizers) must
    BOTH stay cached — the old single slot rebuilt and
    re-checkpointed both artifacts on every alternation. Post-round
    review: the bound is PER (session, table) — eviction never
    crosses tables, so a round-robin over many scale dirs keeps one
    pinned index per table."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        fit_ivf_quantizer,
        fit_pq_codebooks,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans import registry_r7

    emb = read_table(spark, sf_dir, "embeddings")
    saved = dict(registry_r7._IVF_PQ_INDEX)
    registry_r7._IVF_PQ_INDEX.clear()
    try:
        m1 = fit_ivf_quantizer(emb, n_clusters=4)
        m2 = fit_ivf_quantizer(emb, n_clusters=4)
        books = fit_pq_codebooks(emb, m=4, n_codes=4)
        a1, c1 = registry_r7.ivf_pq_index(spark, sf_dir, emb, m1, books)
        a1b, _ = registry_r7.ivf_pq_index(spark, sf_dir, emb, m1, books)
        assert a1b is a1  # same identities → cache hit
        a2, _ = registry_r7.ivf_pq_index(spark, sf_dir, emb, m2, books)
        assert a2 is not a1  # different fitted model → fresh index
        # the alternating-sweep pattern: BOTH live models stay cached
        a1c, _ = registry_r7.ivf_pq_index(spark, sf_dir, emb, m1, books)
        a2c, _ = registry_r7.ivf_pq_index(spark, sf_dir, emb, m2, books)
        assert a1c is a1 and a2c is a2
        # another TABLE's index is outside this group's bound
        ox, _ = registry_r7.ivf_pq_index(spark, sf_dir + "#other",
                                         emb, m1, books)
        # hard per-group bound: filling past the cap evicts the
        # group's least-recently-used, never the other table's entry
        extra = [fit_ivf_quantizer(emb, n_clusters=4) for _ in
                 range(registry_r7._IVF_PQ_INDEX_CAP)]
        for m in extra:
            registry_r7.ivf_pq_index(spark, sf_dir, emb, m, books)
        group = (spark.sparkContext.applicationId, sf_dir)
        assert (len([k for k in registry_r7._IVF_PQ_INDEX
                     if k[:2] == group])
                == registry_r7._IVF_PQ_INDEX_CAP)
        oxb, _ = registry_r7.ivf_pq_index(spark, sf_dir + "#other",
                                          emb, m1, books)
        assert oxb is ox  # cross-table entry survived the churn
        a1d, _ = registry_r7.ivf_pq_index(spark, sf_dir, emb, m1, books)
        assert a1d is not a1  # m1 was evicted in-group → rebuilt fresh
    finally:
        registry_r7._IVF_PQ_INDEX.clear()
        registry_r7._IVF_PQ_INDEX.update(saved)


# --------------------------------------------- fixed-point pagerank


def test_pagerank_fixed_point_matches_independent_model(spark, sf_dir):
    """Re-run the ENTIRE fixed-point recurrence in plain Python (same
    graph, same int64 floor divisions, same 5 rounds) and require the
    registry entry to match exactly — everything is integer, so there
    is no tolerance. Also pin mass conservation (floors only drop
    units: 0 < Σ rank_fp <= scale) and ranking sanity vs the float
    pagerank: the fixed-point top node is in the float top three
    (the twins share semantics up to 1e-12-unit floors and the float
    version's extra convergence rounds)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        pagerank,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph import (
        successor_edges,
    )

    docs = read_table(spark, sf_dir, "documents")
    edges = {(int(r.src), int(r.dst)) for r in
             successor_edges(docs, steps=(1, 2)).collect()}
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    scale = 10 ** 12
    outdeg: dict[int, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    teleport = (15 * scale) // (100 * n)
    r = {x: scale // n for x in nodes}
    for _ in range(5):
        dang = sum(rv for x, rv in r.items() if x not in outdeg)
        share = dang // n
        insum = {x: 0 for x in nodes}
        for u, v in edges:
            insum[v] += r[u] // outdeg[u]
        r = {x: teleport + (85 * (insum[x] + share)) // 100
             for x in nodes}

    got = {row.node: row.rank_fp for row in
           REGISTRY["g6_pagerank_portable"].build(spark, sf_dir)
           .collect()}
    assert got == r
    assert 0 < sum(got.values()) <= scale

    flt = {row.node: row.rank for row in
           pagerank(successor_edges(docs, steps=(1, 2)),
                    max_iterations=20).collect()}
    top_fp = max(got, key=lambda x: (got[x], -x))
    float_top3 = sorted(flt, key=lambda x: -flt[x])[:3]
    assert top_fp in float_top3, (top_fp, float_top3)


def test_pagerank_fixed_point_empty_edges(spark):
    """Empty edge set → empty (node, rank_fp) frame with the declared
    schema, never a driver-side ZeroDivisionError (the float twin's
    n == 0 contract, kept by the fixed-point twin)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        pagerank_fixed_point,
    )

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    out = pagerank_fixed_point(empty, iterations=3)
    assert out.columns == ["node", "rank_fp"]
    assert out.count() == 0


# ----------------------------------------------- portable bloom


def test_bloom_portable_no_false_negatives(spark, sf_dir):
    """The Bloom contract carried over to the portable twin: the
    flagged set must CONTAIN the exactly-contaminated set (false
    positives allowed — they re-check downstream; false negatives
    never). Also pin that the prefilter is not saturated: it flags
    fewer docs than the corpus."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    flagged = {r.flagged_doc_id for r in
               REGISTRY["ext_decontaminate_bloom_portable"]
               .build(spark, sf_dir).collect()}
    exact = {r.contaminated_doc_id for r in
             REGISTRY["ext_decontaminate"].build(spark, sf_dir)
             .collect()}
    assert exact <= flagged, sorted(exact - flagged)[:10]
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert len(flagged) < n_docs


# ------------------------------------------------- ORC roundtrip


def test_orc_readback_pushes_filter(spark, sf_dir):
    """The s19 probe's read-back filter must reach the ORC scan as a
    pushed predicate (the migration path for an existing ORC
    warehouse: same pruning behavior as the parquet scans). Plan
    .toString() truncates pushed-filter lists, so capture
    explain('formatted') instead (verify-skill gotcha)."""
    import contextlib
    import io

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    df = REGISTRY["s19_orc_roundtrip"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Scan orc" in plan, plan[:2000]
    assert "GreaterThan(l_quantity,25.0)" in plan, plan[:3000]
