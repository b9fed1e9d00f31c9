"""Round-7 changes, pinned:

- maybe_broadcast size-gates the MERGE/CDC feed hint (r6 verdict
  item 3): a small feed still plans a broadcast anti join, a feed
  Catalyst estimates above the threshold goes UNHINTED so AQE owns
  the decision — no more un-demotable F.broadcast on a potentially
  billion-row CDC delta.
- k_core signals non-convergence (r6 advisor): exhausting max_rounds
  mid-peel warns instead of silently returning an over-approximation.
- novelty_ingest enforces its ingest-order contract (r6 advisor):
  out-of-order batches raise instead of silently mis-attributing.
- tools/parity.py rejects compared DECIMAL values beyond
  float64-exact width (the r6 a34 driver-hash lesson, rule #3).
- hard_negatives: label-mismatch + exact-cosine ordering verified
  against an independent numpy model.
- ivf_pq_topk: recall@10 floor vs brute force.
"""

from __future__ import annotations

import importlib.util
import os
import warnings
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    _threshold_bytes,
    apply_cdc,
    maybe_broadcast,
    merge_upsert,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity():
    spec = importlib.util.spec_from_file_location(
        "parity", os.path.join(_REPO, "tools", "parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- merge


def test_threshold_bytes_parses_units(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in [("10485760", 10485760), ("10MB", 10 << 20),
                          ("1kb", 1 << 10), ("-1", -1)]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _threshold_bytes(spark) == want, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_merge_small_feed_still_broadcasts(spark, sf_dir):
    """The common delta ≪ target case must keep its zero-target-shuffle
    plan: a feed Catalyst estimates under the threshold is hinted and
    the anti join is a BroadcastHashJoin in the INITIAL plan (not just
    after an AQE re-plan)."""
    target = read_table(spark, sf_dir, "orders")
    feed = target.limit(20)
    res = merge_upsert(target, feed, "o_orderkey", count_actions=False)
    assert "BroadcastHashJoin" in _plan(res.df), _plan(res.df)[:2000]


def test_merge_large_feed_is_not_force_broadcast(spark):
    """A feed whose size estimate exceeds the threshold must NOT carry
    the broadcast hint: the initial plan keeps a shuffle join and AQE
    makes the runtime call — the r6-verdict OOM scenario (forced
    broadcast of a billion-row CDC delta) is structurally gone."""
    # range stats: 8 bytes/row -> 40 MB estimate > 10 MB threshold
    target = spark.range(0, 10_000_000).withColumnRenamed("id", "k")
    feed = spark.range(0, 5_000_000).withColumnRenamed("id", "k")
    res = merge_upsert(target, feed, "k", order_by=[F.lit(1)],
                       count_actions=False)
    plan = _plan(res.df)
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, \
        plan[:3000]


def test_cdc_feed_gate_both_sides(spark):
    """apply_cdc goes through the same gate: a tiny feed broadcasts,
    a huge one doesn't."""
    target = spark.range(0, 8_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    small = spark.createDataFrame(
        [(1, 99, "U", 1), (2, 0, "D", 1)], ["k", "v", "op", "seq"])
    assert "BroadcastHashJoin" in _plan(
        apply_cdc(target, small, "k", seq_col="seq"))
    big = spark.range(0, 6_000_000).select(
        F.col("id").alias("k"), F.lit(0).alias("v"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"))
    plan = _plan(apply_cdc(target, big, "k", seq_col="seq"))
    assert "BroadcastHashJoin" not in plan, plan[:3000]


def test_maybe_broadcast_disabled_threshold_never_hints(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = spark.range(3)
        assert maybe_broadcast(df) is df
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------- k_core


def test_k_core_nonconvergence_warns(spark):
    """A 12-node path at k=2 peels one layer per round (each endpoint
    removal drops its neighbor to degree 1); 2 rounds cannot reach the
    fixpoint, and the caller must hear about it."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        k_core,
    )
    path = [(i, i + 1) for i in range(12)]
    edges = spark.createDataFrame(path, ["src", "dst"])
    with pytest.warns(RuntimeWarning, match="did not reach"):
        out = k_core(edges, k=2, max_rounds=2).collect()
    assert out  # over-approximation: still-peeling nodes remain

    # converged runs stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tri = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], ["src", "dst"])
        got = {r.node: r.core_degree
               for r in k_core(tri, k=2, max_rounds=10).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


# ------------------------------------------------------- novelty_ingest


def test_novelty_ingest_out_of_order_raises(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        novelty_index,
        novelty_ingest,
    )
    corpus = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "beta gamma delta eps")],
        ["doc_id", "text"])
    idx = novelty_index(corpus)
    late = spark.createDataFrame(
        [(5, "gamma delta eps zeta")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="out-of-order"):
        novelty_ingest(late, idx)
    # in-order batches and the explicit opt-out still work
    ok = spark.createDataFrame(
        [(12, "gamma delta eps zeta")], ["doc_id", "text"])
    scores, delta = novelty_ingest(ok, idx)
    assert scores.count() == 1
    scores2, _ = novelty_ingest(late, idx, check_order=False)
    assert scores2.count() == 1


# ------------------------------------------------------- parity canon


def test_parity_rejects_beyond_float64_decimals():
    parity = _load_parity()
    rows = [(Decimal("12345678901.123456789012"), 1)]
    bad = parity.decimal_width_violations(["wide", "n"], rows)
    assert bad and bad[0][0] == "wide"
    ok_rows = [(Decimal("1.500000"), Decimal("104950.25"), None, 7)]
    assert not parity.decimal_width_violations(
        ["a", "b", "c", "d"], ok_rows)


# ------------------------------------------------------- hard negatives


def test_hard_negatives_model_check(spark, sf_dir):
    """Independent numpy model: every returned negative must (a) carry
    a different label than its anchor, (b) rank in exact-cosine order,
    and (c) report the same cosine (±1e-6) numpy computes for that
    pair."""
    import math

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        hard_negatives,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = hard_negatives(emb, anchors, k=5).collect()
    vecs = {r.vec_id: (list(r.embedding), r.label)
            for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb)

    assert {r.anchor_id for r in got} == {0, 1, 2}
    by_anchor: dict = {}
    for r in got:
        av, al = vecs[r.anchor_id]
        nv, nl = vecs[r.negative_id]
        assert nl != al, (r.anchor_id, r.negative_id)
        assert abs(r.cosine - cos(av, nv)) < 2e-6
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for rows in by_anchor.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


# ------------------------------------------------------------- IVF+PQ


def test_ivf_pq_recall_floor(spark, sf_dir):
    """The composed probe must stay a useful approximation: recall@10
    against exact brute force at the registry's probe params
    (n_probe=8 of 16, rerank=100). Measured: 0.6 at sf0.001, 0.7 at
    sf0.01 (tools/recall_ladder.py discipline; r7 shipped an
    unmeasured 0.5 floor at n_probe=4, which observed 0.4). The
    PINNED floor is deliberately one recall step (0.1 = one
    neighbor) below the weakest measured sf — 0.5 — so a testdata
    regeneration that shifts one boundary neighbor doesn't flake the
    suite while a real regression (two+ lost neighbors) still
    fails."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        brute_force_topk,
        fit_ivf_quantizer,
        fit_pq_codebooks,
        ivf_pq_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    cand = emb.filter(F.col("vec_id") != 0)
    model = fit_ivf_quantizer(cand, n_clusters=16)
    books = fit_pq_codebooks(cand, m=16, n_codes=16)
    exact = {r.vec_id for r in brute_force_topk(cand, query, k=10)
             .collect()}
    approx = {r.vec_id for r in
              ivf_pq_topk(cand, query, model, books, k=10, n_probe=8,
                          rerank=100).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, recall

    # full probe + deep re-rank degrades to (almost) brute force
    full = {r.vec_id for r in
            ivf_pq_topk(cand, query, model, books, k=10, n_probe=16,
                        rerank=200).collect()}
    assert len(exact & full) / 10 >= 0.9, full


def test_ivf_pq_query_guards(spark, sf_dir):
    """Empty / NULL-embedding query frames must fail loudly (the
    pq_topk guard, mirrored per the r7 advisor), not with an opaque
    TypeError off ``first()``."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        fit_ivf_quantizer,
        fit_pq_codebooks,
        ivf_pq_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    model = fit_ivf_quantizer(emb, n_clusters=16)
    books = fit_pq_codebooks(emb, m=16, n_codes=16)
    with pytest.raises(ValueError, match="query frame is empty"):
        ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 0), model, books)
    nullq = emb.limit(1).select(
        "vec_id", F.lit(None).cast("array<double>").alias("embedding"))
    with pytest.raises(ValueError, match="query embedding is NULL"):
        ivf_pq_topk(emb, nullq, model, books)


def test_ivf_pq_registry_probe_plan_uses_materialized_index(spark):
    """The registry entry's probe plan must read the CHECKPOINTED
    index tables: no Python eval node (pq_encode's pandas UDF) and no
    per-probe corpus assignment (the r7-verdict scale-killer) — the
    codes/assignment scans appear as ExistingRDD."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r7 import (
        ext_ann_ivf_pq_topk,
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")
    plan = _plan(ext_ann_ivf_pq_topk(spark, sf))
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan, plan[:3000]
    assert "ExistingRDD" in plan, plan[:3000]
