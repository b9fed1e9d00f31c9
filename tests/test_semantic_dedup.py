"""SemDeDup (operators/similarity.py:semantic_dedup) invariants.

The registry entry is rows-only (KMeans init is engine-specific), so
these tests carry the correctness weight: the flagged output must be a
partition of the input into duplicate groups with exactly one survivor
each, survivors must contain no near-dup pair within any cluster, the
survivor must be the paper's pick (least centroid-similar, min-key
tiebreak), and the whole thing must be deterministic and monotone in
the threshold.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
    fit_ivf_quantizer,
    semantic_dedup,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def _corpus(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    clones = (emb.filter(F.col("vec_id") % 7 == 0)
              .select((F.col("vec_id") + 1000000).alias("vec_id"),
                      F.expr("transform(embedding, (x, i) -> "
                             "CAST(x * (1.0d + 0.001d * cos(CAST(i AS "
                             "DOUBLE) + CAST(vec_id AS DOUBLE))) AS "
                             "FLOAT))").alias("embedding"),
                      F.col("label")))
    return emb, emb.unionByName(clones)


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb, corpus = _corpus(spark, sf_dir)
    model = fit_ivf_quantizer(emb, n_clusters=8)
    out = semantic_dedup(corpus, model=model, threshold=0.95).collect()
    return corpus, model, out


def test_partition_one_survivor_per_group(fitted):
    corpus, _, out = fitted
    keys = {r.vec_id for r in out}
    assert len(out) == len(keys) == corpus.count()
    groups: dict = {}
    for r in out:
        groups.setdefault(r.group_id, []).append(r)
    for gid, members in groups.items():
        assert sum(r.is_survivor for r in members) == 1
        # group id is the component's min key: a member of the group
        assert gid in {r.vec_id for r in members}


def test_planted_clones_collapse(fitted):
    _, _, out = fitted
    by_key = {r.vec_id: r for r in out}
    n_clone_groups = 0
    for k, r in by_key.items():
        if k >= 1000000:
            orig = by_key[k - 1000000]
            # clone ~0.9999 cosine to its original -> same group
            assert r.group_id == orig.group_id, (k, r, orig)
            n_clone_groups += 1
    assert n_clone_groups > 0
    survivors = sum(r.is_survivor for r in out)
    assert survivors == len(out) - n_clone_groups


def test_no_surviving_near_dup_pair_within_cluster(spark, fitted):
    corpus, _, out = fitted
    vecs = {r.vec_id: r for r in corpus.collect()}
    surv = [r for r in out if r.is_survivor]
    by_cluster: dict = {}
    for r in surv:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        for i, a in enumerate(members):
            va = vecs[a.vec_id].embedding
            na = math.sqrt(sum(x * x for x in va))
            for b in members[i + 1:]:
                vb = vecs[b.vec_id].embedding
                nb = math.sqrt(sum(x * x for x in vb))
                cos = sum(x * y for x, y in zip(va, vb)) / (na * nb)
                assert cos < 0.95, (a.vec_id, b.vec_id, cos)


def test_survivor_is_least_centroid_similar(fitted):
    _, _, out = fitted
    groups: dict = {}
    for r in out:
        groups.setdefault(r.group_id, []).append(r)
    for members in groups.values():
        want = min(members, key=lambda r: (r.centroid_sim, r.vec_id))
        got = [r for r in members if r.is_survivor][0]
        assert got.vec_id == want.vec_id


def test_threshold_monotone_and_trivial_bounds(spark, fitted):
    corpus, model, out = fitted
    # impossible threshold -> everything survives as a singleton
    loose = semantic_dedup(corpus, model=model, threshold=1.5).collect()
    assert all(r.is_survivor for r in loose)
    assert len({r.group_id for r in loose}) == len(loose)
    # lower threshold -> groups only merge, never split: group count
    # (distinct survivors) is monotone non-increasing in threshold
    lower = semantic_dedup(corpus, model=model, threshold=0.4).collect()
    assert (sum(r.is_survivor for r in lower)
            <= sum(r.is_survivor for r in out))


def test_deterministic_rerun(fitted):
    corpus, model, out = fitted
    again = semantic_dedup(corpus, model=model, threshold=0.95).collect()
    key = lambda r: r.vec_id  # noqa: E731
    assert sorted(map(tuple, again), key=lambda t: t[0]) == \
        sorted(map(tuple, out), key=lambda t: t[0])


def test_inline_fit_requires_opt_in(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="allow_inline_fit"):
        semantic_dedup(emb, model=None)
