"""Connected components: planted graph shapes, transitive closure of
dedup pairs, singleton handling, and a union-find cross-check on
pseudo-random graphs (including a long chain that only converges
because of pointer halving)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
    assign_clusters,
    connected_components,
)


def _components(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    rows = connected_components(edges, **kw).collect()
    return {r.node: r.component for r in rows}


def test_chain_ring_star_shapes(spark):
    got = _components(spark, [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11), (11, 12), (12, 10),    # ring
        (20, 21), (20, 22), (20, 23),    # star
        (30, 30),                        # self-loop only
    ])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20, 22: 20, 23: 20,
                   30: 30}


def test_transitivity_bridges_pairs(spark):
    # A~B and B~C never compared directly; one cluster regardless
    got = _components(spark, [(5, 9), (9, 2)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_long_chain_converges_by_halving(spark):
    # diameter 60 >> max_iterations: only O(log d) halving rounds fit
    n = 60
    got = _components(spark, [(i, i + 1) for i in range(n)],
                      max_iterations=12)
    assert got == {i: 0 for i in range(n + 1)}


def _union_find(edge_list):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of the set, which find() converges to here
    return {x: find(x) for x in parent}


def test_matches_union_find_on_random_graphs(spark):
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        edges = [(rng.randrange(120), rng.randrange(120))
                 for _ in range(90)]
        assert _components(spark, edges) == _union_find(edges), seed


def test_assign_clusters_keeps_singletons(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "z")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "key_a long, key_b long")
    out = assign_clusters(docs, "doc_id", pairs).collect()
    got = {r.doc_id: r.cluster_id for r in out}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}
    assert {r.text for r in out} == {"x", "y", "z"}  # payload preserved
