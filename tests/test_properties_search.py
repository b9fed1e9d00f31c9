"""Property tests for the retrieval and graph families: randomized
corpora/graphs compared against independent pure-Python models, the
same discipline the curation family uses (test_curation.py)."""

from __future__ import annotations

import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
    connected_components,
    triangle_count,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
    keyword_search,
)

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

WORDS = ["spark", "join", "data", "window", "merge", "scan", "the"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=12)


@SETTINGS
@given(docs_strategy,
       st.lists(st.sampled_from(WORDS), min_size=1, max_size=3,
                unique=True))
def test_keyword_search_matches_python_model(spark, doc_words, terms):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = [(r.doc_id, r.score) for r in
           keyword_search(df, "doc_id", "text", terms, k=100).collect()]

    # independent model: conjunctive AND, score = total tf, ranked by
    # (score desc, doc_id asc)
    want = []
    for i, ws in enumerate(doc_words):
        c = Counter(ws)
        if all(c[t] > 0 for t in terms):
            want.append((i, sum(c[t] for t in terms)))
    want.sort(key=lambda p: (-p[1], p[0]))
    assert got == want


edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),
              st.integers(min_value=0, max_value=9)),
    min_size=0, max_size=25)


@SETTINGS
@given(edges_strategy)
def test_triangle_count_matches_python_model(spark, edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    want = sum(1 for a, b, c in itertools.combinations(nodes, 3)
               if (a, b) in und and (b, c) in und and (a, c) in und)

    if not edge_list:
        edge_list = [(0, 0)]  # createDataFrame needs >=1 row; self-loop
    edges = spark.createDataFrame(edge_list, "src int, dst int")
    got = triangle_count(edges).collect()[0].n_triangles
    assert got == want


@SETTINGS
@given(edges_strategy)
def test_connected_components_match_union_find(spark, edge_list):
    # independent union-find over the same edges
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    want = {n: find(n) for n in parent}

    if not edge_list:
        edge_list = [(0, 0)]
        want = {0: 0}
    edges = spark.createDataFrame(edge_list, "src int, dst int")
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == want
