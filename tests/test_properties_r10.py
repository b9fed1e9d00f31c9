"""Property tests for the round-10 portable twins: randomized inputs
compared against independent pure-Python models (the
test_properties_search.py discipline). The corpus-level pins in
test_r10.py anchor the registry entries on the driver testdata; these
catch semantic edge cases the fixed corpus cannot — degenerate
graphs, out-of-range query dimensions, duplicate/self edges,
tie-heavy scores."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])

edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=7)),
    min_size=1, max_size=20)


@SETTINGS
@given(edges_strategy,
       st.integers(min_value=2, max_value=3),
       st.integers(min_value=0, max_value=2))
def test_k_core_rounds_matches_python_peeler(spark, edge_list, k,
                                             rounds):
    """Bounded-round peel == an independent Python peeler for ANY
    graph (self loops dropped, edges deduped/symmetrized), any k,
    any round count — including rounds=0 (pure degree table)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        k_core_rounds,
    )

    df = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = {(r.node, r.core_degree) for r in
           k_core_rounds(df, k=k, rounds=rounds).collect()}

    sym = {(u, v) for u, v in edge_list if u != v}
    sym |= {(v, u) for u, v in sym}
    for _ in range(rounds):
        deg = Counter(u for u, _ in sym)
        keep = {u for u, c in deg.items() if c >= k}
        sym = {(u, v) for u, v in sym if u in keep and v in keep}
    want = set(Counter(u for u, _ in sym).items())
    assert got == want


@SETTINGS
@given(edges_strategy, st.integers(min_value=1, max_value=2))
def test_pagerank_fixed_point_matches_python_model(spark, edge_list,
                                                   iterations):
    """The fixed-point recurrence is bit-determined for ANY directed
    graph — dangling nodes, SELF-LOOPS (kept, the standard PageRank
    semantics: a self-loop feeds back its own rank; hypothesis
    caught a first model draft that wrongly dropped them), duplicate
    edges (deduped), single-node graphs — and any round count.
    Exact integer equality."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        pagerank_fixed_point,
    )

    df = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    scale = 10 ** 9
    got = {r.node: r.rank_fp for r in
           pagerank_fixed_point(df, iterations=iterations,
                                scale=scale).collect()}

    e = set(edge_list)
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    outdeg = Counter(u for u, _ in e)
    teleport = (15 * scale) // (100 * n)
    r = {x: scale // n for x in nodes}
    for _ in range(iterations):
        dang = sum(rv for x, rv in r.items() if x not in outdeg)
        share = dang // n
        insum = {x: 0 for x in nodes}
        for u, v in e:
            insum[v] += r[u] // outdeg[u]
        r = {x: teleport + (85 * (insum[x] + share)) // 100
             for x in nodes}
    assert got == r
    assert sum(got.values()) <= scale


vec_strategy = st.lists(
    st.floats(min_value=-50.0, max_value=50.0, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=3, max_size=3)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(vec_strategy, min_size=1, max_size=6), vec_strategy)
def test_grid_codes_matches_python_model(spark, corpus_vecs, qvec):
    """The corpus-only codebook + clamp rule for ANY corpus and ANY
    query (including dimensions far outside the corpus range, and
    degenerate mx == mn dimensions): codes equal the Python model
    exactly and stay within [-128, 127]."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        grid_codes,
        grid_stats,
    )

    rows = [(i + 1, [float(x) for x in v])
            for i, v in enumerate(corpus_vecs)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    query = spark.createDataFrame(
        [(0, [float(x) for x in qvec])],
        "vec_id bigint, embedding array<double>")
    stats = grid_stats(corpus)
    got = {(r.vec_id, r.pos): r.c for r in
           grid_codes(query, stats=stats).union(
               grid_codes(corpus, stats=stats)).collect()}

    dim = 3
    mn = [min(v[p] for _, v in rows) for p in range(dim)]
    mx = [max(v[p] for _, v in rows) for p in range(dim)]

    def code(v):
        out = []
        for p in range(dim):
            if mx[p] == mn[p]:
                out.append(-128)
            else:
                x = min(max(v[p], mn[p]), mx[p])
                out.append(int(math.floor((x - mn[p]) * 255.0
                                          / (mx[p] - mn[p]))) - 128)
        return out

    want = {}
    for key, v in [(0, [float(x) for x in qvec])] + rows:
        for p, c in enumerate(code(v), start=1):
            want[(key, p)] = c
    assert got == want
    assert all(-128 <= c <= 127 for c in got.values())


WORDS = ["spark", "join", "data", "window", "merge", "scan", "the"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(WORDS), min_size=1,
                         max_size=10),
                min_size=1, max_size=8),
       st.lists(st.sampled_from(WORDS), min_size=1, max_size=3,
                unique=True))
def test_bm25_portable_matches_python_model(spark, doc_words, terms):
    """The fixed-order-sum BM25 twin equals the independent Python
    model within rounding for ANY corpus/terms — including docs with
    zero hits (absent from both), single-doc corpora, and tie-heavy
    repetitions."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        bm25_portable_topk,
        bm25_score_py,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: r.score for r in
           bm25_portable_topk(df, "doc_id", "text", terms,
                              k=100).collect()}
    want = bm25_score_py(dict(docs), terms)
    assert set(got) == set(want)
    for d, s in got.items():
        assert abs(s - want[d]) < 1e-6, (d, s, want[d])
