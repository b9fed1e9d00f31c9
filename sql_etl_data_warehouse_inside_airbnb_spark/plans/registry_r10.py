"""Round-10 additions: four rows-only→hash-green conversions via the
proven r9 unroll/quantize playbook — the two the r9 verdict ranked
feasible (items 3 and 6: BM25, bounded k-core) plus two the same
playbook unlocked (fixed-point PageRank for the float-iterative
family, the portable-hash Bloom prefilter for the sketch family).

- ``ext_bm25_portable_topk``: hash-checkable Okapi BM25 — the scores
  are ln-based doubles, but every input is exact int64 (tf, df_t, N,
  dl; avgdl is one int64-sum / count division), the per-document sum
  is FIXED-ORDER (one conditional aggregate per query term, each
  holding at most one contribution — no float reduction order exists),
  and the compared column is round(score, 6) with the top-k cut on
  the ROUNDED score + key (the green round(cosine, 6) precedent).
  Operator: ``operators/search.py:bm25_portable_topk``.
- ``g9_k_core_portable``: bounded-round synchronous k-core peel —
  :func:`operators.graph.k_core_rounds` with a FIXED round count, so
  the pure-integer peel unrolls into static CTEs exactly like the g8
  LPA oracle. Runs on the same-lang doc successor graph (the g5
  edge set), whose peel is genuinely iterative (measured
  rounds-to-fixpoint 6/5/12 at sf0.001/0.01/0.1 for k=2) — the
  6-round output is the declared bounded-peel contract, equal to the
  true 2-core where it converges and a documented over-approximation
  where it does not (the same over-approximation k_core documents at
  max_rounds exhaustion).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)

_BM25_TERMS = ("spark", "window", "merge")
_K1 = 1.2
_B = 0.75


def _bm25_oracle(terms=_BM25_TERMS, k: int = 20,
                 k1: float = _K1, b: float = _B) -> str:
    """DuckDB oracle: identical formula, identical float literals
    (generated from the SAME Python floats the Spark side puts in
    lit(), so both engines parse bit-identical doubles), identical
    left-to-right addition order over the sorted query terms."""
    qterms = sorted(set(x.lower() for x in terms))
    inlist = ", ".join(f"'{x}'" for x in qterms)
    conds = ",\n           ".join(
        f"sum(CASE WHEN term = '{x}' THEN contrib END) AS c{i}"
        for i, x in enumerate(qterms))
    total = " + ".join(f"coalesce(c{i}, 0.0)"
                       for i in range(len(qterms)))
    return f"""WITH d AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)),
                    '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS toks
         FROM documents),
       base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                        avg(dl) AS avgdl FROM base),
       tok AS (SELECT d.doc_id, tt.term
               FROM d, UNNEST(toks) AS tt(term)
               WHERE tt.term IN ({inlist})),
       tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, term),
       dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t
                 FROM tf GROUP BY term),
       scored AS (
         SELECT tf.doc_id, tf.term,
                ln((s.n_docs - f.df_t + 0.5) / (f.df_t + 0.5) + 1.0)
                  * tf.tf * {k1 + 1.0!r}
                  / (tf.tf + {k1!r} * ({1.0 - b!r}
                                       + {b!r} * b2.dl / s.avgdl))
                    AS contrib
         FROM tf
         JOIN dfreq f USING (term)
         JOIN base b2 USING (doc_id)
         CROSS JOIN stats s),
       per AS (
         SELECT doc_id,
           {conds}
         FROM scored GROUP BY doc_id)
       SELECT doc_id, round({total}, 6) AS score
       FROM per
       ORDER BY score DESC, doc_id LIMIT {k}"""


@register(
    "ext_bm25_portable_topk",
    _bm25_oracle(),
    survey="§7.5 retrieval ext (BM25, hash-checkable twin)",
    note="the oracle-paired twin of ext_bm25_topk (rows-only since "
         "r4 — its per-doc score was a sum of doubles with no "
         "defined reduction order). Three moves make BM25 "
         "hash-checkable (operators/search.py:bm25_portable_topk): "
         "the per-doc sum becomes one conditional aggregate per "
         "query term — each holds at most ONE contribution because "
         "tf is already grouped per (doc, term) — added "
         "left-to-right in sorted-term order on both engines; the "
         "compared score is round(·, 6) (the ANN family's green "
         "precedent) with the top-20 cut ordered by the ROUNDED "
         "score + doc_id, so the cut set is engine-portable at "
         "boundary ties; and the SQL float literals are generated "
         "from the same Python floats the Spark lit()s carry, so "
         "both engines parse bit-identical doubles. Plan: one "
         "corpus (doc,term) aggregate (the only corpus-sized "
         "shuffle), broadcast term dictionary, 1-row broadcast "
         "N/avgdl, fixed-width pivot agg — zero UDFs. Agreement "
         "with the float bm25_topk ranking pinned in "
         "tests/test_r10.py",
    tags=("llm-pipeline",))
def ext_bm25_portable_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        bm25_portable_topk,
    )

    return bm25_portable_topk(t(spark, sf_dir, "documents"), "doc_id",
                              "text", list(_BM25_TERMS), k=20,
                              k1=_K1, b=_B)


def _k_core_oracle(k: int = 2, rounds: int = 6) -> str:
    """DuckDB oracle for the bounded-round peel: the g8 unroll
    playbook — each round is one grouped degree count (HAVING >= k)
    + two key joins restricting the edge set to kept endpoints.
    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, so each of
    the chain's ~3 references per round would re-execute its whole
    prefix — measured 11.6 s vs 0.04 s at sf0.01 for identical
    results."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""k{i - 1} AS MATERIALIZED (
         SELECT u FROM sym{i - 1} GROUP BY u HAVING count(*) >= {k}),
       sym{i} AS MATERIALIZED (
         SELECT s.u, s.v FROM sym{i - 1} s
         JOIN k{i - 1} a ON s.u = a.u
         JOIN k{i - 1} b ON s.v = b.u)""")
    steps_sql = ",\n       ".join(steps)
    return f"""WITH e AS MATERIALIZED (
         SELECT a.doc_id AS u, b.doc_id AS v
         FROM documents a JOIN documents b
           ON (b.doc_id = a.doc_id + 1 OR b.doc_id = a.doc_id + 2)
          AND b.lang = a.lang),
       sym0 AS MATERIALIZED (
         SELECT u, v FROM e UNION SELECT v, u FROM e),
       {steps_sql}
       SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
       FROM sym{rounds} GROUP BY u"""


@register(
    "g9_k_core_portable",
    _k_core_oracle(2, 6),
    survey="§7.5 graph ext (k-core, bounded-round hash-checkable twin)",
    note="the oracle-paired twin of g9_k_core (rows-only: its "
         "fixpoint probe is data-dependent, so no static SQL exists "
         "for it). operators/graph.py:k_core_rounds fixes the round "
         "count (6) and peels the same-lang doc successor graph (the "
         "g5 edge set — genuinely iterative here: measured "
         "rounds-to-fixpoint 6/5/12 at the three sfs for k=2, "
         "survivors 72/97/936, vs the user<->bucket graph where "
         "every peel is 0-2 rounds and usually empty), emitting "
         "(node, core_degree). Equal to the true 2-core where 6 "
         "rounds converge (sf0.001/0.01); the declared bounded-peel "
         "over-approximation where they don't (sf0.1) — the same "
         "over-approximation k_core documents at max_rounds "
         "exhaustion, here as contract. All int64; per round one "
         "combinable degree agg + two semi joins, localCheckpoint "
         "lineage control, zero driver traffic in the loop. "
         "Fixpoint-agreement-where-converged pinned in "
         "tests/test_r10.py")
def g9_k_core_portable(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        k_core_rounds,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph import (
        successor_edges,
    )

    docs = t(spark, sf_dir, "documents")
    return k_core_rounds(successor_edges(docs, steps=(1, 2)), k=2,
                         rounds=6)


_PR_SCALE = 1_000_000_000_000


def _pagerank_oracle(rounds: int = 5, scale: int = _PR_SCALE) -> str:
    """DuckDB oracle for the fixed-point PageRank twin: the g8/k-core
    unroll playbook on a float-iterative algorithm — every round is
    one dangling-mass scalar, one contributions aggregate (int64
    floor division r // out_deg), and one damped update
    teleport + (85 * (insum + dang // N)) // 100, all BIGINT."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS (
         SELECT coalesce(sum(r.r), 0) AS dang
         FROM r{i - 1} r LEFT JOIN od ON od.node = r.node
         WHERE od.node IS NULL),
       s{i} AS MATERIALIZED (
         SELECT e.dst AS node, CAST(sum(r.r // od.deg) AS BIGINT)
                    AS insum
         FROM e JOIN r{i - 1} r ON e.src = r.node
         JOIN od ON od.node = e.src
         GROUP BY e.dst),
       r{i} AS MATERIALIZED (
         SELECT n.node,
                CAST((SELECT (15 * {scale}) // (100 * ns.n) FROM ns)
                     + (85 * (coalesce(s.insum, 0)
                              + (SELECT d.dang // ns.n
                                 FROM d{i} d, ns))) // 100
                     AS BIGINT) AS r
         FROM nodes n LEFT JOIN s{i} s ON s.node = n.node)""")
    steps_sql = ",\n       ".join(steps)
    return f"""WITH e AS MATERIALIZED (
         SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
         FROM documents a JOIN documents b
           ON (b.doc_id = a.doc_id + 1 OR b.doc_id = a.doc_id + 2)
          AND b.lang = a.lang),
       nodes AS MATERIALIZED (
                 SELECT src AS node FROM e
                 UNION
                 SELECT dst AS node FROM e),
       ns AS MATERIALIZED (
              SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       od AS MATERIALIZED (
              SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
              FROM e GROUP BY src),
       r0 AS MATERIALIZED (SELECT node,
                     CAST((SELECT {scale} // ns.n FROM ns) AS BIGINT)
                         AS r
              FROM nodes),
       {steps_sql}
       SELECT node, r AS rank_fp FROM r{rounds}"""


@register(
    "g6_pagerank_portable",
    _pagerank_oracle(5),
    survey="§7.5 graph ext (PageRank, fixed-point hash-checkable twin)",
    note="the oracle-paired twin of g6_pagerank (rows-only: float "
         "iteration + L1 convergence have no cross-engine-exact SQL "
         "form). operators/graph.py:pagerank_fixed_point re-encodes "
         "the whole recurrence in int64 fixed point (1e-12 units): "
         "damping 85/100 as integer multiply-then-floor-divide, "
         "per-edge contribution r // out_deg, dangling mass "
         "redistributed as dang // N, round count FIXED at 5 — so "
         "every step is bit-identical on both engines (Spark div == "
         "DuckDB //, verified) and the loop unrolls into static "
         "CTEs. Graph: same-lang doc successors at steps 1 and 2 "
         "(out-degree 0-2, dangling run-ends — non-vacuous mass "
         "redistribution). The floor losses are DECLARED semantics "
         "(mass stays <= scale, only ever dropping units); agreement "
         "with an independent pure-Python fixed-point model and the "
         "float pagerank's ranking pinned in tests/test_r10.py. Per "
         "round: one dst-key shuffle + broadcast out-degree join + "
         "one bounded 1-row dangling scalar (the g6 L1-delta "
         "precedent); rounds eager-localCheckpointed (g6 lineage "
         "discipline)")
def g6_pagerank_portable(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph import (
        successor_edges,
    )

    docs = t(spark, sf_dir, "documents")
    return pagerank_fixed_point(successor_edges(docs, steps=(1, 2)),
                                iterations=5, scale=_PR_SCALE)


def _bloom_portable_oracle(m_bits: int = 1 << 20) -> str:
    """DuckDB oracle for the portable Bloom prefilter: the shared
    5-gram shingle SQL (registry_graph._SHINGLE5_SQL semantics), the
    base-31 rolling-hash fold (registry_wide._RH_SQL idiom, applied
    to the shingle instead of the text prefix), and the same three
    multiply-add-mod hash functions; 32-bit words, bit_or bitmap,
    membership = all three bits set."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        BLOOM_PORTABLE_A,
        BLOOM_PORTABLE_B,
    )

    sh5 = """list_distinct(list_transform(
             generate_series(1,
               len(string_split_regex(trim(text), '\\s+')) - 4),
             i -> string_split_regex(trim(text), '\\s+')[i] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+2] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+3] || ' ' ||
                  string_split_regex(trim(text), '\\s+')[i+4]))"""
    rh = """CASE WHEN length(sh) = 0 THEN 0 ELSE list_reduce(
             list_transform(range(1, length(sh) + 1),
               i -> CAST(ascii(substr(sh, CAST(i AS INTEGER), 1))
                         AS BIGINT)),
             (a, b) -> (a * 31 + b) % 1000000007) END"""
    arms = "\n         UNION ALL\n         ".join(
        f"SELECT sh, ((rh * {a} + {b}) % 1000000007) % {m_bits} AS p "
        f"FROM b_rh" for a, b in zip(BLOOM_PORTABLE_A,
                                     BLOOM_PORTABLE_B))
    carms = "\n         UNION ALL\n         ".join(
        f"SELECT doc_id, sh, ((rh * {a} + {b}) % 1000000007) "
        f"% {m_bits} AS p FROM c_rh"
        for a, b in zip(BLOOM_PORTABLE_A, BLOOM_PORTABLE_B))
    return f"""WITH bench_sh AS MATERIALIZED (
         SELECT DISTINCT g.sh FROM documents,
                LATERAL unnest({sh5}) AS g(sh)
         WHERE doc_id % 17 = 0
           AND len(string_split_regex(trim(text), '\\s+')) >= 5),
       b_rh AS MATERIALIZED (SELECT sh, {rh} AS rh FROM bench_sh),
       b_pos AS (
         {arms}),
       bitmap AS MATERIALIZED (
         SELECT p // 32 AS w,
                bit_or(CAST(2 ** (p % 32) AS BIGINT)) AS mask
         FROM b_pos GROUP BY p // 32),
       corpus_sh AS MATERIALIZED (
         SELECT doc_id, g.sh FROM documents,
                LATERAL unnest({sh5}) AS g(sh)
         WHERE len(string_split_regex(trim(text), '\\s+')) >= 5),
       c_rh AS MATERIALIZED (
         SELECT doc_id, sh, {rh} AS rh FROM corpus_sh),
       c_pos AS (
         {carms}),
       hits AS (
         SELECT c.doc_id, c.sh, count(*) AS nset
         FROM c_pos c JOIN bitmap m ON m.w = c.p // 32
         WHERE (m.mask & CAST(2 ** (c.p % 32) AS BIGINT)) <> 0
         GROUP BY c.doc_id, c.sh)
       SELECT DISTINCT doc_id AS flagged_doc_id
       FROM hits WHERE nset = 3"""


@register(
    "ext_decontaminate_bloom_portable",
    _bloom_portable_oracle(),
    survey="§7.5 decontamination (Bloom prefilter, hash-checkable twin)",
    note="the oracle-paired twin of ext_decontaminate_bloom (rows-"
         "only: xxhash64 bit positions are engine-specific) — the "
         "sketch family's first value-hash anchor. Same m=2^20 / k=3 "
         "Bloom prefilter over the same planted benchmark (doc_id%17 "
         "docs' 5-gram shingles), but the hash family is portable "
         "arithmetic: the base-31 rolling hash of each shingle (the "
         "green ext_rolling_hash_fingerprint fold) through three "
         "multiply-add-mod-P functions (Knuth/xxPrime/murmur "
         "constants, products bounded under 2^63), so bitmap build, "
         "membership tests, and the flagged set are bit-identical "
         "cross-engine. 32-bit bitmap words dodge the bit-63 "
         "two's-complement trap on both engines. Bloom contract "
         "kept: flagged ⊇ exactly-contaminated (no false negatives, "
         "pinned vs ext_decontaminate in tests/test_r10.py). Plan: "
         "bitmap = one explode + bit_or groupBy (broadcast, m/8 "
         "bytes); corpus pass = explode + 3 position rows/shingle + "
         "broadcast word join — linear, no pairwise step, no UDF "
         "(the rolling hash is an aggregate() fold in codegen)",
    tags=("llm-pipeline",))
def ext_decontaminate_bloom_portable(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        bloom_decontaminate_portable,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return bloom_decontaminate_portable(docs, bench, "doc_id", "text",
                                        n=5)
