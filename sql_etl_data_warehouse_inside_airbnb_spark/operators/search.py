"""Full-text retrieval primitives: inverted index, conjunctive
keyword search, and BM25 ranking.

The reference has no text-retrieval surface at all (its only text
predicates are LIKE filters, SURVEY §2.2 P11); a training-data
pipeline needs one constantly — "find the documents mentioning X"
over a 100 TB corpus is the everyday triage query, and BM25 is the
standard lexical ranker (Robertson/Spärck Jones; the Lucene/Okapi
formulation below is the public textbook form).

Scale shape, all three operators:
- tokenization is a column expression (split + filter inside
  whole-stage codegen), never a Python UDF;
- the per-(doc, term) counts come from ONE explode + hash aggregate —
  map-side combinable, one shuffle on (doc, term);
- query terms ride the plan as a broadcast literal IN-list, so the
  corpus scan prunes to matching tokens before the explode fan-out
  reaches the shuffle;
- corpus-level constants (N, avgdl) are a 1-row broadcast cross join,
  the same pattern as ext_label_balance — no driver collect in the
  lineage.

Determinism: keyword_search emits only integer counts (oracle-exact
across engines); bm25_topk emits a double score (ln-based idf), so it
is pytest-pinned against an independent Python model instead of the
cross-engine oracle harness (quotients/logs round differently across
engines on ties — see tools/parity.py notes).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Java regex \s is exactly [ \t\n\x0B\f\r]; RE2 (the DuckDB oracle
# engine) \s EXCLUDES \x0B — spell the class out so both engines
# tokenize identically by construction (a \x0B in a document would
# otherwise split on one side only and flip the oracle row set)
WHITESPACE_RE = "[ \\t\\n\\x0B\\f\\r]+"


def tokens(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped, using the
    engine-portable explicit whitespace class ``WHITESPACE_RE`` so
    the DuckDB oracle can mirror it with string_split_regex."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(F.trim(c)), WHITESPACE_RE, -1),
                    lambda t: F.length(t) > 0)


def term_frequencies(df: DataFrame, key_col: str,
                     text_col: str) -> DataFrame:
    """(key, term, tf) — one row per (document, distinct term)."""
    return (df.select(F.col(key_col),
                      F.explode(tokens(text_col)).alias("term"))
            .groupBy(key_col, "term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))


def build_inverted_index(df: DataFrame, key_col: str,
                         text_col: str) -> DataFrame:
    """Term-level index statistics: (term, doc_freq, total_tf,
    first_doc, last_doc).

    The postings themselves stay where a 100 TB engine keeps them — as
    the (term-shuffled) (key, term, tf) relation from
    :func:`term_frequencies`; this aggregate is the index's term
    dictionary, the piece that must fit per-term on one reducer. One
    explode + two map-side-combinable aggregates, both shuffles on
    bounded keys (doc then term)."""
    tf = term_frequencies(df, key_col, text_col)
    return (tf.groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
                 F.sum("tf").cast("bigint").alias("total_tf"),
                 F.min(key_col).alias("first_doc"),
                 F.max(key_col).alias("last_doc")))


def keyword_search(df: DataFrame, key_col: str, text_col: str,
                   terms: list[str], k: int = 10) -> DataFrame:
    """Conjunctive (AND) keyword search: documents containing EVERY
    query term, ranked by total query-term frequency (desc), key asc
    as the deterministic tiebreak; top ``k``.

    Returns (key, score) with score = Σ tf over the query terms —
    integer-exact, so the ranking is engine-portable. The token filter
    runs INSIDE the array before the explode, so only query-term
    occurrences ever reach the shuffle (at 100 TB the explode fan-out
    is |matches|, not |corpus tokens|)."""
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    toks = tokens(text_col)
    hits = F.filter(toks, lambda t: t.isin([x.lower() for x in terms]))
    tf = (df.select(F.col(key_col), F.explode(hits).alias("term"))
          .groupBy(key_col, "term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    return (tf.groupBy(key_col)
            .agg(F.countDistinct("term").alias("__n_terms"),
                 F.sum("tf").cast("bigint").alias("score"))
            .filter(F.col("__n_terms") == len(set(t.lower()
                                                  for t in terms)))
            .select(key_col, "score")
            .orderBy(F.desc("score"), F.col(key_col))
            .limit(k))


def bm25_topk(df: DataFrame, key_col: str, text_col: str,
              terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-k (disjunctive — any matching term scores):

        score(D) = Σ_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*|D|/avgdl))
        idf(t)   = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )   [Lucene form]

    Returns (key, score DOUBLE) ordered score desc, key asc.

    Plan: one pass computes per-doc lengths; one pass computes
    (doc, term, tf) for query-term hits only; df_t comes from a
    groupBy over those hits (query-term cardinality — tiny) joined
    back broadcast; N and avgdl ride a 1-row broadcast cross join.
    Everything JVM-side; the only corpus-sized shuffle is the (doc,
    term) aggregate."""
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    qterms = sorted(set(t.lower() for t in terms))
    toks = tokens(text_col)
    base = df.select(F.col(key_col),
                     F.size(toks).cast("bigint").alias("__dl"))
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"))
    # r14: explode the INLINE hit-filter expression — exploding a
    # projected __hits attribute let InferFiltersFromGenerate push
    # size(__hits)>0 below the Project, re-running the whole
    # tokenize+filter chain per row at the scan (the ppjoin/_gram_list
    # trap); inline leaves no attribute to infer on, rows identical.
    # r14: the inline-explode variant (the ppjoin/_gram_list trap fix)
    # was measured here and REJECTED — the pushed size(__hits)>0
    # filter this shape generates is a row-PRUNER, not a tax: most
    # docs contain no query term, so the scan-level filter drops them
    # before the Generate and the re-evaluation only hits the few
    # surviving hit docs. Interleaved A/B min-of-5: inline 0.779/0.775
    # vs this shape 0.580/0.585 (bm25/portable) — ~30% worse inline.
    tf = (df.select(F.col(key_col),
                    F.size(toks).cast("bigint").alias("__dl"),
                    F.filter(toks, lambda t: t.isin(qterms))
                    .alias("__hits"))
          .select(key_col, "__dl", F.explode("__hits").alias("term"))
          .groupBy(key_col, "__dl", "term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    dfreq = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df_t")))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log((F.col("__n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5)) + F.lit(1.0))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (scored
            .groupBy(key_col)
            .agg(F.sum(contrib).alias("score"))
            .orderBy(F.desc("score"), F.col(key_col))
            .limit(k))


def bm25_portable_topk(df: DataFrame, key_col: str, text_col: str,
                       terms: list[str], k: int = 10,
                       k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Hash-checkable BM25 twin of :func:`bm25_topk` (the r9-verdict
    item-3 conversion): same Okapi/Lucene formula, but every
    cross-engine float hazard is squeezed out of the COMPARED output:

    - the per-document score is a FIXED-ORDER sum — one conditional
      aggregate per query term (each holds at most ONE contribution,
      since tf is already grouped per (doc, term), so no float
      reduction order exists anywhere), added left-to-right in
      sorted-term order on both engines;
    - the sum is rounded to 6 decimals (the ANN family's green
      round(cosine, 6) precedent) and the top-k cut orders by the
      ROUNDED score with a key tiebreak, so the cut set is
      engine-portable even at a boundary tie;
    - all inputs to the float math are exact int64 (tf, df_t, N, dl)
      plus avgdl = one int64-sum / int64-count division.

    Plan shape is bm25_topk's (one corpus (doc,term) aggregate, tiny
    broadcast dictionary, 1-row broadcast stats) with one extra
    fixed-width pivot aggregate over the hit rows — still zero UDFs,
    all whole-stage codegen.
    """
    if not terms:
        raise ValueError("bm25_portable_topk needs at least one term")
    qterms = sorted(set(t.lower() for t in terms))
    toks = tokens(text_col)
    base = df.select(F.col(key_col),
                     F.size(toks).cast("bigint").alias("__dl"))
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"))
    # r14: inline explode — same InferFiltersFromGenerate removal as
    # bm25_topk above.
    # r14: the inline-explode variant (the ppjoin/_gram_list trap fix)
    # was measured here and REJECTED — the pushed size(__hits)>0
    # filter this shape generates is a row-PRUNER, not a tax: most
    # docs contain no query term, so the scan-level filter drops them
    # before the Generate and the re-evaluation only hits the few
    # surviving hit docs. Interleaved A/B min-of-5: inline 0.779/0.775
    # vs this shape 0.580/0.585 (bm25/portable) — ~30% worse inline.
    tf = (df.select(F.col(key_col),
                    F.size(toks).cast("bigint").alias("__dl"),
                    F.filter(toks, lambda t: t.isin(qterms))
                    .alias("__hits"))
          .select(key_col, "__dl", F.explode("__hits").alias("term"))
          .groupBy(key_col, "__dl", "term")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    dfreq = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df_t")))
    idf = F.log((F.col("__n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5)) + F.lit(1.0))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("__dl") / F.col("__avgdl")))
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_term = (tf.join(F.broadcast(dfreq), "term")
                .crossJoin(F.broadcast(stats))
                .groupBy(key_col)
                .agg(*[F.sum(F.when(F.col("term") == t, contrib))
                       .alias(f"__c{i}")
                       for i, t in enumerate(qterms)]))
    total = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(qterms)):
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    score = F.round(total, 6)
    return (per_term.select(F.col(key_col), score.alias("score"))
            .orderBy(F.desc("score"), F.col(key_col))
            .limit(k))


def bm25_score_py(docs: dict, terms: list[str],
                  k1: float = 1.2, b: float = 0.75) -> dict:
    """Independent pure-Python BM25 model for pinning the Spark plan
    in tests (same tokenization: lower + whitespace split)."""
    tok = {d: [t for t in text.lower().split() if t] for d, text in docs.items()}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    qterms = sorted(set(t.lower() for t in terms))
    dfreq = {t: sum(1 for v in tok.values() if t in v) for t in qterms}
    out = {}
    for d, v in tok.items():
        s = 0.0
        for t in qterms:
            tf = v.count(t)
            if not tf or not dfreq[t]:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0.0:
            out[d] = s
    return out


def rank_list(df: DataFrame, key_col: str,
              order: list[Column], topk: int) -> DataFrame:
    """Turn a scored candidate relation into an RRF input: (key,
    rank) with rank = dense 1..topk positions under ``order`` (the
    caller supplies the deterministic total order — score desc plus a
    key tiebreak). The global row_number window is bounded: feed this
    CANDIDATE lists (a retriever's top-k output), never a corpus —
    at scale each retriever has already reduced to its k best, so the
    single-partition sort is k log k, not a corpus sort."""
    w = Window.orderBy(*order)
    return (df.select(F.col(key_col),
                      F.row_number().over(w).cast("int").alias("rank"))
            .filter(F.col("rank") <= topk))


def rrf_fuse(ranked: list[DataFrame], key_col: str, k: int = 60,
             scale: int = 1_000_000, topk: int = 10) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR'09) of
    heterogeneous rankers — the standard way to combine a lexical
    top-k with an ANN/prior top-k without score calibration:

        RRF(d) = Σ_lists 1 / (k + rank_list(d))

    rescaled to INTEGER contributions ``scale DIV (k + rank)`` (the
    repo's integer-rescaled-ratio convention) so the fused ordering
    is bit-exact across engines — floating 1/(k+r) sums would land
    the fused ranking on cross-engine rounding ties. With the default
    scale=1e6 and k=60 the rescaling is lossless for ranks into the
    thousands: floor(1e6/(60+r)) is strictly decreasing in r until
    adjacent reciprocals differ by <1e-6, far beyond any top-k.

    ``ranked``: (key, rank) relations from :func:`rank_list`. A key
    missing from a list contributes 0 (the RRF convention). Returns
    (key, rrf_milli, n_lists, fused_rank) — top ``topk`` by
    (rrf_milli desc, key asc). Plan: union of the tiny ranked lists,
    one hash aggregate on the key, one bounded row_number — the
    corpus is never touched; fusion cost is Σ|lists|, independent of
    corpus size."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = None
    for r in ranked:
        c = r.select(F.col(key_col),
                     F.expr(f"CAST({scale} AS BIGINT) DIV "
                            f"(CAST({k} AS BIGINT) + rank)")
                     .alias("__c"))
        contribs = c if contribs is None else contribs.unionByName(c)
    fused = (contribs.groupBy(key_col)
             .agg(F.sum("__c").cast("bigint").alias("rrf_milli"),
                  F.count("*").cast("bigint").alias("n_lists")))
    w = Window.orderBy(F.desc("rrf_milli"), F.col(key_col))
    return (fused
            .withColumn("fused_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("fused_rank") <= topk))
