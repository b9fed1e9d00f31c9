"""Round-7 additions: time-resampled VWAP components, LSH-batched
hard-negative mining, and the composed IVF+PQ ANN probe.

Three workloads the r1-r6 surface brackets but doesn't express:

- ``ts5_vwap_components``: volume-weighted average price per calendar
  month emitted as exact MERGEABLE components — ts2 resamples OHLC
  (first/last/min/max are data values) but nothing resamples a
  weighted average, and VWAP is THE finance/metering rollup. Also the
  showcase for the canonicalizer rules: every compared column —
  the Σ(price·qty), Σqty, and min/max price components — ships as
  exact int64 (scaled integer cents), the one wide encoding with
  hundreds of green precedents; DECIMAL-typed compared columns are
  banned outright (r8 lesson, enforced by tools/parity.py).
- ``ext_hard_negatives``: contrastive-training negative mining —
  ext_negative_samples draws RANDOM non-interactions; metric models
  train on HARD ones (nearest different-label neighbors). Batched
  over anchors through the LSH bucket equi-join, so candidate cost is
  Σ bucket sizes, never anchors × corpus.
- ``ext_ann_ivf_pq_topk``: the production ANN index shape (FAISS
  IVFADC): IVF prunes to n_probe clusters, PQ ADC scores only the
  surviving CODES, exact cosine re-ranks the shortlist. The two
  tiers exist separately since r3/r4; the composition is what a real
  100 TB vector store runs, and it is a pure reuse of both tested
  operators (no new scoring math).

Compared columns are integer / date / exact-decimal / string — except
the hard-negative ``cosine``, which follows the ANN family's
round(·,6) convention (hash-green since r2; sign-test and rounded-
cosine stability arguments in registry_ext._lsh_oracle_sql).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


@register(
    "ts5_vwap_components",
    """WITH d AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE)
                      AS month,
                  CAST(l_quantity AS BIGINT) AS q,
                  CAST(CAST(l_extendedprice AS DECIMAL(19,2)) * 100
                       AS BIGINT) AS cents
           FROM lineitem)
       SELECT month,
              CAST(count(*) AS BIGINT) AS n_trades,
              CAST(min(cents) AS BIGINT) AS lo_cents,
              CAST(max(cents) AS BIGINT) AS hi_cents,
              CAST(sum(q) AS BIGINT) AS sum_qty,
              CAST(sum(cents * q) AS BIGINT) AS sum_pq_cents
       FROM d GROUP BY month""",
    survey="§7.5 temporal ext (resampled VWAP / weighted-mean rollup)",
    note="monthly VWAP components over the trade-shaped lineitem "
         "(price=l_extendedprice, size=l_quantity): n, min/max price, "
         "Σqty, Σ(price·qty). VWAP itself = sum_pq_cents/(100·sum_qty) "
         "derives client-side (the registry quotient rule), and the "
         "components are MERGEABLE — partial months, multi-symbol "
         "rollups, and incremental maintenance (x5) compose by adding "
         "them, which a finished average can never do. The r7 driver "
         "red taught the final encoding lesson (fourth canonicalizer "
         "episode): even EXACT fixed-scale decimal strings can "
         "hash-diverge in the driver canon, so the compared sums now "
         "ship in the one wide type with hundreds of green precedents "
         "— int64. l_quantity is integer-valued ⇒ sum_qty is a plain "
         "BIGINT; l_extendedprice carries exactly 2 real decimals ⇒ "
         "each row's price scales to integer CENTS exactly "
         "(double→decimal(18,2) on the RAW column is exact — only "
         "products mis-round — then ×100 at decimal(22,2) overflows "
         "nothing) and Σ(cents·qty) is pure int64 arithmetic, "
         "~1e13 at sf0.01 / ~1e17 at sf100, comfortably in range. "
         "lo/hi ship as integer CENTS too (fifth canonicalizer "
         "episode, r8 driver red: lo/hi were the registry's ONLY "
         "DECIMAL-typed compared columns and the driver canon is "
         "representation-sensitive for decimals — trailing-zero "
         "scale — so every compared column is now int64/string/date; "
         "tools/parity.py hard-fails decimal outputs since r9). One "
         "scan, one map-side-combinable shuffle on the month key; at "
         "100 TB the table is shipdate-partitioned so the groupBy is "
         "partition-local")
def ts5_vwap_components(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100) \
        .cast("long")
    return (li.groupBy(F.trunc(F.col("l_shipdate").cast("date"), "month")
                       .alias("month"))
            .agg(F.count("*").alias("n_trades"),
                 F.min(cents).alias("lo_cents"),
                 F.max(cents).alias("hi_cents"),
                 F.sum(q).alias("sum_qty"),
                 F.sum(cents * q).alias("sum_pq_cents")))


def _hard_negatives_oracle() -> str:
    """DuckDB oracle for ext_hard_negatives, built from the SAME
    fixed-seed hyperplanes the Spark operator uses (the
    registry_ext._lsh_oracle_sql pattern): bucket assignment, the
    multi-probe arms, the label-mismatch filter, and the per-anchor
    row_number re-rank are all reproduced literally, so the entry is
    hash-checked rather than rows-only."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        _hyperplanes,
        _probe_masks,
    )
    planes = _hyperplanes(64, 4)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
                     f"{lit}) > 0 THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(terms)
    probe_arms = "".join(f" OR e.bkt = xor(a.bkt, {m})"
                         for m in _probe_masks(4, 1))
    return f"""WITH b AS (
         SELECT vec_id, label, embedding::DOUBLE[] AS v,
                {bucket} AS bkt
         FROM embeddings),
       a AS (SELECT vec_id AS anchor_id, label AS alabel, v AS qv, bkt
             FROM b WHERE vec_id IN (0, 1, 2)),
       cand AS (
         SELECT a.anchor_id, e.vec_id AS negative_id,
                round(list_dot_product(e.v, a.qv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(a.qv, a.qv))), 6)
                    AS cosine
         FROM b e JOIN a ON (e.bkt = a.bkt{probe_arms})
         WHERE e.label <> a.alabel AND e.vec_id <> a.anchor_id)
       SELECT anchor_id, negative_id, cosine,
              CAST(row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY cosine DESC, negative_id) AS BIGINT) AS rank
       FROM cand QUALIFY rank <= 5"""


@register(
    "ext_hard_negatives",
    _hard_negatives_oracle(),
    survey="§7.5 similarity ext (contrastive hard-negative mining)",
    note="top-5 hard negatives per anchor (vec_id 0/1/2): the most "
         "cosine-similar vectors with a DIFFERENT label — the "
         "training pairs that actually move a metric model, versus "
         "ext_negative_samples' random draws (cf. DPR, Karpukhin'20). "
         "operators/similarity.py:hard_negatives batches the lsh_topk "
         "machinery over anchors: anchors explode to their multi-probe "
         "bucket lists on the BROADCAST side, the corpus hashes into "
         "exactly one bucket, and candidates come from a pure bucket "
         "equi-join (probe masks pairwise distinct ⇒ each pair meets "
         "at most once — no dedup pass); same-label and self pairs "
         "drop before the exact-cosine re-rank, and a per-anchor "
         "row_number window keeps the 5 hardest. Cost ∝ Σ bucket "
         "sizes, never anchors × corpus; at 100 TB the corpus is "
         "bucket-partitioned and the window partitions on anchor id. "
         "Oracle rebuilt from the same seeded hyperplanes "
         "(_lsh_oracle_sql pattern) so the entry is hash-checked; "
         "cosine follows the ANN family's round(·,6) convention")
def ext_hard_negatives(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        hard_negatives,
    )
    emb = t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id").isin(0, 1, 2))
    return hard_negatives(emb, anchors, k=5, n_planes=4, dim=64,
                          hamming_probes=1)


# Materialized IVF+PQ index: the (assignments, codes) tables are the
# index-BUILD artifacts (at 100 TB: written at ingest, partitioned by
# cluster). localCheckpoint(eager) materializes both ONCE per
# (session, table, fitted model) and truncates lineage, so no probe
# plan contains the corpus vector scan, the assignment UDF, or the
# pq_encode pandas UDF — the r7-verdict fix (the probe used to
# re-assign the whole corpus per query).
_IVF_PQ_INDEX: OrderedDict = OrderedDict()
# max live (model, books) index pairs PER (session, table) — eviction
# never crosses tables, so a sweep over many scale dirs keeps one
# pinned index per table (the r9 bound) while two models alternating
# on ONE table both stay cached (the r10 fix)
_IVF_PQ_INDEX_CAP = 2


def ivf_pq_index(spark, sf_dir, emb, model, books):
    """The index must match the fitted model/codebook IDENTITIES, not
    just (session, table): a caller passing a differently-fitted
    model for the same session+table must get a matching index, not
    a stale one (r8 advisor finding). ``books`` is a plain nested
    list (unhashable), so identity is keyed by ``id()`` — safe ONLY
    because each live cache entry also holds strong references to its
    keyed objects, so a cached id can never be collected and reused
    (a colliding id could only come from a DEAD object, and dead
    objects have no cache entry).

    BOUNDED LRU PER (session, table) (r9 + r10 advisors + post-round
    review): keyed (applicationId, sf_dir, id(model), id(books)),
    with least-recently-used eviction WITHIN the same (applicationId,
    sf_dir) group once it exceeds ``_IVF_PQ_INDEX_CAP`` entries. The
    r9 fix's single slot per (session, table) thrashed when two LIVE
    fitted models alternate in one session (a recall-ladder sweep
    comparing quantizers rebuilt and re-checkpointed both artifacts
    on every alternation); a GLOBAL pool would reintroduce the same
    thrash across tables (a round-robin over 5 scale dirs evicts each
    table's index before it is revisited). Group-scoped eviction
    preserves both bounds: ≤ cap pinned pairs per table, eviction
    never crosses tables. Evicted entries' references are dropped;
    once the JVM-side LogicalRDD objects become unreachable, Spark's
    ContextCleaner unpersists the orphaned checkpoint blocks
    (reference-tracking cleanup — the same mechanism that reclaims
    any persisted RDD that goes out of scope). The registry path
    passes the session-cached model/books, so for it this is still
    one materialization per (session, table)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivf_assign,
        pq_encode,
    )
    group = (spark.sparkContext.applicationId, sf_dir)
    cache_key = (*group, id(model), id(books))
    got = _IVF_PQ_INDEX.get(cache_key)
    if got is None:
        assignments = ivf_assign(emb, model).localCheckpoint(eager=True)
        codes = (pq_encode(emb, "vec_id", "embedding", books)
                 .localCheckpoint(eager=True))
        got = (assignments, codes, model, books)
        _IVF_PQ_INDEX[cache_key] = got
        siblings = [k for k in _IVF_PQ_INDEX if k[:2] == group]
        while len(siblings) > _IVF_PQ_INDEX_CAP:
            _IVF_PQ_INDEX.pop(siblings.pop(0))  # LRU within the group
    else:
        _IVF_PQ_INDEX.move_to_end(cache_key)
    return got[:2]


@register(
    "ext_ann_ivf_pq_topk", None,
    survey="§7.5 similarity ext (IVF+PQ composed probe — IVFADC)",
    note="the production vector-index probe (FAISS IVFADC, Jégou'11 "
         "§IV) composed from the two tiers shipped separately since "
         "r3/r4: the session-cached IVF coarse quantizer prunes the "
         "search to n_probe=8 of 16 clusters (half the index at this "
         "toy cluster count; at production cluster counts the ratio "
         "is 1-5%), PQ ADC (the plan-literal LUT aggregate, "
         "whole-stage codegen) scores ONLY the surviving codes via "
         "pq_topk's codes= hook — no raw vectors read at probe time "
         "— and the ADC top-100 exact-cosine re-ranks. operators/similarity.py:ivf_pq_topk is pure "
         "composition: zero new scoring math; the model fits AND the "
         "index tables (ivf_assign assignments + pq_encode codes, "
         "materialized via eager localCheckpoint) are offline "
         "session-cached artifacts, so the probe plan touches only "
         "the two checkpointed index scans + the 100-row rerank join "
         "(r7-verdict fix: no per-query corpus assignment). At "
         "100 TB: n_probe/n_clusters of the CODES table (itself "
         "16-64× smaller than the vectors) + 100 random vector reads "
         "per query — the memory/IO profile that makes a petabyte "
         "embedding store probe-able. KMeans init is engine-specific "
         "⇒ deliberate rows-only; recall@10 floor vs brute force "
         "pinned in tests/test_r7.py")
def ext_ann_ivf_pq_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivf_pq_topk,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_gaps import (
        ivf_model,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_search import (
        pq_books,
    )
    emb = t(spark, sf_dir, "embeddings")
    model = ivf_model(spark, sf_dir, emb, n_clusters=16)
    books = pq_books(spark, sf_dir, emb)
    assignments, codes = ivf_pq_index(spark, sf_dir, emb, model, books)
    query = emb.filter(F.col("vec_id") == 0)
    cand = emb.filter(F.col("vec_id") != 0)
    return ivf_pq_topk(cand, query, model, books, k=10, n_probe=8,
                       rerank=100,
                       assignments=assignments.filter(
                           F.col("vec_id") != 0),
                       codes=codes.filter(F.col("vec_id") != 0))
