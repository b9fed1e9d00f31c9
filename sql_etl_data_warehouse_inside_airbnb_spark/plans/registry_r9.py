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
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


def _ivfadc_oracle() -> str:
    """DuckDB oracle running the ENTIRE IVFADC pipeline: seeded-
    hyperplane coarse assignment (plane literals from the same
    fixed-seed generator the Spark side uses), Hamming-1 multiprobe
    prune, int8-grid ADC scoring of the survivors, top-``RERANK``
    shortlist on the integer score, exact-cosine re-rank."""
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
       flat AS (
         SELECT vec_id,
                generate_subscripts(embedding, 1) AS pos,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM embeddings),
       stats AS (
         SELECT pos, min(x) AS mn, max(x) AS mx FROM flat GROUP BY pos),
       codes AS (
         SELECT flat.vec_id, flat.pos,
                CAST(CASE WHEN s.mx = s.mn THEN 0
                          ELSE floor((flat.x - s.mn) * 255.0
                                     / (s.mx - s.mn))
                     END AS BIGINT) - 128 AS c
         FROM flat JOIN stats s USING (pos)),
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
         "vectors (bit-exact cross-engine; the grid stats are the "
         "'codebook' — at 100 TB they and the bucket assignments are "
         "the offline index artifact, cf. registry_r7.ivf_pq_index). "
         "Top-20 shortlist on the exact integer score (ties broken "
         "by key), exact-cosine re-rank to top-5. Plan: corpus is "
         "bucketed ONCE (scan-stage expressions), probe arms "
         "broadcast, ADC is one equi-join + combinable sum-groupBy, "
         "rerank touches 20 vectors. Recall-vs-brute floor pinned in "
         "tests/test_r9.py",
    tags=("llm-pipeline",))
def ext_ann_ivfadc_portable_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        _hyperplanes,
        _probe_masks,
        as_double,
        cosine,
        lsh_bucket,
    )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planes = _hyperplanes(64, 4)
    data = emb.withColumn("__bucket",
                          lsh_bucket(F.col("embedding"), planes))
    qrow = data.filter(F.col("vec_id") == 0)
    qb = F.col("__bucket")
    probes = [qb] + [qb.bitwiseXOR(F.lit(m))
                     for m in _probe_masks(4, 2)]
    probe_df = F.broadcast(
        qrow.select(F.explode(F.array(*probes)).alias("__bucket")))
    surv = (data.join(probe_df, "__bucket", "left_semi")
            .filter(F.col("vec_id") != 0)
            .select("vec_id", "embedding"))

    def _flat(df):
        return (df.select("vec_id",
                          F.posexplode(as_double(F.col("embedding")))
                          .alias("pos0", "x"))
                .select("vec_id", (F.col("pos0") + 1).alias("pos"), "x"))

    stats = (_flat(emb).groupBy("pos")
             .agg(F.min("x").alias("mn"), F.max("x").alias("mx")))
    code = (F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(F.floor((F.col("x") - F.col("mn")) * 255.0
                               / (F.col("mx") - F.col("mn"))))
            .cast("bigint") - 128)
    qc = (_flat(emb.filter(F.col("vec_id") == 0))
          .join(F.broadcast(stats), "pos")
          .select("pos", code.alias("qcode")))
    adc = (_flat(surv)
           .join(F.broadcast(stats), "pos")
           .select("vec_id", "pos", code.alias("c"))
           .join(F.broadcast(qc), "pos")
           .groupBy("vec_id")
           .agg(F.sum(F.col("c") * F.col("qcode")).alias("qdot")))
    short = adc.orderBy(F.desc("qdot"), "vec_id").limit(20) \
               .select("vec_id")
    qv = F.broadcast(qrow.select(
        as_double(F.col("embedding")).alias("__qv")))
    cos = F.round(cosine(as_double(F.col("embedding")),
                         F.col("__qv")), 6)
    return (emb.join(F.broadcast(short), "vec_id")
            .crossJoin(qv)
            .select("vec_id", cos.alias("cosine"))
            .orderBy(F.desc("cosine"), "vec_id")
            .limit(5)
            .select("vec_id", "cosine",
                    F.row_number().over(
                        Window.orderBy(F.desc("cosine"), "vec_id"))
                    .cast("long").alias("rank")))
