"""Measure the ANN recall/scan-fraction ladder for SCALE.md.

Reproduces the SCALE.md table (recall@10 vs exact brute force over the
first 8 vec_ids, n_planes=4 / n_clusters=16 / PQ m=16 x 16 codes) at
any sf_dir, so the ladder's monotonicity can be checked across scale
factors instead of trusted from a single sf0.1 run.

Usage: python tools/recall_ladder.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    fit_ivf_quantizer,
    fit_pq_codebooks,
    ivf_assign,
    ivf_pq_topk,
    ivf_topk,
    ivfadc_portable_topk,
    lsh_topk,
    pq_encode,
    pq_topk,
)
from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark  # noqa: E402
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("recall-ladder", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    emb = read_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    qids = [r[0] for r in emb.select("vec_id")
            .orderBy("vec_id").limit(8).collect()]

    ivf_model = fit_ivf_quantizer(emb, n_clusters=16)
    books = fit_pq_codebooks(emb, m=16, n_codes=16)
    codes = pq_encode(emb, "vec_id", "embedding", books).cache()
    codes.count()
    # the composed rungs probe the cached index, not a per-query
    # corpus re-encode/re-assign (the registry's ivf_pq_index shape)
    assigned = ivf_assign(emb, ivf_model).cache()
    assigned.count()

    ladder = [
        ("LSH radius 0", lambda c, q: lsh_topk(c, q, k=10,
                                               hamming_probes=0)),
        ("LSH radius 1", lambda c, q: lsh_topk(c, q, k=10,
                                               hamming_probes=1)),
        ("LSH radius 2", lambda c, q: lsh_topk(c, q, k=10,
                                               hamming_probes=2)),
        ("IVF n_probe 2", lambda c, q: ivf_topk(c, q, k=10,
                                                model=ivf_model,
                                                n_probe=2)),
        ("IVF n_probe 4", lambda c, q: ivf_topk(c, q, k=10,
                                                model=ivf_model,
                                                n_probe=4)),
        ("IVF n_probe 8", lambda c, q: ivf_topk(c, q, k=10,
                                                model=ivf_model,
                                                n_probe=8)),
        ("IVF n_probe 16", lambda c, q: ivf_topk(c, q, k=10,
                                                 model=ivf_model,
                                                 n_probe=16)),
        ("PQ ADC (m=16, 16 codes)",
         lambda c, q: pq_topk(c, q, books, k=10)),
        ("PQ ADC + exact rerank@50",
         lambda c, q: pq_topk(c, q, books, k=10, rerank=50)),
        ("IVF+PQ n_probe 4, rerank@50",
         lambda c, q, qid: ivf_pq_topk(
             c, q, ivf_model, books, k=10, n_probe=4, rerank=50,
             assignments=assigned.filter(F.col("vec_id") != qid),
             codes=codes.filter(F.col("vec_id") != qid))),
        ("IVF+PQ n_probe 8, rerank@100",
         lambda c, q, qid: ivf_pq_topk(
             c, q, ivf_model, books, k=10, n_probe=8, rerank=100,
             assignments=assigned.filter(F.col("vec_id") != qid),
             codes=codes.filter(F.col("vec_id") != qid))),
        ("IVFADC portable r2, rerank@100",
         lambda c, q: ivfadc_portable_topk(c, q, k=10,
                                           hamming_probes=2,
                                           rerank=100)),
    ]

    exacts = {}
    for qid in qids:
        q = emb.filter(F.col("vec_id") == qid)
        cand = emb.filter(F.col("vec_id") != qid)
        exacts[qid] = {r.vec_id
                       for r in brute_force_topk(cand, q, k=10).collect()}

    print(f"# {sf_dir}: {n} vectors, {len(qids)} query points")
    for label, fn in ladder:
        hit = tot = 0
        for qid in qids:
            q = emb.filter(F.col("vec_id") == qid)
            cand = emb.filter(F.col("vec_id") != qid)
            args = (cand, q, qid) if fn.__code__.co_argcount == 3 \
                else (cand, q)
            got = {r.vec_id for r in fn(*args).collect()}
            hit += len(exacts[qid] & got)
            tot += 10
        print(f"| {label} | {hit / tot:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
