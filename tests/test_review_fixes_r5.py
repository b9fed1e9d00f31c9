"""Regression pins for the round-4 verdict's residual nits (VERDICT.md
r4 items 3-4): the PQ codebook sample must be layout-independent, and
the three corpus-scoring operators share one persist-lifetime
contract."""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    dsir_components,
    tfidf_top_terms,
    trigram_familiarity,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
    fit_pq_codebooks,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def test_pq_codebooks_deterministic_across_layouts(spark, sf_dir):
    """A bare .limit(n) sample takes whichever partitions answer
    first, so the trained codebook artifact silently depends on file
    layout; the xxhash64-ordered sample must produce byte-identical
    codebooks after an arbitrary repartition (the cap_reviews
    lesson applied to the PQ index build)."""
    emb = read_table(spark, sf_dir, "embeddings")
    b1 = fit_pq_codebooks(emb, m=8, n_codes=8, sample_rows=256)
    b2 = fit_pq_codebooks(emb.repartition(13), m=8, n_codes=8,
                          sample_rows=256)
    b3 = fit_pq_codebooks(emb.coalesce(1), m=8, n_codes=8,
                          sample_rows=256)
    assert b1 == b2 == b3


def test_corpus_scoring_cache_contract_uniform(spark, sf_dir):
    """trigram_familiarity / dsir_components / tfidf_top_terms share
    the documented cache lifetime contract: all three expose
    cache: bool = True, and cache=False returns the identical result
    (the flag trades a second explode for zero pinned storage, never
    semantics)."""
    for fn in (trigram_familiarity, dsir_components, tfidf_top_terms):
        p = inspect.signature(fn).parameters.get("cache")
        assert p is not None and p.default is True, fn.__name__

    docs = read_table(spark, sf_dir, "documents").limit(120)
    # check the uncached path BEFORE the cache=True call: Spark's
    # cache manager substitutes any matching persisted fragment into
    # later plans, which would mask a persist leak here
    off = tfidf_top_terms(docs, "doc_id", "text", k=2, cache=False)
    assert "InMemoryTableScan" not in \
        off._jdf.queryExecution().executedPlan().toString()
    rows_off = sorted(map(tuple, off.collect()))
    on = tfidf_top_terms(docs, "doc_id", "text", k=2, cache=True)
    rows_on = sorted(map(tuple, on.collect()))
    assert rows_on == rows_off and rows_on
