"""Round-11 pins: the r10 advisor's four findings closed in code.

- sf-scoped probe scratch paths: building an IO-roundtrip entry at a
  second scale factor in one process must not clobber the first
  scale's files out from under its lazily-evaluated DataFrame
  (registry_io._probe_dir).
- (stats, codes) are ONE offline index artifact: the portable ANN
  probes reject a half-supplied index instead of silently scoring
  against a mismatched quantizer.
- mmr_quantized_topk's unrolled argmax negates the key, so a
  non-numeric key raises a clear ValueError up front instead of an
  opaque analysis error.
- ivf_pq_index is a bounded LRU, not a single slot — covered by
  test_r10.test_ivf_pq_index_cache_is_bounded_lru (rewritten).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


# ------------------------------------------ sf-scoped probe paths


def test_probe_dir_disjoint_per_sf():
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_io import (
        _probe_dir,
        _sf_token,
    )
    a = _probe_dir("/root/testdata/sf0.001", "s19_orc")
    b = _probe_dir("/root/testdata/sf0.01", "s19_orc")
    assert a != b
    assert _sf_token("/root/testdata/sf0.01/") == "sf0_01"  # dir slash ok
    # identifier-safe: usable inside a saveAsTable name unquoted
    assert all(c.isalnum() or c == "_" for c in _sf_token("/x/sf0.1"))


def test_cross_sf_build_does_not_clobber(spark):
    """The advisor's exact scenario: build s19 at one sf, build it at
    another sf in the same process, then materialize the FIRST
    DataFrame — it must still summarize the first scale's data, not
    the second's (the fixed path made it read the other scale)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    q = REGISTRY["s19_orc_roundtrip"].build
    first = q(spark, "/root/testdata/sf0.001")
    n1 = first.collect()[0]["n_rows"]
    second = q(spark, "/root/testdata/sf0.01")
    n2 = second.collect()[0]["n_rows"]
    assert n1 != n2  # scales genuinely differ, so the pin is real
    assert first.collect()[0]["n_rows"] == n1  # unchanged after 2nd build


# ------------------------------------ paired offline-index artifact


def _emb(spark, sf_dir):
    return (read_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding"))


def test_portable_probes_reject_half_supplied_index(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        grid_code_index,
        grid_stats,
        ivfadc_portable_topk,
        mmr_quantized_topk,
    )
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    stats = grid_stats(corpus)
    codes = grid_code_index(corpus, stats=stats)
    # both or neither is fine...
    assert ivfadc_portable_topk(corpus, query, k=3,
                                stats=stats, codes=codes).count() == 3
    assert mmr_quantized_topk(corpus, query, k=3, shortlist=5).count() == 3
    # ...exactly one is a contract violation on BOTH probes
    for kw in ({"stats": stats}, {"codes": codes}):
        with pytest.raises(ValueError, match="together"):
            ivfadc_portable_topk(corpus, query, k=3, **kw)
        with pytest.raises(ValueError, match="together"):
            mmr_quantized_topk(corpus, query, k=3, shortlist=5, **kw)


def test_mmr_quantized_requires_numeric_key(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        mmr_quantized_topk,
    )
    emb = _emb(spark, sf_dir).withColumn(
        "vec_id", F.concat(F.lit("doc-"), F.col("vec_id")))
    query = emb.limit(1)
    with pytest.raises(ValueError, match="numeric"):
        mmr_quantized_topk(emb, query, k=3, shortlist=5)
