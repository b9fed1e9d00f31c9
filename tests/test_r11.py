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
    # trailing slash does not change the token
    assert (_sf_token("/root/testdata/sf0.01/")
            == _sf_token("/root/testdata/sf0.01"))
    assert _sf_token("/root/testdata/sf0.01").startswith("sf0_01_")
    # distinct dirs with COLLIDING basenames (or basenames that
    # sanitize identically) still get distinct tokens (post-round
    # review: the token hashes the full path, not just the basename)
    assert _sf_token("/data/genA/sf0.1") != _sf_token("/data/genB/sf0.1")
    assert _sf_token("/x/sf0.1") != _sf_token("/x/sf0_1")
    # identifier-safe: usable inside a saveAsTable name unquoted
    assert all(c.isalnum() or c == "_" for c in _sf_token("/x/sf0.1"))


def _sibling_sf(sf_dir: str) -> str:
    """Another scale directory next to the fixture's, for cross-sf
    tests (conftest honors SPARK_GRAFT_TEST_SF_DIR, so never
    hardcode /root/testdata)."""
    import glob
    import os
    parent = os.path.dirname(os.path.normpath(sf_dir))
    others = [d for d in sorted(glob.glob(os.path.join(parent, "sf*")))
              if os.path.normpath(d) != os.path.normpath(sf_dir)
              and os.path.isdir(d)]
    return others[0] if others else ""


def test_cross_sf_build_does_not_clobber(spark, sf_dir):
    """The advisor's exact scenario: build s19 at one sf, build it at
    another sf in the same process, then materialize the FIRST
    DataFrame — it must still summarize the first scale's data, not
    the second's (the fixed path made it read the other scale)."""
    import pytest as _pytest
    other = _sibling_sf(sf_dir)
    if not other:
        _pytest.skip("no sibling scale directory available")
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    q = REGISTRY["s19_orc_roundtrip"].build
    first = q(spark, sf_dir)
    n1 = first.collect()[0]["n_rows"]
    second = q(spark, other)
    n2 = second.collect()[0]["n_rows"]
    assert n1 != n2  # scales genuinely differ, so the pin is real
    assert first.collect()[0]["n_rows"] == n1  # unchanged after 2nd build


# ------------------------------------ paired offline-index artifact


def _emb(spark, sf_dir):
    return (read_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding"))


def test_portable_probes_reject_codes_without_codebook(spark, sf_dir):
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
    # both, neither, or stats-only are all self-consistent (the
    # stats-only path derives the code frames UNDER the supplied
    # codebook — a mismatch is impossible in that direction) and
    # must all produce the SAME result
    full = ivfadc_portable_topk(corpus, query, k=3,
                                stats=stats, codes=codes).collect()
    sonly = ivfadc_portable_topk(corpus, query, k=3,
                                 stats=stats).collect()
    assert full == sonly
    assert mmr_quantized_topk(corpus, query, k=3, shortlist=5).count() == 3
    # codes WITHOUT the codebook they were encoded under is the
    # silent-mismatch hazard — rejected on both probes
    with pytest.raises(ValueError, match="codebook"):
        ivfadc_portable_topk(corpus, query, k=3, codes=codes)
    with pytest.raises(ValueError, match="codebook"):
        mmr_quantized_topk(corpus, query, k=3, shortlist=5, codes=codes)


def test_mmr_quantized_requires_numeric_key(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        mmr_quantized_topk,
    )
    emb = _emb(spark, sf_dir).withColumn(
        "vec_id", F.concat(F.lit("doc-"), F.col("vec_id")))
    query = emb.limit(1)
    with pytest.raises(ValueError, match="numeric"):
        mmr_quantized_topk(emb, query, k=3, shortlist=5)
