"""Round-12 pins: the two hostile-data fixes (tools/hostile_parity.py
findings) asserted as unit tests so they cannot regress without the
10-minute sweep.

1. minhash_candidate_pairs must survive a corpus containing documents
   with fewer than n tokens (empty / whitespace-only / one-word):
   approxSimilarityJoin's self-join rewrite evaluated the LSH hash UDF
   on pre-filter rows and crashed with "Must have at least 1 non zero
   entry" — the plan barrier in operators/dedup.py pins the
   size(sh) > 0 filter below the UDF.
2. f33_winsorize's clamp bounds must ignore non-finite values (they
   moved the percentile bounds differently per engine), while
   non-finite VALUES still clamp through the bounds.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_minhash_pairs_survive_subtoken_docs(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    base = [(i, f"alpha beta gamma delta epsilon zeta token{i} "
                f"eta theta iota kappa") for i in range(8)]
    near = [(100 + i, t + " mutation") for i, t in base[:3]]
    hostile = [(900, ""), (901, "   "), (902, "solo"), (903, "two words")]
    df = spark.createDataFrame(base + near + hostile,
                               ["doc_id", "text"])
    pairs = minhash_candidate_pairs(df, "doc_id", "text",
                                    jaccard_threshold=0.3)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}  # must not raise
    # the planted near-dups still surface
    for i in range(3):
        assert (i, 100 + i) in got, got
    # sub-token docs never appear in any pair (no shingles, no signature)
    assert not any(a >= 900 or b >= 900 for a, b in got), got


def test_winsorize_bounds_ignore_nonfinite(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # non-finite rows injected the way the hostile sweep does it
    poisoned = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 101 == 0,
               F.lit(float("nan")))
         .when(F.col("event_id") % 103 == 0, F.lit(float("inf")))
         .when(F.col("event_id") % 107 == 0, F.lit(float("-inf")))
         .otherwise(F.col("value")))
    import os
    import tempfile
    tmp = tempfile.mkdtemp(prefix="r12_wins_")
    poisoned.write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet"))
    out = REGISTRY["f33_winsorize"].build(spark, tmp).collect()

    # expected bounds from the FINITE values only
    finite = [r for r in poisoned.collect()
              if r.value is not None and math.isfinite(r.value)]
    by_type: dict[str, list[float]] = {}
    for r in finite:
        by_type.setdefault(r.event_type, []).append(r.value)
    bounds = {}
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[max(0, math.ceil(0.05 * n) - 1)]
        hi = vals[max(0, math.ceil(0.95 * n) - 1)]
        bounds[t] = (lo, hi)

    vals_in = {r.event_id: r.value for r in poisoned.collect()}
    assert out
    for r in out:
        lo, hi = bounds[r.event_type]
        v = vals_in[r.event_id]
        # every output is inside the finite bounds...
        assert lo <= r.value_w <= hi, (r, lo, hi)
        # ...and non-finite inputs were REPAIRED, not propagated
        if v is not None and not math.isfinite(v):
            assert r.value_w in (lo, hi), (r, v, lo, hi)
