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

    # one collect feeds both the expected-bounds computation and the
    # per-row input lookup
    rows_in = poisoned.collect()
    by_type: dict[str, list[float]] = {}
    for r in rows_in:
        if r.value is not None and math.isfinite(r.value):
            by_type.setdefault(r.event_type, []).append(r.value)
    bounds = {}
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[max(0, math.ceil(0.05 * n) - 1)]
        hi = vals[max(0, math.ceil(0.95 * n) - 1)]
        bounds[t] = (lo, hi)

    vals_in = {r.event_id: r.value for r in rows_in}
    assert out
    for r in out:
        v = vals_in[r.event_id]
        if v is None:
            # NULL input passes the CASE's ELSE unchanged
            assert r.value_w is None, r
            continue
        lo, hi = bounds[r.event_type]
        # every non-NULL output is inside the finite bounds...
        assert lo <= r.value_w <= hi, (r, lo, hi)
        # ...and non-finite inputs were REPAIRED, not propagated
        if not math.isfinite(v):
            assert r.value_w in (lo, hi), (r, v, lo, hi)


def test_winsorize_group_with_no_finite_values_survives(spark):
    """Post-review fix: a group whose values are ALL non-finite has no
    bounds row — its rows must pass through unclamped (LEFT join +
    NULL bounds fall to the CASE's ELSE), not vanish with an inner
    join."""
    import os
    import tempfile

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    rows = ([(i, "2024-01-01 00:00:00", i, "allnan", float("nan"), "{}")
             for i in range(5)]
            + [(100 + i, "2024-01-01 00:00:00", i, "normal",
                float(i), "{}") for i in range(40)])
    df = (spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp")))
    tmp = tempfile.mkdtemp(prefix="r12_nofin_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = REGISTRY["f33_winsorize"].build(spark, tmp).collect()
    assert len(out) == len(rows)
    allnan = [r for r in out if r.event_type == "allnan"]
    assert len(allnan) == 5
    assert all(math.isnan(r.value_w) for r in allnan), allnan
