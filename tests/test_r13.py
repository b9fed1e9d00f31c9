"""Round-13 pins: the registry-wide hostile-sweep fixes asserted as
unit tests so they cannot regress without the sweep.

1. f31_explode_outer must pass an EXPLICIT group index 0: Spark's
   regexp_extract_all defaults to group 1 and validates the group
   count only when a row matches, so the groupless pattern passed on
   every corpus with no 11+-letter word and crashed on the first one
   that had any (found via the hostile 10k-char token).
2. The quantile/median family (a32, a22, a24, ext_grouped_median,
   x2_outlier_mad) treats non-finite input values exactly as NULL:
   engines place NaN differently inside quantile order statistics,
   so a single NaN silently shifted medians differently per engine —
   the finite guard makes "quantiles are over finite values" the
   contract on both sides.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
    REGISTRY,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import DBL_MAX


def test_explode_outer_survives_long_words(spark):
    rows = [(0, "short words only here", "en", "s", 21),
            (7, "extraordinarily long supercalifragilistic tokens",
             "en", "s", 48),
            (14, "tiny", "en", "s", 4)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, "
              "source string, n_chars bigint")
    with tempfile.TemporaryDirectory(prefix="r13_f31_") as tmp:
        df.write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet"))
        out = REGISTRY["f31_explode_outer"].build(spark, tmp).collect()
    got = {(r.doc_id, r.token) for r in out}
    # the 11+-letter words extract as FULL matches (group 0)...
    assert (7, "extraordinarily") in got, got
    assert (7, "supercalifragilistic") in got, got
    # ...and documents with no long word keep their NULL row
    assert (0, None) in got and (14, None) in got, got


def _poison(df, key: str, col: str):
    """The hostile sweep's deterministic NaN/±Inf injection."""
    return df.withColumn(
        col,
        F.when(F.col(key) % 101 == 0, F.lit(float("nan")))
         .when(F.col(key) % 103 == 0, F.lit(float("inf")))
         .when(F.col(key) % 107 == 0, F.lit(float("-inf")))
         .otherwise(F.col(col)))


def _nullify_nonfinite(df, col: str):
    # NaN fails `<= DBL_MAX` (it orders above everything), ±Inf fall
    # outside the range — same predicate as plans.registry.finite_sql
    return df.withColumn(
        col, F.when(F.col(col).between(-DBL_MAX, DBL_MAX), F.col(col)))


@pytest.mark.parametrize(
    "table,key,col,entries",
    [("lineitem", "l_orderkey", "l_quantity", ["a32_median"]),
     ("orders", "o_orderkey", "o_totalprice",
      ["a22_percentile_disc", "a24_approx_percentile"]),
     ("customer", "c_custkey", "c_acctbal",
      ["ext_grouped_median", "x2_outlier_mad"])])
def test_quantile_entries_treat_nonfinite_as_null(
        spark, sf_dir, table, key, col, entries):
    src = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    poisoned = _poison(src, key, col)
    cleaned = _nullify_nonfinite(poisoned, col)
    with tempfile.TemporaryDirectory(prefix="r13_qp_") as t_poison, \
            tempfile.TemporaryDirectory(prefix="r13_qc_") as t_clean:
        poisoned.write.mode("overwrite").parquet(
            os.path.join(t_poison, f"{table}.parquet"))
        cleaned.write.mode("overwrite").parquet(
            os.path.join(t_clean, f"{table}.parquet"))
        for name in entries:
            a = sorted(map(
                tuple, REGISTRY[name].build(spark, t_poison).collect()))
            b = sorted(map(
                tuple, REGISTRY[name].build(spark, t_clean).collect()))
            assert a == b, (name, a[:3], b[:3])
            assert a, name  # non-vacuous: groups survived poisoning


def test_grouped_median_all_nonfinite_group_emits_null(spark):
    """Review finding: pandas quantile over an EMPTY (all-filtered)
    series returns NaN where the oracle's quantile_cont over all-NULL
    returns NULL — the builder must emit None for such a group."""
    rows = ([("allnan", i, float("nan")) for i in range(4)]
            + [("normal", 100 + i, float(i)) for i in range(9)])
    df = spark.createDataFrame(
        [(seg, k, v, "n", 0.0) for seg, k, v in rows],
        "c_mktsegment string, c_custkey bigint, c_acctbal double, "
        "c_name string, c_x double").drop("c_x")
    with tempfile.TemporaryDirectory(prefix="r13_gm_") as tmp:
        df.write.mode("overwrite").parquet(
            os.path.join(tmp, "customer.parquet"))
        out = {r.c_mktsegment: (r.median_acctbal, r.n)
               for r in REGISTRY["ext_grouped_median"]
               .build(spark, tmp).collect()}
    assert out["allnan"] == (None, 4), out
    assert out["normal"] == (4.0, 9), out
