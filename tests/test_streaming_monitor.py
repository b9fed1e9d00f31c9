"""Streaming drift monitor == batch drift_bin_counts over the same
data, with the baseline frozen and the current side driven through a
real micro-batched stream (the production split the module docstring
describes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    drift_bin_counts,
    psi_from_counts,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.monitor import (
    drift_report,
    stream_bin_counts,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    run_stream_to_memory,
    stream_events,
)

CUT = "2024-01-16"


def _bins():
    return [F.col("event_type"),
            F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
            .cast("bigint").alias("value_bucket")]


def test_stream_drift_equals_batch(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    cut = F.lit(CUT).cast("timestamp")

    # batch truth: one-scan conditional counts (the x11 relation)
    batch = drift_bin_counts(ev, F.col("ts") >= cut, _bins())
    expect = {tuple(r[:-2]): (r.n_base, r.n_cur)
              for r in batch.collect()}

    # frozen baseline + live current side through a real stream
    baseline = (stream_bin_counts(ev.filter(F.col("ts") < cut), _bins())
                .withColumnRenamed("n_cur", "n_base"))
    cur_stream = stream_bin_counts(
        stream_events(spark, sf_dir).filter(F.col("ts") >= cut), _bins())
    run_stream_to_memory(cur_stream, "drift_cur")
    current = spark.sql("SELECT * FROM drift_cur")

    got = {tuple(r[:-2]): (r.n_base, r.n_cur)
           for r in drift_report(baseline, current).collect()}
    assert got == expect
    # and the derived scalar agrees (same counts -> same PSI)
    assert abs(psi_from_counts(batch.collect())
               - psi_from_counts(drift_report(baseline, current)
                                 .collect())) < 1e-12


def test_drift_report_zero_fills_one_sided_bins(spark):
    base = spark.createDataFrame([("a", 5), ("b", 3)],
                                 ["bin", "n_base"])
    cur = spark.createDataFrame([("b", 7), ("c", 2)],
                                ["bin", "n_cur"])
    got = {r.bin: (r.n_base, r.n_cur)
           for r in drift_report(base, cur).collect()}
    # a disappeared, c is novel — both must survive with a 0 side
    assert got == {"a": (5, 0), "b": (3, 7), "c": (0, 2)}
