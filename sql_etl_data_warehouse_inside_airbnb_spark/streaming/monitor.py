"""Streaming drift monitoring: the live-stream twin of
operators/quality.py:drift_bin_counts (registry x11/x12).

Batch drift monitoring scans both snapshots per run; in production the
BASELINE is a frozen reference distribution (last week's corpus, the
training-set mix) and the CURRENT side is the live stream — re-scanning
the baseline per micro-batch would be quadratic over the day. So the
streaming form splits the two halves:

- :func:`stream_bin_counts` aggregates the live stream into the same
  deterministic bins (groupBy + count, update/complete mode — Spark
  maintains the running counts as managed state, one row per observed
  bin, state size = bin cardinality, NOT stream length);
- :func:`drift_report` joins those running counts to the static
  baseline counts at READ time (the dashboard/alert query), yielding
  the same (bins..., n_base, n_cur) relation the batch operator emits,
  from which ``psi_from_counts`` derives the scalar client-side.

Equality with the batch operator over the same data is pinned in
tests/test_streaming_monitor.py — the stream==batch discipline every
streaming twin in this repo follows (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_bin_counts(events: DataFrame,
                      bins: list[Column] | Column) -> DataFrame:
    """Running per-bin counts over a (streaming) relation. The bins
    must be deterministic expressions of the row (categoricals,
    width_bucket ladders, broadcast equi-depth cut lookups) — the same
    contract as drift_bin_counts. Works unchanged on a batch frame
    (the stream==batch test relies on that)."""
    bin_cols = bins if isinstance(bins, list) else [bins]
    named = [F.col(b) if isinstance(b, str) else b for b in bin_cols]
    labeled = events.select(*named)
    return (labeled.groupBy(*labeled.columns)
            .agg(F.count("*").cast("bigint").alias("n_cur")))


def drift_report(baseline: DataFrame, current: DataFrame) -> DataFrame:
    """Join frozen baseline bin counts (bins..., n_base) to the
    stream's running counts (bins..., n_cur) into the drift relation
    (bins..., n_base, n_cur). FULL OUTER with zero-fill: a bin that
    exists in only one slice is exactly the drift signal (PSI's eps
    handling), so dropping it would hide the alert. The baseline side
    is O(bins) — broadcastable by construction."""
    keys = [c for c in baseline.columns if c != "n_base"]
    assert keys == [c for c in current.columns if c != "n_cur"], (
        baseline.columns, current.columns)
    return (baseline.join(current, keys, "full_outer")
            .select(*keys,
                    F.coalesce("n_base", F.lit(0)).cast("bigint")
                    .alias("n_base"),
                    F.coalesce("n_cur", F.lit(0)).cast("bigint")
                    .alias("n_cur")))
