"""Skew mitigation: salted joins and two-stage aggregates.

When one join key carries a disproportionate share of rows (the
city/host hotspots of SURVEY §7.5), a hash join sends the whole hot key
to one task. AQE's skew-join splitting handles sort-merge joins at
runtime; this module is the *explicit* version for when the planner
can't see the skew (e.g. a key materialized mid-pipeline) or when the
build side must be replicated deterministically.

``salted_join``: the big side gets a deterministic per-row salt in
[0, n); the small side is replicated n× (one copy per salt value); the
join key becomes (key, salt), spreading each hot key over n tasks.
Replication multiplies the small side's size — keep n modest (8-32)
and the small side dimension-sized.

``two_stage_agg``: partial aggregate on (key, salt) then final
aggregate on key — useful when a single grouping key dominates and
even map-side partial aggregation leaves one hot reduce task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    # deterministic per-row salt: hash every column so identical runs
    # salt identically (no rand() — keeps tests and retries stable)
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT, F.pmod(h, F.lit(n_salts)).cast("int"))


def _replicated(df: DataFrame, n_salts: int) -> DataFrame:
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    return df.withColumn(SALT, salts)


def salted_join(big: DataFrame, small: DataFrame, on: str | list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join with the hot-key rows of ``big`` spread over
    ``n_salts`` tasks. Semantically identical to
    ``big.join(small, on, how)`` for row-preserving join types
    (inner/left); the salt column never escapes.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    return (_with_salt(big, n_salts)
            .join(_replicated(small, n_salts), keys + [SALT], how)
            .drop(SALT))


def two_stage_agg(df: DataFrame, keys: list[str],
                  sums: list[str], n_salts: int = 16) -> DataFrame:
    """SUM/COUNT by ``keys`` via a salted partial stage: stage 1
    aggregates (keys, salt) partitions, stage 2 combines the ≤n_salts
    partials per key. Output: keys + ``sum_<col>`` per sums col +
    ``n_rows``."""
    partial = (_with_salt(df, n_salts)
               .groupBy(*keys, SALT)
               .agg(F.count("*").alias("__n"),
                    *[F.sum(c).alias(f"__s_{c}") for c in sums]))
    return (partial.groupBy(*keys)
            .agg(F.sum("__n").alias("n_rows"),
                 *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]))
