"""MERGE upsert (SURVEY §2.3 J8) as a pure-Spark join rewrite.

The reference's T-SQL MERGE (modules/data_loader.py:251-290): match on
PK → UPDATE every column from source; no match → INSERT; ``OUTPUT
$action`` counts updates vs inserts. Semantics to honor (SURVEY §7.3):

- source wins on conflict (all columns overwritten);
- T-SQL MERGE *errors* on duplicate source keys — we pre-dedup the
  source with a deterministic ROW_NUMBER winner (latest by ``order_by``,
  else lowest key) and report the dropped duplicates;
- action counts come from the same join, no extra pass over the target.

Plan shape: one shuffle of the (small) source + one of the target on the
key — or zero target shuffles when the source is broadcastable, which is
the common case (daily delta ≪ accumulated table). At 100 TB the right
physical strategy is Delta/Iceberg ``MERGE INTO`` with file-level
pruning; this join rewrite is the engine-neutral equivalent and produces
identical rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class MergeResult:
    df: DataFrame
    updated: int
    inserted: int
    source_dups_dropped: int


def dedup_source(source: DataFrame, key: str,
                 order_by: list[Column] | None = None) -> DataFrame:
    """Deterministic one-row-per-key: latest by ``order_by`` (W1
    semantics, sql/data/02_load_hosts.sql:7-16) or arbitrary-but-stable
    first by remaining columns (W2, sql/data/05_load_reviews.sql:41)."""
    ordering = order_by or [F.col(c) for c in source.columns if c != key]
    w = Window.partitionBy(key).orderBy(*ordering)
    return (source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def merge_upsert(target: DataFrame, source: DataFrame, key: str,
                 order_by: list[Column] | None = None,
                 count_actions: bool = True) -> MergeResult:
    """UPSERT ``source`` into ``target`` on ``key``; source wins.

    result = (target ANTI source) ∪ source_deduped — the not-matched
    target rows survive, every source row lands (as UPDATE if the key
    existed, INSERT otherwise).
    """
    src = dedup_source(source, key, order_by).select(*target.columns)
    kept = target.join(F.broadcast(src.select(key)), on=key, how="left_anti")
    merged = kept.unionByName(src)

    updated = inserted = dups = 0
    if count_actions:
        # OUTPUT $action parity (modules/data_loader.py:307-310)
        n_src = src.count()
        updated = src.join(target.select(key), on=key, how="left_semi").count()
        inserted = n_src - updated
        dups = source.count() - n_src
    return MergeResult(merged, updated, inserted, dups)
