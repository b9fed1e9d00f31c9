"""Type-2 slowly-changing-dimension apply.

The reference's dim maintenance is destructive: its MERGE overwrites
every tracked column on match (modules/data_loader.py:251-290 in
/root/reference — J8 in SURVEY §2.3), so history is lost. ``scd2_apply``
is the history-preserving generalization the warehouse pattern calls
for: instead of overwriting, the matched-and-changed row is CLOSED
(``valid_to`` = change date, ``is_current`` = false) and a new open row
is inserted; unchanged and absent keys pass through untouched.

Scale shape: ONE full-outer join between the open slice of the dim and
the (pre-deduplicated) change set, partitioned by the business key,
followed by pure projections and a union — no window over the whole
dim, no driver-side diffing. Closed history rows never enter the join
at all (they cannot change), so the join cost rides the OPEN row count
+ change count, not the full history size. At 100 TB the same plan
lands on a Delta/Iceberg MERGE with the identical match algebra.

Determinism contract (oracle-comparable): one change row per key per
batch (pre-dedup with ``operators.merge.dedup_source`` if needed —
the same rule T-SQL MERGE enforces by erroring, SURVEY §7.3), and
``change_ts`` supplied as a column so reruns are idempotent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _same(a: Column, b: Column) -> Column:
    return a.eqNullSafe(b)


def scd2_apply(current: DataFrame, changes: DataFrame, key: str,
               attrs: list[str], change_ts: str,
               from_col: str = "valid_from", to_col: str = "valid_to",
               flag_col: str = "is_current") -> DataFrame:
    """Apply one change batch to an SCD2 dimension.

    ``current``: (key, *attrs, from_col, to_col, flag_col) — full
    history; rows with ``flag_col`` true are the open slice.
    ``changes``: (key, *attrs, change_ts) — one row per key.
    Returns the new full history with the same schema as ``current``.
    """
    closed = current.filter(~F.col(flag_col))
    # presence marker, not key-isNull: a NULL business key is a stored
    # value, and testing the key column would classify a NULL-keyed
    # open row as BOTH left-only and right-only, injecting spurious
    # all-NULL rows into the dimension on every batch
    open_ = (current.filter(F.col(flag_col))
             .withColumn("__cur_present", F.lit(True)))

    ch = changes.select(
        F.col(key).alias("_k"), F.col(change_ts).alias("_ts"),
        *[F.col(a).alias(f"_n_{a}") for a in attrs],
        F.lit(True).alias("__chg_present"))

    # null-safe key match so a NULL-keyed open row pairs with a
    # NULL-keyed change row (still an equi-join to the planner)
    j = open_.join(ch, open_[key].eqNullSafe(ch["_k"]), "full_outer")

    unchanged_cond = reduce(
        lambda x, y: x & y,
        [_same(F.col(a), F.col(f"_n_{a}")) for a in attrs])
    matched = (F.col("__cur_present").isNotNull()
               & F.col("__chg_present").isNotNull())
    left_only = F.col("__chg_present").isNull()
    right_only = F.col("__cur_present").isNull()

    # open rows that survive as-is: untouched keys + unchanged matches
    keep_open = (j.filter(left_only | (matched & unchanged_cond))
                 .select(key, *attrs, from_col, to_col, flag_col))
    # matched-and-changed: the old open row closes at the change date
    close_old = (j.filter(matched & ~unchanged_cond)
                 .select(open_[key].alias(key), *attrs, from_col,
                         F.col("_ts").alias(to_col),
                         F.lit(False).alias(flag_col)))
    # matched-and-changed + brand-new keys: a fresh open row
    new_open = (j.filter(right_only | (matched & ~unchanged_cond))
                .select(F.col("_k").alias(key),
                        *[F.col(f"_n_{a}").alias(a) for a in attrs],
                        F.col("_ts").alias(from_col),
                        F.lit(None).cast(current.schema[to_col].dataType)
                         .alias(to_col),
                        F.lit(True).alias(flag_col)))

    return (closed.select(key, *attrs, from_col, to_col, flag_col)
            .unionByName(keep_open)
            .unionByName(close_old)
            .unionByName(new_open))
