"""Adaptive Query Execution claims, pinned against the real engine:
session.py turns AQE on and SCALE.md leans on it (runtime partition
coalescing, dynamic join selection) — these tests assert the runtime
re-plans actually happen, not just that the flags are set."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def _final_plan(df) -> str:
    # the action must run THIS DataFrame's own QueryExecution (a noop
    # write spawns a separate one and leaves this plan
    # isFinalPlan=false); after collect the AdaptiveSparkPlan holds
    # AQE's final re-plan
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """A grouped aggregate over tiny data must NOT execute with the
    configured shuffle-partition count: AQE's runtime coalesce merges
    the post-shuffle partitions down to the few the data justifies —
    the mechanism that lets the session over-provision
    shuffle.partitions for the big queries without paying empty-task
    overhead on the small ones."""
    agg = (read_table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus").agg(F.count("*").alias("n")))
    plan = _final_plan(agg)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]
    # and the executed partition count is below the configured one
    configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts = agg.rdd.getNumPartitions()
    assert n_parts < configured, (n_parts, configured)


def test_aqe_switches_to_broadcast_at_runtime(spark, sf_dir):
    """Dynamic join selection: a join whose small side is only small
    AFTER a selective filter (invisible to static size-in-bytes
    estimation over raw parquet) must be re-planned by AQE into a
    broadcast join at runtime from the filter's actual output size.
    This is the 100 TB safety net for filtered-dimension joins where
    stats are missing or stale."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # force the static planner away from broadcast: hint-free join
    # where the right side's FILE size exceeds the threshold but its
    # filtered output is a handful of rows
    small = orders.filter(F.col("o_orderkey") % 5000 == 1)
    joined = li.join(small, li["l_orderkey"] == small["o_orderkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # static threshold too small for the raw file, so the initial
        # plan is a shuffle join; AQE's runtime threshold stays default
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        plan = _final_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_aqe_splits_skewed_join_partitions(spark):
    """Skew-join splitting: one hot key holding ~90% of the left side
    must make AQE mark the sort-merge join skew=true and split the hot
    partition into multiple reader tasks (AQEShuffleRead ... skewed) —
    the runtime complement to the explicit salting rewrite in
    operators/skew.py, and the reason a surprise hot key degrades
    gracefully instead of serializing one straggler task. Thresholds
    are lowered so the 60k-row fixture crosses them; the MECHANISM
    under test is identical at production sizes."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 60000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string"))
            .alias("pad"))
        right = spark.range(0, 200).select(
            F.col("id").alias("k"), F.lit("r").alias("rv"))
        j = left.join(right, "k")
        plan = _final_plan(j)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, plan[:3000]
    assert "skewed" in plan, plan[:3000]
