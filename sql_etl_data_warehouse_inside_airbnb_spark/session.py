"""SparkSession factory.

Replaces the reference's session setup (``modules/spark_manager.py:34-48``,
``config/settings.py:47-54``: local[*], 4g, shuffle.partitions=8, Arrow on)
with a scale-ready configuration:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy) —
  instead of the reference's fixed ``shuffle.partitions=8``.
- Arrow on for any pandas-UDF path (the reference enabled it too).
- UTC session timezone so timestamp semantics are reproducible across
  engines (the DuckDB oracle reads parquet timestamps as naive/UTC).

On a real cluster the same builder is used; only ``master`` and the
memory/shuffle sizing change (see ``cluster_conf``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] harness; on a 1000-executor cluster the
# shuffle partition count should be ~2-3x total cores (AQE coalesces down),
# and autoBroadcastJoinThreshold stays - dims here are MBs, facts are TBs.
LOCAL_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # keep planner free to broadcast the small dims (region/nation/supplier,
    # dim_dates, dim_hosts); 64m is safe with 128 GiB local heap
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # files: pack small test files, split big ones; at 100 TB this is the
    # lever that sets scan parallelism (default 128m per partition)
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def cluster_conf(total_cores: int, executor_mem_gb: int = 16) -> dict[str, str]:
    """Recommended conf deltas for a real cluster (spark-submit sets
    master/executors; this sizes the SQL layer). Shuffle partitions at
    ~2.5x total cores gives AQE room to coalesce; broadcast threshold
    stays — dims are MBs while facts are TBs at the 100 TB target."""
    return {
        "spark.sql.shuffle.partitions": str(max(64, int(total_cores * 2.5))),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        # keep scan partitions near the parquet row-group size so a
        # task's input fits comfortably in executor memory
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }


def get_spark(app_name: str = "sql-etl-dw-inside-airbnb-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to
    ``local[$SPARK_GRAFT_CPUS]`` locally; pass None on a cluster where
    spark-submit provides it."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(LOCAL_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
