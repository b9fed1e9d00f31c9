"""Measure the erase_keys cost-∝-affected-data claim (SCALE.md):
write orders (sf0.1 by default) partitioned into ~150 key buckets,
then time erasure batches that touch 1, 4, 16, and 64 partitions.

If the partition-pruned rewrite works as designed, wall time scales
with the AFFECTED partition count (plus a flat job-overhead floor),
not with table size — the whole-table fallback (partition_cols=None)
is timed alongside as the "what you'd pay without layout" bar.

Usage: python tools/bench_erasure.py [sf_dir]   (default sf0.1)
Prints one JSON line {"n_partitions": sec, ..., "full_table": sec}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark  # noqa: E402
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (  # noqa: E402
    erase_keys,
    read_table,
)

BUCKET = 100  # cust_bucket = o_custkey div 100 — the s17 layout


def write_table(spark, sf_dir: str, path: str):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        (F.col("o_custkey") - F.pmod("o_custkey", F.lit(BUCKET)))
        .alias("cust_bucket"))
    orders.write.mode("overwrite").partitionBy("cust_bucket").parquet(path)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_erasure")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="erase_bench_")
    out: dict[str, float] = {}
    try:
        for n_parts in (1, 4, 16, 64):
            path = os.path.join(base, f"orders_{n_parts}")
            write_table(spark, sf_dir, path)
            # one tenant key per target partition — picked from the
            # DATA (TPC-H leaves every 3rd customer orderless, so a
            # synthetic k·BUCKET key can miss its bucket entirely)
            keys = (spark.read.parquet(path)
                    .groupBy("cust_bucket")
                    .agg(F.min("o_custkey").alias("o_custkey"))
                    .orderBy("cust_bucket").limit(n_parts)
                    .select("o_custkey"))
            keys = spark.createDataFrame(keys.collect())
            t0 = time.perf_counter()
            stats = erase_keys(spark, path, "o_custkey", keys,
                               partition_cols=["cust_bucket"])
            out[str(n_parts)] = round(time.perf_counter() - t0, 3)
            assert stats["partitions_rewritten"] == n_parts, stats
        # the no-layout bar: same erasure, whole-table rewrite
        path = os.path.join(base, "orders_full")
        write_table(spark, sf_dir, path)
        keys = spark.createDataFrame(
            spark.read.parquet(path)
            .agg(F.min("o_custkey").alias("o_custkey")).collect())
        t0 = time.perf_counter()
        erase_keys(spark, path, "o_custkey", keys, partition_cols=None)
        out["full_table"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "bucket": BUCKET,
                      "erase_sec_by_affected_partitions": out}))
    spark.stop()


if __name__ == "__main__":
    main()
