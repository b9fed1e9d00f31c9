"""Stream-stream interval join: the streaming run over micro-batched
file sources must produce exactly the batch result of the same builder
— including matches whose two sides arrive in DIFFERENT micro-batches
(that is the buffered-state case the operator exists for)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.joins import (
    interval_join,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    with_watermark,
)


def _t(h, m):
    return dt.datetime(2024, 3, 1, h, m)


ROWS_BATCH1 = [
    (1, _t(10, 0), 1, "view", 1.0, "{}"),       # matches id 2 (same batch)
    (2, _t(10, 30), 1, "purchase", 5.0, "{}"),
    (4, _t(10, 0), 2, "view", 1.0, "{}"),        # matches id 5 (same batch)
    (5, _t(10, 59), 2, "purchase", 7.0, "{}"),
    (6, _t(10, 0), 3, "view", 1.0, "{}"),        # matches id 7 (NEXT batch)
]
ROWS_BATCH2 = [
    (3, _t(11, 30), 1, "purchase", 9.0, "{}"),   # >1h after view 1: no match
    (7, _t(10, 45), 3, "purchase", 3.0, "{}"),   # cross-batch match with 6
    (8, _t(12, 0), 2, "purchase", 2.0, "{}"),    # >1h after view 4: no match
]

SCHEMA = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _attribution(events):
    views = (events.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    return interval_join(
        with_watermark(views, "view_ts", "2 hours"),
        with_watermark(purchases, "purchase_ts", "2 hours"),
        key="user_id", left_ts="view_ts", right_ts="purchase_ts",
        max_span="1 hour")


def test_stream_interval_join_equals_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for i, rows in enumerate([ROWS_BATCH1, ROWS_BATCH2]):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src_dir)
    expected = {(r.user_id, r.view_id, r.purchase_id)
                for r in _attribution(batch_df).collect()}
    assert expected == {(1, 1, 2), (2, 4, 5), (3, 6, 7)}

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (_attribution(stream)
         .writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.user_id, r.view_id, r.purchase_id)
           for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == expected


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.joins import (
        static_enrich,
    )
    src_dir = str(tmp_path / "ssrc")
    os.makedirs(src_dir)
    for i, rows in enumerate([ROWS_BATCH1, ROWS_BATCH2]):
        stage = os.path.join(str(tmp_path), f"sstage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    # user 3 is missing from the dim: its events must survive w/ nulls
    dim = spark.createDataFrame(
        [(1, "GOLD"), (2, "SILVER")], ["user_id", "segment"])

    batch_df = spark.read.parquet(src_dir)
    expected = {(r.event_id, r.segment)
                for r in static_enrich(batch_df, dim, "user_id").collect()}
    assert (6, None) in expected and (1, "GOLD") in expected

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (static_enrich(stream, dim, "user_id")
         .writeStream.format("memory").queryName("sse")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sse_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.event_id, r.segment)
           for r in spark.sql("SELECT * FROM sse").collect()}
    assert got == expected


def test_stream_interval_join_left_outer_equals_batch(spark, tmp_path):
    """Left-outer stream-stream interval join: unmatched views emit
    with NULL purchase_id once the watermark passes view_ts + span.
    A far-future sentinel event advances the watermark past every
    view under test so the outer rows flush before the stream ends."""
    def _outer(events):
        views = (events.filter(F.col("event_type") == "view")
                 .select("user_id", F.col("event_id").alias("view_id"),
                         F.col("ts").alias("view_ts")))
        purchases = (events.filter(F.col("event_type") == "purchase")
                     .select("user_id",
                             F.col("event_id").alias("purchase_id"),
                             F.col("ts").alias("purchase_ts")))
        return interval_join(
            with_watermark(views, "view_ts", "30 minutes"),
            with_watermark(purchases, "purchase_ts", "30 minutes"),
            key="user_id", left_ts="view_ts", right_ts="purchase_ts",
            max_span="1 hour", how="left_outer")

    rows_b3 = [(99, _t(23, 0), 99, "view", 0.0, "{}")]  # watermark push
    src_dir = str(tmp_path / "osrc")
    os.makedirs(src_dir)
    for i, rows in enumerate([ROWS_BATCH1, ROWS_BATCH2, rows_b3]):
        stage = os.path.join(str(tmp_path), f"ostage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src_dir).filter("user_id != 99")
    expected = {(r.user_id, r.view_id, r.purchase_id)
                for r in _outer(batch_df).collect()}
    # the three matches plus NO unmatched views in this fixture —
    # every view has a partner; make sure the fixture isn't vacuous
    # by checking a view-only user appears with NULL purchase
    assert expected == {(1, 1, 2), (2, 4, 5), (3, 6, 7)}

    # add an unmatched view for user 4 (no purchase ever)
    extra = [(9, _t(10, 10), 4, "view", 1.0, "{}")]
    stage = os.path.join(str(tmp_path), "ostage_x")
    spark.createDataFrame(extra, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(src_dir, "0b.parquet")
    shutil.copyfile(part, dest)
    os.utime(dest, (1_000_000_050,) * 2)

    batch_df = spark.read.parquet(src_dir).filter("user_id != 99")
    expected = {(r.user_id, r.view_id, r.purchase_id)
                for r in _outer(batch_df).collect()}
    assert (4, 9, None) in expected

    stream = (spark.readStream.schema(spark.read.parquet(src_dir).schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (_outer(stream)
         .writeStream.format("memory").queryName("ssjo")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ockpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.user_id, r.view_id, r.purchase_id)
           for r in spark.sql(
               "SELECT * FROM ssjo WHERE user_id != 99").collect()}
    assert got == expected
