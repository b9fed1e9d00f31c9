"""Streaming ingestion dedup (dropDuplicatesWithinWatermark): a
duplicate redelivered in a LATER micro-batch — the buffered-state case
the operator exists for — must still collapse to one output row, and
the streaming output must equal the batch dropDuplicates result."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    dedup_events,
)


def _t(h, m):
    return dt.datetime(2024, 3, 1, h, m)


# (event_id, ts, user_id, event_type, value, props)
BATCH1 = [
    (1, _t(10, 0), 1, "view", 1.0, "{}"),
    (2, _t(10, 5), 1, "purchase", 5.0, "{}"),
    (2, _t(10, 5), 1, "purchase", 5.0, "{}"),   # same-batch duplicate
    (3, _t(10, 10), 2, "view", 2.0, "{}"),
]
BATCH2 = [
    (3, _t(10, 10), 2, "view", 2.0, "{}"),      # cross-batch duplicate
    (1, _t(10, 0), 1, "view", 1.0, "{}"),       # cross-batch duplicate
    (4, _t(10, 30), 2, "purchase", 7.0, "{}"),  # genuinely new
]

SCHEMA = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_stream_dedup_within_watermark_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate([BATCH1, BATCH2]):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src)
    expected = {r.event_id for r in dedup_events(batch_df).collect()}
    assert expected == {1, 2, 3, 4}

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_events(stream, streaming=True, delay="2 hours")
         .writeStream.format("memory").queryName("sdd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = [r.event_id for r in spark.sql("SELECT event_id FROM sdd").collect()]
    assert sorted(got) == sorted(expected)  # once each, incl. 1 and 3
