"""Checkpoint RESTART recovery: a stopped streaming query resumed as
a brand-new query object over the same checkpointLocation must carry
its state store and source offsets across the restart — the property
that makes exactly-once ingestion survive process death, and one no
single-run test (however many micro-batches) actually exercises."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    dedup_stream,
)


def _t(h, m):
    return dt.datetime(2024, 3, 1, h, m)


SCHEMA = ["event_id", "ts", "user_id", "event_type", "value", "props"]
RUN1 = [
    (1, _t(10, 0), 1, "view", 1.0, "{}"),
    (2, _t(10, 5), 1, "purchase", 5.0, "{}"),
]
RUN2 = [
    (1, _t(10, 0), 1, "view", 1.0, "{}"),       # replay of run-1 row
    (2, _t(10, 5), 1, "purchase", 5.0, "{}"),    # replay of run-1 row
    (3, _t(10, 30), 2, "purchase", 7.0, "{}"),   # genuinely new
]


def _add_file(spark, tmp_path, src, idx, rows):
    stage = os.path.join(str(tmp_path), f"stage{idx}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dest = os.path.join(src, f"{idx}.parquet")
    shutil.copyfile(part, dest)
    os.utime(dest, (1_000_000_000 + idx * 100,) * 2)


def _run(spark, src, schema, ckpt, out):
    # file sink, not memory: the memory sink refuses checkpoint
    # recovery ("does not support recovering"), and the file sink is
    # the fault-tolerant one a real pipeline restarts into anyway
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream, keys=("event_id",), delay="6 hours")
         .writeStream.format("parquet")
         .option("path", out)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    assert q.awaitTermination(180)
    return [r.event_id for r in spark.read.parquet(out).collect()]


def test_dedup_state_survives_query_restart(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    out = os.path.join(str(tmp_path), "out")

    _add_file(spark, tmp_path, src, 0, RUN1)
    schema = spark.read.parquet(src).schema
    got1 = _run(spark, src, schema, ckpt, out)
    assert sorted(got1) == [1, 2]

    # process "dies"; later a NEW file lands that REPLAYS run-1 rows
    # (the at-least-once upstream) plus one new event
    _add_file(spark, tmp_path, src, 1, RUN2)
    got2 = _run(spark, src, schema, ckpt, out)
    # the restarted query must (a) not re-read file 0 (offsets
    # recovered) and (b) suppress the replayed keys via the RECOVERED
    # dedup state — the sink gains only the genuinely-new event
    assert sorted(got2) == [1, 2, 3], got2
