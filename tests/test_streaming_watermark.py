"""Watermark semantics on the REAL streaming path: two parquet files
become two micro-batches (maxFilesPerTrigger=1), pinning what the
engine actually guarantees (verified against Spark 4.1.2):

1. append mode emits a window ONLY after the watermark passes its end
   (finalization) — still-open windows are withheld;
2. rows within the grace interval always merge into live state;
3. watermark-driven eviction is LAZY (runs in the batch after the
   watermark passes), so a "late" row arriving before its window's
   state is evicted still merges — the watermark is a lower bound on
   what's kept, never a mechanism that drops early;
4. a row arriving after its window's state WAS evicted is best-effort:
   the engine resurrects the window and emits it as a separate row
   (it is NOT silently dropped) — downstream exactly-once sinks must
   therefore upsert by window key, the same idempotent-append
   discipline the batch ETL uses (merge_upsert / anti-join
   insert-if-absent).

The registry query ``stream_watermark_late_drop`` is the stricter
drop-all-late batch rewrite of the same rule — the bound the engine's
guarantee (1)-(3) is conservative with respect to.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    tumbling_agg,
    with_watermark,
)


def _t(h, m):
    return dt.datetime(2024, 3, 1, h, m)


def _template(spark):
    return spark.createDataFrame(
        [(1, _t(10, 0), 1, "click", 1.0, "{}")],
        ["event_id", "ts", "user_id", "event_type", "value", "props"])


def _run_two_batches(spark, tmp_path, batch1, batch2, query_name):
    """Write each batch as one parquet file with a controlled mtime
    (FileStreamSource orders by modification time) and drive the
    tumbling aggregate with a 30 min watermark, 1 file per trigger."""
    template = _template(spark)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for i, rows in enumerate([batch1, batch2]):
        stage = os.path.join(str(tmp_path), f"stage{i}")
        spark.createDataFrame(rows, template.schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    stream = (spark.readStream
              .schema(template.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir))
    agg = tumbling_agg(with_watermark(stream, "ts", "30 minutes"),
                       size="1 hour")
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    return {r.window_start.hour: r.n_events
            for r in spark.sql(f"SELECT * FROM {query_name}").collect()}


def test_append_finalization_grace_and_resurrection(spark, tmp_path):
    # batch 1: max ts 11:00 -> watermark becomes 10:30 for batch 2
    batch1 = [(1, _t(10, 0), 1, "click", 1.0, "{}"),
              (2, _t(10, 5), 1, "click", 1.0, "{}"),
              (3, _t(11, 0), 1, "click", 1.0, "{}")]
    # batch 2: 10:40 is within grace (10h window end 11:00 > wm 10:30)
    # -> merges; 09:50 is below the watermark and its window never had
    # state -> resurrected as its own emission (guarantee 4, NOT a
    # silent drop); 12:30 pushes the final watermark to 12:00 so the
    # 10h and 11h windows finalize, while the 12h window stays open
    batch2 = [(4, _t(9, 50), 1, "click", 1.0, "{}"),
              (5, _t(10, 40), 1, "click", 1.0, "{}"),
              (6, _t(12, 30), 1, "click", 1.0, "{}")]
    got = _run_two_batches(spark, tmp_path, batch1, batch2, "wm_resurrect")
    assert got == {9: 1, 10: 3, 11: 1}  # and no 12h row: still open


def test_late_row_merges_while_state_not_yet_evicted(spark, tmp_path):
    # batch 1 builds 9h state AND raises the watermark past its end
    # (wm 10:30 > window end 10:00). Eviction runs lazily in batch 2,
    # so batch 2's 09:50 row still merges before emission: count 3,
    # not 2 + a duplicate
    batch1 = [(1, _t(9, 0), 1, "click", 1.0, "{}"),
              (2, _t(9, 10), 1, "click", 1.0, "{}"),
              (3, _t(11, 0), 1, "click", 1.0, "{}")]
    batch2 = [(4, _t(9, 50), 1, "click", 1.0, "{}"),
              (5, _t(12, 30), 1, "click", 1.0, "{}")]
    got = _run_two_batches(spark, tmp_path, batch1, batch2, "wm_lazy")
    assert got == {9: 3, 11: 1}
