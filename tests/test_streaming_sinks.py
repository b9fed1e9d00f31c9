"""foreachBatch idempotent upsert sink: a stream chopped into N
micro-batches must land the SAME warehouse state as one batch run —
the exactly-once-by-key contract the watermark's re-emission behavior
requires (streaming/sinks.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table
from sql_etl_data_warehouse_inside_airbnb_spark.streaming import (
    run_stream_upsert_parquet,
    tumbling_agg,
)


def _keyed(df):
    return df.withColumn(
        "k", F.concat_ws("|", "event_type",
                         F.col("window_start").cast("string")))


def test_multi_batch_upsert_equals_batch_agg(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")

    # chop the table into 3 files -> 3 micro-batches (1 file/trigger)
    src_dir = str(tmp_path / "events_split")
    events.repartition(3).write.parquet(src_dir)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))

    # no watermark on purpose: state never evicts, so update-mode
    # emissions are always cumulative and the last write per key is
    # the final aggregate (eviction + late-row resurrection semantics
    # are pinned separately in test_streaming_watermark.py)
    target = str(tmp_path / "warehouse_agg")
    run_stream_upsert_parquet(
        _keyed(tumbling_agg(stream)), target, key="k",
        checkpoint_dir=str(tmp_path / "ckpt"))

    got = spark.read.parquet(target)
    want = _keyed(tumbling_agg(events))
    assert got.count() == want.count()
    j = (got.select("k", F.col("n_events").alias("got_n"),
                    F.col("sum_value").alias("got_s"))
         .join(want.select("k", F.col("n_events").alias("want_n"),
                           F.col("sum_value").alias("want_s")), "k"))
    assert j.count() == want.count()  # every key present exactly once
    bad = j.filter((F.col("got_n") != F.col("want_n")) |
                   (F.abs(F.col("got_s") - F.col("want_s")) > 1e-6))
    assert bad.count() == 0
