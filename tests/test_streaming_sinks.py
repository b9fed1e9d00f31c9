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


def test_stream_dedup_within_watermark_equals_batch_distinct(
        spark, sf_dir, tmp_path):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming import (
        dedup_stream,
    )

    events = read_table(spark, sf_dir, "events").limit(1000)
    # plant exact duplicates (same event_id, same ts) so they land in
    # DIFFERENT micro-batches; the randomly-split files replay out of
    # time order, so the delay must cover the table's full span or the
    # advancing watermark would drop whole out-of-order batches as
    # late input (the state-eviction flip side of bounded dedup)
    dups = events.orderBy("event_id").limit(100)
    salted = events.unionByName(dups)

    src_dir = str(tmp_path / "events_dup_split")
    salted.repartition(4).write.parquet(src_dir)
    stream = (spark.readStream.schema(salted.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))

    q = (dedup_stream(stream, delay="60 days")
         .writeStream.format("memory")
         .queryName("dedup_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.table("dedup_out")
    want = events.select("event_id").distinct().count()
    assert got.count() == want
    assert got.select("event_id").distinct().count() == want


def test_stream_dedup_small_delay_drops_late_batches(
        spark, sf_dir, tmp_path):
    # the flip side pinned explicitly: unlike windowed-aggregation
    # state (which merges within-grace and evicts lazily —
    # test_streaming_watermark.py), dropDuplicatesWithinWatermark
    # FILTERS input rows older than the watermark. Replaying a
    # month-spanning table in random file order with a 1-hour delay
    # must therefore lose rows — if this ever starts passing with
    # equal counts, the engine's late-input contract changed
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming import (
        dedup_stream,
    )

    events = read_table(spark, sf_dir, "events").limit(1000)
    src_dir = str(tmp_path / "events_late_split")
    events.repartition(4).write.parquet(src_dir)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))

    q = (dedup_stream(stream, delay="1 hour")
         .writeStream.format("memory")
         .queryName("dedup_late_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_late"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    n = spark.table("dedup_late_out").count()
    assert n < 1000, "late input must be filtered under a small delay"
    assert n > 0
