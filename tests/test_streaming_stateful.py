"""applyInPandasWithState running totals: stream result == batch agg."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful import (
    user_running_totals,
    user_totals_batch,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    stream_events,
    with_watermark,
)


def test_stateful_running_totals_match_batch(spark, sf_dir):
    stream = with_watermark(stream_events(spark, sf_dir), delay="1 day")
    q = (user_running_totals(stream)
         .writeStream.format("memory").queryName("running_totals")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    # single input file -> one micro-batch -> one open row per user
    got = {r.user_id: (r.n_events, round(r.sum_value, 4))
           for r in spark.sql(
               "SELECT * FROM running_totals WHERE NOT closed").collect()}
    want = {r.user_id: (r.n_events, round(r.sum_value, 4))
            for r in user_totals_batch(
                read_table(spark, sf_dir, "events")
                .withColumn("value", F.coalesce("value", F.lit(0.0)))
            ).collect()}
    assert len(want) > 0
    assert got == want
