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


def test_stream_session_windows_equal_batch(spark, tmp_path):
    """session_window on a watermarked stream must produce the batch
    session_agg result — including a session whose events SPAN two
    micro-batches (the state-merge case session windows exist for)."""
    import datetime as dt
    import glob
    import os
    import shutil

    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
        session_agg,
        with_watermark,
    )

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m)

    schema = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batch1 = [
        (1, t(9, 0), 1, "view", 1.0, "{}"),
        (2, t(9, 30), 1, "view", 2.0, "{}"),    # same session as 1
        (3, t(9, 0), 2, "view", 4.0, "{}"),
    ]
    batch2 = [
        (4, t(10, 30), 1, "view", 8.0, "{}"),   # extends user 1's session
        (5, t(15, 0), 1, "view", 16.0, "{}"),   # new session (gap > 2h)
        (6, t(15, 0), 2, "view", 32.0, "{}"),   # user 2's second session
    ]
    # append mode emits a session only once the watermark passes its
    # end: a final far-future event pushes the watermark beyond every
    # session under test (its own session stays open and unemitted)
    batch3 = [(7, t(23, 0), 99, "view", 0.0, "{}")]
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    for i, rows in enumerate([batch1, batch2, batch3]):
        stage = os.path.join(str(tmp_path), f"sess_stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src)
    under_test = batch_df.filter("user_id != 99")
    expected = {(r.user_id, r.session_start, r.session_end,
                 r.n_events, r.sum_value)
                for r in session_agg(under_test).collect()}
    # user 1: one 3-event session (9:00-12:30) + one single (15:00);
    # user 2: two singles
    assert len(expected) == 4
    assert (1, t(9, 0), t(12, 30), 3, 11.0) in expected

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (session_agg(with_watermark(stream, delay="30 minutes"))
         .writeStream.format("memory").queryName("ssw")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssw_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.user_id, r.session_start, r.session_end,
            r.n_events, r.sum_value)
           for r in spark.sql(
               "SELECT * FROM ssw WHERE user_id != 99").collect()}
    assert got == expected


def test_stream_sliding_windows_equal_batch(spark, tmp_path):
    """sliding windows on a watermarked stream == batch sliding_agg,
    with a cross-micro-batch window (events from both batches land in
    one overlapping window) and a flush event finalizing them all."""
    import datetime as dt
    import glob
    import os
    import shutil

    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
        sliding_agg,
        with_watermark,
    )

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m)

    schema = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batch1 = [(1, t(1, 0), 1, "view", 1.0, "{}"),
              (2, t(13, 0), 1, "view", 2.0, "{}")]
    batch2 = [(3, t(14, 0), 2, "view", 4.0, "{}"),
              # flush: watermark = 2024-03-03 - 30min closes everything
              (4, dt.datetime(2024, 3, 3, 0, 0), 99, "view", 0.0, "{}")]
    src = str(tmp_path / "slide_src")
    os.makedirs(src)
    for i, rows in enumerate([batch1, batch2]):
        stage = os.path.join(str(tmp_path), f"slide_stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src)
    cutoff = dt.datetime(2024, 3, 2, 13, 0)
    expected = {(r.window_start, r.window_end, r.n_events, r.sum_value)
                for r in sliding_agg(batch_df).collect()
                if r.window_end <= cutoff}
    # events 2+3 share the Mar1-12:00 -> Mar2-12:00 window even though
    # they arrive in DIFFERENT micro-batches (the state-merge case)
    assert (t(12, 0), dt.datetime(2024, 3, 2, 12, 0), 2, 6.0) in expected

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sliding_agg(with_watermark(stream, delay="30 minutes"))
         .writeStream.format("memory").queryName("ssl")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssl_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.window_start, r.window_end, r.n_events, r.sum_value)
           for r in spark.sql("SELECT * FROM ssl").collect()
           if r.window_end <= cutoff}
    assert got == expected
