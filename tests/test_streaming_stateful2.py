"""applyInPandasWithState running distinct counts: stream == batch,
across micro-batches, with re-appearing users."""

from __future__ import annotations

import glob
import os
import shutil


def test_stateful_distinct_users_match_batch(spark, tmp_path):
    """Two micro-batches; user 2 appears in BOTH (the dedup-across-
    batches case the state exists for) and user 3 only in the second.
    The final per-key emission must equal countDistinct over the
    union, and the emissions must be monotone non-decreasing."""
    import datetime as dt

    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful_distinct import (
        distinct_users_batch,
        distinct_users_stream,
    )

    def t(h, m):
        return dt.datetime(2024, 3, 1, h, m)

    schema = ["event_id", "ts", "user_id", "event_type", "value",
              "props"]
    batch1 = [
        (1, t(9, 0), 1, "view", 1.0, "{}"),
        (2, t(9, 1), 2, "view", 1.0, "{}"),
        (3, t(9, 2), 2, "click", 1.0, "{}"),
    ]
    batch2 = [
        (4, t(10, 0), 2, "view", 1.0, "{}"),   # re-appears: no growth
        (5, t(10, 1), 3, "view", 1.0, "{}"),   # new user: +1
        (6, t(10, 2), 3, "click", 1.0, "{}"),
    ]
    src = str(tmp_path / "du_src")
    os.makedirs(src)
    for i, rows in enumerate([batch1, batch2]):
        stage = os.path.join(str(tmp_path), f"du_stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100,) * 2)

    batch_df = spark.read.parquet(src)
    expected = {(r.event_type, r.distinct_users)
                for r in distinct_users_batch(batch_df).collect()}
    assert expected == {("view", 3), ("click", 2)}

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (distinct_users_stream(stream)
         .writeStream.format("memory").queryName("du")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "du_ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM du").collect()
    # one emission per key per micro-batch it appeared in
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r.event_type, []).append(r.distinct_users)
    # counts are monotone (a set only grows)
    for counts in per_key.values():
        assert counts == sorted(counts)
    final = {(k, v[-1]) for k, v in per_key.items()}
    assert final == expected
    # the cross-batch emissions show the state actually carried:
    # view was 2 after batch1, 3 after batch2
    assert per_key["view"] == [2, 3]
    assert per_key["click"] == [1, 2]


def test_stateful_distinct_users_full_table(spark, sf_dir):
    """Single-batch sanity at fixture scale: stream over the real
    events table equals the batch countDistinct."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful_distinct import (
        distinct_users_batch,
        distinct_users_stream,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
        stream_events,
    )

    q = (distinct_users_stream(stream_events(spark, sf_dir,
                                             max_files_per_trigger=100))
         .writeStream.format("memory").queryName("du_full")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    got = {(r.event_type, r.distinct_users)
           for r in spark.sql("SELECT * FROM du_full").collect()}
    want = {(r.event_type, r.distinct_users)
            for r in distinct_users_batch(
                read_table(spark, sf_dir, "events")).collect()}
    assert len(want) > 0
    assert got == want
