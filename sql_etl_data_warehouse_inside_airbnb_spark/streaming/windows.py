"""Windowed aggregations over event streams.

Unified-API builders: each takes any events DataFrame (batch read or
``readStream``) and returns the windowed aggregate plan. In streaming
mode add ``with_watermark`` so state for closed windows is dropped —
unbounded state is the streaming equivalent of the unpartitioned-scan
mistake at 100 TB.

Window grids align with DuckDB ``time_bucket``/``date_trunc`` (both
epoch-aligned for day/hour/minute granularities), which makes tumbling
and sliding aggregates oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
    normalize_event_time,
)


def tumbling_agg(events: DataFrame, size: str = "1 day",
                 ts_col: str = "ts") -> DataFrame:
    """Tumbling windows: count + value sum per (window, event_type)."""
    w = F.window(ts_col, size)
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))


def sliding_agg(events: DataFrame, size: str = "1 day",
                slide: str = "12 hours", ts_col: str = "ts") -> DataFrame:
    """Sliding windows (each event lands in size/slide windows)."""
    w = F.window(ts_col, size, slide)
    return (events.groupBy(w.alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events", "sum_value"))


def session_agg(events: DataFrame, gap: str = "2 hours",
                ts_col: str = "ts") -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events arrive within ``gap`` of the previous one; ``session_end``
    is last event + gap (Spark session_window semantics)."""
    w = F.session_window(ts_col, gap)
    return (events.groupBy(w.alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                          .cast("double"), 4).alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def with_watermark(events: DataFrame, ts_col: str = "ts",
                   delay: str = "1 hour") -> DataFrame:
    """Late-data bound: windows older than max(event time) - delay are
    finalized (append mode emits them) and their state evicted, which
    is what bounds state size on an unbounded stream. The guarantee is
    one-sided: rows within the delay always merge; rows older than the
    watermark are best-effort (the engine may still merge them while
    the window's state is live, or re-emit an evicted window as a
    separate row — pinned in tests/test_streaming_watermark.py), so
    exactly-once sinks upsert by window key."""
    return events.withWatermark(ts_col, delay)


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """The events table as a file stream: same schema as the batch read,
    so every builder above runs unchanged on it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # FileStreamSource monitors a directory; select just the events
    # table out of it with a glob filter
    stream = (spark.readStream
              .schema(raw_schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    # bigint nanos → micros (integer div, NOT `/`: float division
    # drifts ±256 ns at 1.7e18) and NTZ → LTZ for watermark support —
    # see sources/io.py:normalize_event_time
    return normalize_event_time(stream)


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         timeout_sec: int = 120,
                         output_mode: str = "complete") -> None:
    """Drive a streaming plan to completion into an in-memory sink
    (test/demo harness; production sinks are kafka/delta/parquet).
    Raises TimeoutError if the availableNow run doesn't finish within
    ``timeout_sec`` — silently returning would hand the caller a
    partially-populated memory table. Non-aggregating plans (e.g.
    ``dedup_stream``) need ``output_mode="append"``."""
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"stream '{query_name}' still running after {timeout_sec}s;"
            " memory table would be incomplete")


def dedup_stream(events: DataFrame, keys: tuple[str, ...] = ("event_id",),
                 ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state: a duplicate key
    arriving within ``delay`` of the first occurrence is suppressed;
    the key's state is evicted once the watermark passes, so state is
    O(keys-per-delay-window), not O(all keys ever) — the property that
    makes exactly-once ingestion dedup (the streaming J4/ext_dedup_exact)
    survive an unbounded stream. Batch equivalent: ``dropDuplicates``;
    equivalence is asserted in tests/test_streaming_sinks.py."""
    return (events.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(list(keys)))


def dedup_events(events: DataFrame, key_cols: list[str] | None = None,
                 streaming: bool = False,
                 ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Ingestion dedup: keep one row per key — the at-least-once ->
    effectively-once step every event pipeline needs in front of its
    aggregates (redelivered Kafka batches, retried file drops).

    Batch: plain ``dropDuplicates`` on the keys. Streaming
    (``streaming=True``): ``dropDuplicatesWithinWatermark`` after
    watermarking — the operator keeps per-key state only until the
    watermark passes the key's event time, so duplicates arriving
    within ``delay`` of the original are dropped and state stays
    BOUNDED by the watermark horizon, not corpus size. The classic
    unbounded ``dropDuplicates`` on a stream retains every key
    forever — the streaming twin of the unpartitioned scan, and the
    reason this wrapper exists. A duplicate arriving LATER than
    ``delay`` after the original can re-emit (the at-least-once
    residue); sinks that must be exact upsert by key, the same
    discipline as sinks.py:run_stream_upsert_parquet.

    The streaming branch delegates to :func:`dedup_stream` (the one
    watermark+dropDuplicatesWithinWatermark composition in this
    module) — this wrapper just adds the batch twin under one
    signature."""
    keys = key_cols or ["event_id"]
    if streaming:
        return dedup_stream(events, tuple(keys), ts_col, delay)
    return events.dropDuplicates(keys)
