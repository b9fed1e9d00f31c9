"""Structured Streaming surface (SURVEY §2.9 — capability extension).

The reference is pure batch; its incremental-batch idempotency (J4
anti-join, J8 MERGE) is the batch analogue of exactly-once sinks. This
package adds the real streaming surface over the unified DataFrame API:
the window builders below produce identical plans for ``spark.read`` and
``spark.readStream`` inputs.
"""

from sql_etl_data_warehouse_inside_airbnb_spark.streaming.sinks import (
    run_stream_upsert_parquet,
    upsert_batch_to_parquet,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    dedup_stream,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "stream_events",
           "dedup_stream", "run_stream_upsert_parquet",
           "upsert_batch_to_parquet"]
