"""transformWithStateInPandas running totals: stream == batch agg,
on the RocksDB state store the API requires.

The TWS Python runner needs ``google.protobuf`` (state serde protocol);
without it the runner crashes at init, so these tests skip themselves
where protobuf isn't installed (this container — see the environment
gate note in streaming/stateful_tws.py)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="ENV GATE (permanent in this container): transformWithState's "
           "Python runner requires google.protobuf for its state-serde "
           "protocol, the container has no protobuf and installs are "
           "disallowed. The operator's semantics are covered by the "
           "green applyInPandasWithState twin "
           "(streaming/stateful.py::user_running_totals, "
           "tests/test_streaming_stateful.py); this module executes the "
           "real TWS path wherever protobuf exists.")
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful import (
    user_totals_batch,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful_tws import (
    ROCKSDB_PROVIDER,
    tws_user_running_totals,
)
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    stream_events,
    with_watermark,
)

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_state(spark):
    old = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, old)


def _expected(spark, sf_dir):
    return {r.user_id: (r.n_events, round(r.sum_value, 4))
            for r in user_totals_batch(
                read_table(spark, sf_dir, "events")
                .withColumn("value", F.coalesce("value", F.lit(0.0)))
            ).collect()}


def test_tws_stream_matches_batch(spark, sf_dir, rocksdb_state):
    stream = with_watermark(stream_events(spark, sf_dir), delay="1 day")
    q = (tws_user_running_totals(stream)
         .writeStream.format("memory").queryName("tws_totals")
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    got = {r.user_id: (r.n_events, round(r.sum_value, 4))
           for r in spark.sql(
               "SELECT * FROM tws_totals WHERE NOT closed").collect()}
    want = _expected(spark, sf_dir)
    assert len(want) > 0
    assert got == want


def test_tws_batch_mode_matches_batch_twin(spark, sf_dir, rocksdb_state):
    # the SAME processor on a static frame: no timers, one row per key
    events = (read_table(spark, sf_dir, "events"))
    got = {r.user_id: (r.n_events, round(r.sum_value, 4))
           for r in tws_user_running_totals(events).collect()}
    assert got == _expected(spark, sf_dir)
