"""Empty-input robustness: at 100 TB some partition, some filter
result, some day's delta is ALWAYS empty — every operator must return
an empty (or correctly-shaped) result instead of throwing. This sweep
drives the core operator surface with zero-row inputs of the right
schema."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_dedup_family_on_empty(spark, empty_docs):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        exact_dedup,
        line_dedup,
        ngram_jaccard_pairs,
        ppjoin_prefix_pairs,
        simhash_near_pairs,
    )
    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    docs2 = empty_docs.withColumn("lang", F.lit("en"))
    assert ngram_jaccard_pairs(docs2, "doc_id", "text",
                               block_col="lang").count() == 0
    assert ppjoin_prefix_pairs(empty_docs, "doc_id", "text").count() == 0
    assert simhash_near_pairs(empty_docs, "doc_id", "text").count() == 0
    assert line_dedup(empty_docs, "doc_id", "text").count() == 0


def test_curation_family_on_empty(spark, empty_docs):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        bloom_decontaminate,
        c4_sentence_filter,
        gopher_signals,
        trigram_familiarity,
    )
    assert gopher_signals(empty_docs, "doc_id", "text").count() == 0
    assert c4_sentence_filter(empty_docs, "doc_id", "text").count() == 0
    assert trigram_familiarity(empty_docs, "doc_id", "text").count() == 0
    # empty BENCHMARK set: nothing can be contaminated, corpus survives
    docs = spark.createDataFrame([(1, "a b c d e f")],
                                 ["doc_id", "text"])
    assert bloom_decontaminate(docs, empty_docs, "doc_id",
                               "text").count() == 0
    # empty corpus against a real benchmark: zero flags, no throw
    assert bloom_decontaminate(empty_docs, docs, "doc_id",
                               "text").count() == 0


def test_graph_and_merge_on_empty(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        assign_clusters,
        connected_components,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
        merge_upsert,
    )
    empty_pairs = spark.createDataFrame([], "key_a bigint, key_b bigint")
    assert connected_components(empty_pairs, src="key_a",
                                dst="key_b").count() == 0
    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    clustered = assign_clusters(docs, "doc_id", empty_pairs)
    got = {(r["doc_id"], r["cluster_id"]) for r in clustered.collect()}
    assert got == {(1, 1), (2, 2)}  # all singletons

    target = spark.createDataFrame([(1, "a")], ["id", "v"])
    empty_delta = spark.createDataFrame([], "id bigint, v string")
    merged = merge_upsert(target, empty_delta, key="id",
                          count_actions=False)
    assert merged.df.count() == 1  # empty delta is a no-op


def test_week_rollup_on_empty(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
        tsql_week_start,
    )
    li = spark.createDataFrame(
        [], "l_suppkey bigint, l_shipdate timestamp, "
            "l_extendedprice double")
    out = (li.groupBy("l_suppkey",
                      tsql_week_start("l_shipdate").alias("ws"))
           .agg(F.count("*").alias("n")))
    assert out.count() == 0


def test_r9_operators_on_empty(spark):
    """Round-9 surface: peak concurrency / TWAP / cohort sweeps on an
    empty events frame, the quota limiter on an empty batch, the
    IVFADC probe against an empty candidate set — each must return
    zero rows with the declared schema, never throw."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
        peak_concurrency,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivfadc_portable_topk,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.admission import (
        quota_admit_batch,
    )

    empty_events = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double")
    got = peak_concurrency(empty_events)
    assert got.columns == ["day", "n_sessions", "peak_concurrent"]
    assert got.count() == 0
    qa = quota_admit_batch(empty_events, cap=10)
    assert qa.columns == ["event_type", "n_admitted", "n_rejected"]
    assert qa.count() == 0

    empty_vecs = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>")
    query = spark.createDataFrame(
        [(0, [0.5] * 64)], "vec_id bigint, embedding array<float>")
    out = ivfadc_portable_topk(empty_vecs, query, k=5)
    assert out.columns == ["vec_id", "cosine", "rank"]
    assert out.count() == 0
