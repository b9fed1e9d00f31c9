"""Round-5 operators: position-based attribution, drift/PSI bins,
and RRF rank fusion — hand-computable examples plus the invariants
the oracle hash can't see (per-user credit conservation, PSI scalar
correctness, fusion arithmetic)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    position_attribution_bp,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    drift_bin_counts,
    psi_from_counts,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
    rank_list,
    rrf_fuse,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


class TestPositionAttribution:
    def test_hand_example_all_shapes(self, spark):
        rows = [
            # user 1: one touch -> 10000 to 'ad'
            (1, 1, _ts(0), "ad"), (1, 2, _ts(1), "purchase"),
            # user 2: two touches -> 5000 each (middle pool absorbed)
            (2, 1, _ts(0), "ad"), (2, 2, _ts(1), "email"),
            (2, 3, _ts(2), "purchase"),
            # user 3: five touches -> 4000 / 667 / 667 / 666 / 4000
            # (mid pool 2000 over 3 mids: 666 each, remainder 2 to the
            # two EARLIEST mids)
            (3, 1, _ts(0), "ad"), (3, 2, _ts(1), "email"),
            (3, 3, _ts(2), "social"), (3, 4, _ts(3), "email"),
            (3, 5, _ts(4), "ad"), (3, 6, _ts(5), "purchase"),
            # user 4: no conversion -> no credit
            (4, 1, _ts(0), "ad"), (4, 2, _ts(1), "email"),
            # user 5: conversion with no preceding touch -> no credit;
            # post-conversion touches are NOT credited
            (5, 1, _ts(0), "purchase"), (5, 2, _ts(1), "ad"),
        ]
        out = {r["channel"]: r for r in
               position_attribution_bp(_ev(spark, rows)).collect()}
        # ad: u1 10000, u2 first 5000, u3 first 4000 + last 4000
        assert out["ad"]["total_bp"] == 10000 + 5000 + 8000
        assert out["ad"]["n_touches"] == 4
        assert out["ad"]["n_users"] == 3
        # email: u2 last 5000, u3 mids at tidx 2 and 4 -> 667 + 666
        assert out["email"]["total_bp"] == 5000 + 667 + 666
        # social: u3 mid at tidx 3 -> 667
        assert out["social"]["total_bp"] == 667
        assert set(out) == {"ad", "email", "social"}

    def test_per_user_credit_sums_to_10000(self, spark, sf_dir):
        from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
            read_table,
        )
        ev = read_table(spark, sf_dir, "events")
        # rebuild the per-user credited relation the operator
        # aggregates away: total over ALL channels == 10000 * number
        # of users that converted with >=1 preceding touch
        out = position_attribution_bp(ev, "purchase")
        total = out.agg(F.sum("total_bp")).first()[0]
        w_users = (out.agg(F.sum("n_users")).first()[0])  # upper bound
        assert total % 10_000 == 0
        n_credited = total // 10_000
        assert 0 < n_credited <= w_users

    def test_weight_validation(self, spark):
        with pytest.raises(ValueError, match="first_bp"):
            position_attribution_bp(_ev(spark, []), first_bp=6000,
                                    last_bp=4000)


class TestDriftPsi:
    def test_bin_counts_and_psi(self, spark):
        df = spark.createDataFrame(
            [("a", 0)] * 5 + [("b", 0)] * 5
            + [("a", 1)] * 2 + [("b", 1)] * 8,
            "k string, cur int")
        rep = drift_bin_counts(df, F.col("cur") == 1, [F.col("k")])
        rows = {r["k"]: r for r in rep.collect()}
        assert (rows["a"]["n_base"], rows["a"]["n_cur"]) == (5, 2)
        assert (rows["b"]["n_base"], rows["b"]["n_cur"]) == (5, 8)
        psi = psi_from_counts(rep.collect())
        expected = ((0.2 - 0.5) * math.log(0.2 / 0.5)
                    + (0.8 - 0.5) * math.log(0.8 / 0.5))
        assert psi == pytest.approx(expected)

    def test_null_label_counts_neither(self, spark):
        df = spark.createDataFrame(
            [("a", True), ("a", False), ("a", None)],
            "k string, cur boolean")
        r = drift_bin_counts(df, F.col("cur"), [F.col("k")]).first()
        assert (r["n_base"], r["n_cur"]) == (1, 1)

    def test_psi_empty_side_raises(self):
        with pytest.raises(ValueError, match="empty"):
            psi_from_counts([{"n_base": 0, "n_cur": 3}])


class TestRrfFuse:
    def test_hand_fusion(self, spark):
        a = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "k bigint, rank int")
        b = spark.createDataFrame(
            [(20, 1), (40, 2)], "k bigint, rank int")
        out = {r["k"]: r for r in
               rrf_fuse([a, b], "k", k=60, topk=10).collect()}
        # contributions: 1e6 DIV (60 + rank)
        assert out[10]["rrf_milli"] == 1_000_000 // 61
        assert out[20]["rrf_milli"] == (1_000_000 // 62
                                        + 1_000_000 // 61)
        assert out[40]["rrf_milli"] == 1_000_000 // 62
        assert out[20]["n_lists"] == 2 and out[10]["n_lists"] == 1
        # fused order: 20 (two lists) first, then 10, 30/40 by value
        ranks = {k: r["fused_rank"] for k, r in out.items()}
        assert ranks[20] == 1 and ranks[10] == 2
        # 30 (1e6 DIV 63) < 40 (1e6 DIV 62)
        assert ranks[40] == 3 and ranks[30] == 4

    def test_rank_list_bounds_and_order(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, 9), (3, 9), (4, 1)], "k bigint, score bigint")
        got = {r["k"]: r["rank"] for r in
               rank_list(df, "k", [F.desc("score"), F.col("k")],
                         3).collect()}
        # score desc, key asc tiebreak; topk=3 drops k=4
        assert got == {2: 1, 3: 2, 1: 3}

    def test_empty_lists_raise(self):
        with pytest.raises(ValueError, match="ranked list"):
            rrf_fuse([], "k")


class TestMinhashIngest:
    def test_corpus_and_within_batch_pairs(self, spark):
        from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
            minhash_banded_pairs,
            minhash_index,
            minhash_ingest_pairs,
        )
        text = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark quiet forest tonight")
        corpus = spark.createDataFrame(
            [(1, text), (2, "completely different words entirely here "
                            "about unrelated matters of state and law")],
            "doc_id bigint, text string")
        batch = spark.createDataFrame(
            [(101, text + " mutation"), (102, text + " mutation two"),
             (103, "nothing like anything else in any corpus at all "
                   "whatsoever honestly truly unique novel content")],
            "doc_id bigint, text string")
        bands, sh = minhash_index(corpus)
        pairs = minhash_ingest_pairs(batch, bands, sh)
        got = {(r["key_new"], r["key_dup"]) for r in pairs.collect()}
        # batch->corpus pairs plus the oriented within-batch pair
        assert (101, 1) in got and (102, 1) in got
        assert (102, 101) in got
        # novel doc matches nothing; corpus never appears as key_new
        assert not [p for p in got if p[0] == 103]
        assert not [p for p in got if p[0] in (1, 2)]
        # consistency with the batch self-join over corpus+batch:
        # every ingest pair must be a pair there too (same family)
        full = minhash_banded_pairs(corpus.unionByName(batch),
                                    "doc_id", "text")
        full_pairs = {(max(r["key_a"], r["key_b"]),
                       min(r["key_a"], r["key_b"]))
                      for r in full.collect()}
        for key_new, key_dup in got:
            assert (max(key_new, key_dup), min(key_new, key_dup)) \
                in full_pairs

    def test_threshold_is_integer_exact(self, spark):
        from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
            minhash_index,
            minhash_ingest_pairs,
        )
        # J exactly 1/2: sh_a = {g1..g4}, sh_b = sh_a + 4 extra grams
        # -> inter 4, union 8; threshold 1/2 must KEEP it (>=)
        a = "w1 w2 w3 w4 w5 w6"                      # 4 shingles
        b = a + " x1 x2 x3 x4"                       # +4 shingles
        corpus = spark.createDataFrame([(1, a)], "doc_id bigint, text string")
        batch = spark.createDataFrame([(2, b)], "doc_id bigint, text string")
        bands, sh = minhash_index(corpus)
        rows = minhash_ingest_pairs(batch, bands, sh).collect()
        if rows:  # candidate only if some band collides (J=1/2 often does)
            r = rows[0]
            assert (r["inter_n"], r["union_n"]) == (4, 8)
