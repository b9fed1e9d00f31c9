"""Hostile-data differential sweep (r11 verdict item 7): run registry
entries through tools/parity.py's EXACT driver-mirror comparison, but
over adversarial variants of the testdata tables instead of the
well-formed fixtures every prior round used:

- ``empty``  — every table truncated to ZERO rows (schema preserved).
  Surfaces builders that assume at least one row exists (a collected
  scalar indexed [0], a limit(1) argmax fed to a merge loop) and
  oracle pairs whose global aggregates disagree on empty input
  (1-row-NULL vs 0-row).
- ``onerow`` — every table cut to its single smallest-keyed row.
  Referential integrity intentionally breaks (the one orders row's
  customer is usually absent): joins must degrade to empty, not
  crash, identically on both engines.
- ``hostile`` — full sf data with adversarial VALUES injected
  deterministically by key: NaN/+Inf/-Inf into every scalar DOUBLE
  column (key % 101/103/107 == 0), and through the text ladder a
  10,000-char single token appended (doc_id % 41), the empty string
  (% 43), and whitespace-only text (% 47). Embedding ARRAYS are left
  untouched: NaN cosine ordering is undefined-by-design for every
  ANN entry (any ordering is "a" top-k) so a cross-engine diff there
  adjudicates nothing — documented exclusion, not an oversight.

Scope: the newest entries by first-adjudication round (computed from
CORRECTNESS_r*.json, the same vintage source the rotation uses) down
to whichever round crosses the 50-entry mark, with that boundary
round included WHOLE — currently the full r6-r11 block, 54 entries.
Streaming twins run their batch form like everywhere else.

Divergences are triaged, not auto-failed: a real robustness bug gets
fixed; a cross-engine SEMANTIC difference on degenerate input (e.g.
DuckDB raises casting NaN to INTEGER where Spark yields NULL) gets
pinned in EXPECTED below with the reason — the sweep then enforces
that the set never silently grows.

Usage: python tools/hostile_parity.py [base_sf_dir] [mode ...] [--all]
       (default base /root/testdata/sf0.001, all three modes;
       --all widens the scope from the newest block to the ENTIRE
       registry — used for the empty-mode full sweep, since an empty
       partition is the one degenerate input every operator meets at
       100 TB regardless of vintage)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.parity import TABLES, check_entry

# key column per table (hostile injection modulus). ORDER_KEYS is the
# deterministic onerow cut — lineitem needs the composite because
# l_orderkey alone has duplicates even at sf0.001 (2 rows share the
# minimum), so a single-column ORDER BY LIMIT 1 could materialize
# either row across runs.
KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}
ORDER_KEYS = {**KEYS, "lineitem": "l_orderkey, l_linenumber"}

# scalar DOUBLE columns eligible for NaN/Inf injection
DOUBLE_COLS = {
    "customer": ["c_acctbal"], "supplier": ["s_acctbal"],
    "part": ["p_retailprice"], "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount",
                 "l_tax"],
    "events": ["value"],
}

# text columns run through the length ladder (documents only — name
# columns feed equality joins where a 10k-char key is just another
# value, not a hazard class)
TEXT_COLS = {"documents": ["text"]}


def _inject_double(col: str, key: str) -> str:
    return (f"CASE WHEN {key} % 101 = 0 THEN CAST('nan' AS DOUBLE) "
            f"WHEN {key} % 103 = 0 THEN CAST('inf' AS DOUBLE) "
            f"WHEN {key} % 107 = 0 THEN CAST('-inf' AS DOUBLE) "
            f"ELSE {col} END AS {col}")


def _inject_text(col: str, key: str) -> str:
    return (f"CASE WHEN {key} % 41 = 0 THEN {col} || ' ' "
            f"|| repeat('x', 10000) "
            f"WHEN {key} % 43 = 0 THEN '' "
            f"WHEN {key} % 47 = 0 THEN '   ' "
            f"ELSE {col} END AS {col}")


def build_mode_dir(base: str, mode: str, out: str) -> None:
    """Materialize the mode's table variants as parquet under out/."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for tbl in TABLES:
        src = f"{base}/{tbl}.parquet"
        dst = f"{out}/{tbl}.parquet"
        cols = [c[0] for c in
                con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if mode == "empty":
            sel = f"SELECT * FROM '{src}' LIMIT 0"
        elif mode == "onerow":
            sel = (f"SELECT * FROM '{src}' "
                   f"ORDER BY {ORDER_KEYS[tbl]} LIMIT 1")
        elif mode == "hostile":
            exprs = []
            for c in cols:
                if c in DOUBLE_COLS.get(tbl, []):
                    exprs.append(_inject_double(c, KEYS[tbl]))
                elif c in TEXT_COLS.get(tbl, []):
                    exprs.append(_inject_text(c, KEYS[tbl]))
                else:
                    exprs.append(c)
            sel = f"SELECT {', '.join(exprs)} FROM '{src}'"
        else:
            raise SystemExit(f"unknown mode {mode}")
        con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET)")


def newest_entries(n: int = 50) -> list[str]:
    """Entries first adjudicated in the newest rounds. The cut never
    splits a round mid-block: a plain [:n] silently dropped the
    alphabetical tail of the boundary round (x11-x14 of the r6 block
    — 4 of 54 entries with zero hostile coverage while the docstring
    claimed the whole block), so the boundary round is included
    WHOLE and the sweep may run slightly more than n entries."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    first: dict[str, int] = {}
    # sort NUMERICALLY by round (round_of is the one shared parser —
    # tools/gen_priority.py owns it): setdefault's first-wins
    # semantics depend on ascending round order, and a lexicographic
    # sort would silently mis-assign vintages the moment a round
    # number stops zero-padding to the same width (r13 vs r2)
    from tools.gen_priority import round_of
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
                   key=round_of)
    for f in files:
        r = round_of(f)
        for k in json.load(open(f)):
            first.setdefault(k, r)
    ranked = sorted(first, key=lambda k: (-first[k], k))
    if len(ranked) > n:
        cutoff_round = first[ranked[n - 1]]
        ranked = [k for k in ranked if first[k] >= cutoff_round]
    return ranked


# (mode, entry) -> (match, reason). A pinned pair still RUNS; its
# failure is accepted ONLY when one of the `match` alternatives (a
# string or tuple of strings — distinctive fragments of the OBSERVED
# exception texts, never a generic prefix like 'duckdb error') appears
# in the failure message — a pinned entry failing in a NEW way (e.g. a
# genuine value mismatch on an entry pinned for a cast error) still
# fails the sweep. A pair that stops diverging fails as STALE-PIN, and
# a pin whose (mode, entry) is outside MODES x swept-entries fails as
# UNSWEPT-PIN (typo in either half, or the sliding newest-window
# evicted it — either way the promise "this divergence is still being
# checked" would be silently broken).
#
# The two hostile findings that were BUGS, not semantics, were fixed
# instead of pinned: ext_dedup_minhash crashed when the corpus held
# any sub-n-token document (approxSimilarityJoin's self-join rewrite
# evaluated the LSH hash UDF on pre-filter rows — plan barrier added
# in operators/dedup.py), and f33_winsorize let NaN/Inf inside the
# percentile input move the clamp bounds differently per engine
# (bounds now computed over finite values only, identical output on
# all-finite data).
EXPECTED: dict[tuple[str, str],
               tuple[str | tuple[str, ...], str]] = {
    ("empty", "ext_quality_train_eval"): (
        "Nothing has been added",
        "trainer fails loudly on an empty training corpus (pyspark.ml "
        "LBFGS summarizer requires >= 1 row) — a scheduled training "
        "job on an empty slice SHOULD error, not silently emit an "
        "unusable model"),
    ("empty", "ext_ann_ivf_pq_topk"): (
        "Nothing has been added",
        "KMeans coarse-quantizer fit on a zero-vector corpus raises "
        "(the ml Summarizer sees no rows) — an index BUILD on "
        "degenerate input fails loudly (FAISS errors on train size "
        "< k the same way)"),
    ("onerow", "ext_ann_ivf_pq_topk"): (
        "ArrayIndexOutOfBoundsException",
        "KMeans k=16 fit on a 1-vector corpus raises (the k|| init "
        "sampler indexes past the single point) — same fail-loud "
        "index-build posture as the empty mode"),
    ("hostile", "s19_orc_roundtrip"): (
        "CAST_OVERFLOW",
        "integer-cents money encoding is finite-domain by contract: "
        "Spark ANSI raises CAST_OVERFLOW casting Inf to BIGINT — "
        "fail-loud on corrupt money beats try_cast's silent NULL"),
    ("hostile", "ts5_vwap_components"): (
        "CAST_OVERFLOW",
        "same finite-domain cents contract: Spark ANSI CAST_OVERFLOW "
        "on Inf*price cents — fail-loud on corrupt money"),
    ("hostile", "a36_weighted_median"): (
        "CAST_OVERFLOW",
        "same finite-domain cents contract on the integer-scaled "
        "weighted-quantile encoding — Spark ANSI CAST_OVERFLOW on Inf"),
    # --all empty-sweep pins (full-registry scope, r12): the same two
    # fail-loud classes, on older-vintage entries
    ("empty", "ext_ann_ivf_topk"): (
        "Nothing has been added",
        "KMeans IVF quantizer fit on a zero-vector corpus raises — "
        "fail-loud index build (same class as ext_ann_ivf_pq_topk)"),
    ("empty", "ext_semantic_dedup"): (
        "Nothing has been added",
        "SemDeDup's KMeans clustering fit on a zero-vector corpus "
        "raises — fail-loud index build"),
    ("empty", "ext_ann_pq_topk"): (
        "need at least that many sample vectors",
        "the PQ codebook fit raises its own descriptive error on a "
        "corpus smaller than n_codes — deliberate fail-loud guard in "
        "operators/similarity.py"),
    ("empty", "a16_rollup"): (
        "rowcount spark=0 duckdb=1",
        "Spark grouping sets omit the grand-total row on EMPTY input "
        "where the SQL standard (and DuckDB/Postgres) emit one zero-"
        "count row for the () set — engine-level semantic difference, "
        "not expressible away without changing non-empty semantics"),
    ("empty", "a17_cube"): (
        "rowcount spark=0 duckdb=1",
        "same Spark grouping-sets-on-empty semantic as a16"),
    ("empty", "a21_grouping_sets"): (
        "rowcount spark=0 duckdb=1",
        "same Spark grouping-sets-on-empty semantic as a16"),
    ("empty", "a29_grouping_id"): (
        "rowcount spark=0 duckdb=1",
        "same Spark grouping-sets-on-empty semantic as a16"),
    ("empty", "s11_compaction_roundtrip"): (
        "compaction did not reduce files",
        "the probe's own contract: compaction must REDUCE the file "
        "count, and an empty table writes a single file — probe "
        "precondition (needs a multi-file table), fails loudly"),
    ("empty", "s10_partition_prune_roundtrip"): (
        "UNABLE_TO_INFER_SCHEMA",
        "the probe writes a PARTITIONED copy of its base and re-reads "
        "it; an all-empty base writes zero parquet files so the "
        "re-read cannot infer a schema — the prune ratio the probe "
        "asserts is undefined on an empty table (probe precondition)"),
    ("empty", "j22_dynamic_partition_prune"): (
        "UNABLE_TO_INFER_SCHEMA",
        "same empty-partitioned-write precondition as s10 — DPP over "
        "zero partitions has nothing to prune or assert"),
    ("empty", "s17_key_erasure_roundtrip"): (
        "UNABLE_TO_INFER_SCHEMA",
        "same empty-partitioned-write precondition — the probe "
        "VERIFIES erasure happened, which is vacuous with no "
        "partitions; fails loudly rather than report vacuous success"),
    ("hostile", "ts6_twap_components"): (
        # whichever non-finite row the scan hits first decides the
        # message — both observed DuckDB conversion errors are listed
        ("Could not cast value", "can't be cast"),
        "DuckDB refuses to cast non-finite doubles to DECIMAL/INT128 "
        "(conversion error) — the oracle side of the finite-domain "
        "money contract fails loudly where Spark's decimal cast "
        "nulls; divergent error surfacing, same contract"),
    # r13 onerow --all pins: the same fail-loud classes on
    # older-vintage entries the default newest-block sweep never
    # reached
    ("onerow", "s17_key_erasure_roundtrip"): (
        "UNABLE_TO_INFER_SCHEMA",
        "the probe erases the partition of its target key; with ONE "
        "row that is the only partition, so the verify re-read finds "
        "zero parquet files — same probe precondition as its empty "
        "pin (erasure verification is vacuous without partitions)"),
    ("onerow", "ext_ann_ivf_topk"): (
        "ArrayIndexOutOfBoundsException",
        "KMeans IVF quantizer fit on a 1-vector corpus raises (the "
        "k|| init sampler indexes past the single point) — fail-loud "
        "index build, same class as ext_ann_ivf_pq_topk"),
    ("onerow", "ext_semantic_dedup"): (
        "ArrayIndexOutOfBoundsException",
        "SemDeDup's KMeans clustering fit on a 1-vector corpus "
        "raises — fail-loud index build, same class as the IVF pins"),
    ("onerow", "ext_ann_pq_topk"): (
        "need at least that many sample vectors",
        "the PQ codebook fit raises its own descriptive error on a "
        "corpus smaller than n_codes (here 1 < 16) — the deliberate "
        "fail-loud guard in operators/similarity.py, same as its "
        "empty pin"),
}

# r13 hostile --all (the first non-finite sweep over the FULL
# registry): every entry whose oracle uses the exact-decimal-sum /
# integer-scaled encoding meets the injected NaN/±Inf in ONE shared
# engine-level semantic, measured precisely this round: Spark (ANSI
# on) casts non-finite DOUBLE -> DECIMAL to NULL — the rows silently
# leave the exact sums, which is the engine's product behavior for
# corrupt floats (the x-family monitoring entries exist to surface
# their rate) — while DuckDB raises a conversion error on the same
# cast ("Could not cast value inf to DECIMAL(18,6)" / "Type DOUBLE
# with value nan can't be cast ... INT64"). The oracle side of the
# exactness recipe is finite-domain by construction; the divergence
# is error SURFACING, not values. Pinned per entry (not blanket) so
# STALE-PIN still fires the moment any of them stops diverging.
# Entries whose divergence was a silent VALUE mismatch were fixed
# with finite guards instead (the a22/a24/a32/ext_grouped_median/
# x2_outlier_mad quantile family and f31's latent regex-group crash).
ORACLE_NONFINITE_CAST = frozenset({
    "a14_profile", "a16_rollup", "a17_cube", "a18_pivot",
    "a1_pricing_summary", "a21_grouping_sets", "a27_stats_moments",
    "a2_region_segment_view", "a34_corr_components",
    "a35_equidepth_histogram", "a3_count_distinct",
    "a6_money_clean_agg", "a7_weekly_rollup", "ext_target_encoding",
    "f29_width_bucket", "j19_star_join_rollup", "j7_agg_join",
    "s17_key_erasure_roundtrip", "sq_scalar_threshold",
    "sql_surface_view_query", "stream_session", "stream_sliding",
    "stream_stateful_totals", "stream_static_enrich",
    "stream_tumbling", "tpch_q10_returned_items",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer", "tpch_q1_pricing_summary",
    "tpch_q22_global_sales_opportunity", "tpch_q3_shipping_priority",
    "tpch_q8_market_share", "ts2_resample_ohlc", "w4_running_frames",
    "w5_rank_ladder", "w7_dist_ladder", "w9_time_range_frame",
    "x5_incremental_agg",
})
_NONFINITE_REASON = (
    "oracle-side finite-domain exact-decimal/int encoding: DuckDB "
    "raises casting injected NaN/Inf where Spark's ANSI decimal cast "
    "nulls them out of the sum — divergent error surfacing of one "
    "semantic (see ORACLE_NONFINITE_CAST block comment)")
for _n in sorted(ORACLE_NONFINITE_CAST):
    EXPECTED[("hostile", _n)] = (
        ("Could not cast value", "can't be cast"), _NONFINITE_REASON)


ALL_MODES = ("empty", "onerow", "hostile")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--all"]
    sweep_all = "--all" in sys.argv[1:]
    base = args[0] if args else "/root/testdata/sf0.001"
    modes = args[1:] or ["empty", "onerow", "hostile"]

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(repo, ".tmp_probe", "hostile")
    if sweep_all:
        names = list(REGISTRY)
    else:
        ranked = newest_entries(50)
        gone = [n for n in ranked if n not in REGISTRY]
        if gone:
            # adjudicated names no longer in the registry (renamed or
            # removed entries) would otherwise silently lose hostile
            # coverage — surface them instead of quietly narrowing
            print(f"WARNING: {len(gone)} adjudicated names not in "
                  f"REGISTRY, excluded from sweep: {gone}")
        names = [n for n in ranked if n in REGISTRY]

    spark = get_spark("hostile-parity", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")

    bad: list[tuple[str, str]] = []
    stale: list[tuple[str, str]] = []
    for mode in modes:
        mdir = os.path.join(scratch, f"{mode}_{os.path.basename(base)}")
        shutil.rmtree(mdir, ignore_errors=True)
        build_mode_dir(base, mode, mdir)
        con = duckdb.connect()
        for tbl in TABLES:
            con.execute(f"CREATE VIEW {tbl} AS SELECT * "
                        f"FROM '{mdir}/{tbl}.parquet'")
        for name in names:
            status, msg = check_entry(REGISTRY[name], spark, con, mdir)
            pin = EXPECTED.get((mode, name))
            alts = ((pin[0],) if isinstance(pin[0], str)
                    else pin[0]) if pin else ()
            if status == "fail" and any(a in msg for a in alts):
                print(f"pinned {mode:7s} {name}: {pin[1]}")
            elif status == "fail":
                why = (" (pinned for a DIFFERENT failure: none of "
                       f"{alts} in message)" if pin else "")
                print(f"FAIL   {mode:7s} {name}: {msg}{why}")
                bad.append((mode, name))
            elif pin:
                print(f"STALE-PIN {mode:7s} {name}: now {status} — "
                      f"remove its EXPECTED entry")
                stale.append((mode, name))
            else:
                print(f"{status:6s} {mode:7s} {name}: {msg}")
        con.close()
    # every pin must be exercisable — a typo'd MODE (validated
    # against the static MODE set, not this run's argv subset) or a
    # typo'd/removed NAME (validated against the REGISTRY, not this
    # run's scope: full-registry pins from the --all empty sweep are
    # legitimate even when a default newest-block run doesn't reach
    # them — stale-pin enforcement then only fires on the runs that
    # do, i.e. the per-round --all empty sweep) silently disables
    # both the pin and its stale-pin enforcement otherwise
    unswept = [(m, n) for (m, n) in EXPECTED
               if m not in ALL_MODES or n not in REGISTRY]
    for m, n in unswept:
        print(f"UNSWEPT-PIN {m:7s} {n}: unknown mode or not a "
              f"registry entry — fix the key or re-scope the pin")
    n_runs = len(modes) * len(names)
    print(f"\n{n_runs - len(bad) - len(stale)}/{n_runs} clean "
          f"({len(EXPECTED)} pinned)", flush=True)
    spark.stop()
    sys.exit(1 if (bad or stale or unswept) else 0)


if __name__ == "__main__":
    main()
