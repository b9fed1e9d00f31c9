"""Combined declared-query registry: relational core + extensions.

Importing this module populates ``REGISTRY`` with every query the
engine declares to the driver (``__spark_entry__.queries()``).

The registry is then REORDERED for the driver's correctness harness:
round 1 adjudicated exactly the first 50 entries (CORRECTNESS_r01.json)
and left the other 107 without a verdict. Entries that have never been
driver-checked come first — the two r01 hash-fails (now fixed), then
the dedicated SURVEY §2 twins, the LLM-data-pipeline ext ops,
streaming, and graph — and the 48 entries already green in r01 move to
the back. Every name stays present; only dict insertion order changes.
"""

from __future__ import annotations

# each import registers its queries into plans.registry.REGISTRY
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry  # noqa: F401
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    REGISTRY,
    Query,
)

import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_adv  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_ext  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_final  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_gaps  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_graph  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_more  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_surface  # noqa: F401
import sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_wide  # noqa: F401

# The 48 entries with a green CORRECTNESS_r01.json row (47 hash-green +
# a19 rows-only by design). a5/a7 hash-failed in r01 and are excluded.
_R01_GREEN = frozenset({
    "s1_scan_project", "s4_limited_scan", "p1_column_prune",
    "p4_trycast_filter", "p6_between", "p7_isin", "p9_eq_lookup",
    "p10_threshold", "p8_interval_overlap", "j1_fact_dim_join",
    "j2_derived_date_join", "j4_left_anti", "j6_left_semi",
    "j7_agg_join", "j8_merge_upsert", "j9_update_from_join",
    "a1_pricing_summary", "a3_count_distinct",
    "a4_global_count_distinct", "a6_money_clean_agg", "a9_having_dups",
    "a10_minmax", "a12_distinct_count", "a14_profile",
    "w1_latest_per_key", "w2_first_per_group", "o2_topk",
    "o3_keyed_sample", "set_union_distinct", "set_except",
    "set_intersect", "f5_parse_location", "f9_date_parts",
    "f10_date_dimension", "f13_bool_norm", "f3_truncate_substr",
    "f15_trycast_decimal", "w3_lag_lead", "w4_running_frames",
    "w5_rank_ladder", "a16_rollup", "a17_cube", "a18_pivot",
    "j13_asof_join", "j14_range_join", "stream_watermark_late_drop",
    "a19_approx_distinct", "f18_array_functions",
})

# Explicit front of the queue: fixed r01 hash-fails first (they need a
# fresh verdict), then the never-checked dedicated §2 twins, the LLM
# ext ops, streaming, graph — the entries VERDICT.md ranked highest.
# Within the ~50-entry window, hash-checked entries (full value
# verdict) outrank rows-only ones (weaker check): the rows-only block
# sits at the tail of the priority list so a tight cap still
# adjudicates every oracle-paired query.
_PRIORITY = [
    "a5_conditional_agg", "a7_weekly_rollup",
    # dedicated SURVEY §2 twins
    "p2_add_default_column", "p3_column_drop", "p5_null_empty_predicates",
    "j3_cast_key_join", "j5_not_in_anti", "j10_catalog_join",
    "j11_broadcast_semi", "a2_region_segment_view", "a8_per_key_count",
    "a11_count_scalars", "a13_merge_action_counts", "o6_full_sort",
    "o7_distinct_sorted_limit", "f6_filename_geography",
    "f7_date_conversion", "f12_case_conditional", "f14_numeric_coercion",
    "f16_metadata_math",
    # round-2 flagship additions with full oracles (real image decode,
    # EDA profile, composed data-prep pipeline, batched ANN, chunking,
    # PII, repetition)
    "ext_multimodal_image_meta", "x6_profile_table",
    "ext_data_prep_pipeline", "ext_ann_batch_topk",
    "ext_chunk_documents", "ext_pii_redact", "ext_repetition_filter",
    # LLM-data-pipeline ext ops (oracle-paired)
    "ext_token_count", "ext_text_quality", "ext_quality_score",
    "ext_lang_id", "ext_fingerprint",
    "ext_dedup_exact", "ext_dedup_ngram_jaccard", "ext_dedup_embedding",
    "ext_ann_brute_topk",
    "ext_bpe_token_count", "ext_decontaminate", "ext_train_split",
    "ext_dedup_winnow_pairs", "ext_grouped_median",
    # streaming (oracle-paired batch twins) + graph (CTE oracle)
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_interval_join", "stream_stateful_totals",
    "g1_connected_components", "g2_dedup_clusters",
    # ---- position 50 boundary: everything above fits a 50-entry
    # adjudication window; below are oracle entries whose semantics
    # are already pinned above or by pytest, then rows-only entries
    # twin surfaces (same oracle as ext_lang_id; plumbing superseded
    # by ext_multimodal_image_meta)
    "ext_lang_id_udf", "ext_multimodal_meta",
    # round-2 curation extras (checked by the local strict gate)
    "ext_source_stats", "ext_stratified_sample",
    "ext_vocab_topk", "ext_label_centroid", "ext_sequence_pack",
    "ext_chunk_pack_pipeline", "ext_dup_ngram_fraction",
    "ext_url_parse", "ext_filter_funnel", "ext_dedup_ppjoin",
    "ext_embedding_quantize", "ext_training_manifest",
    "ext_chunk_dedup", "ext_label_balance",
    "ext_multimodal_audio_meta", "ext_multimodal_video_meta",
    "ext_ann_lsh_topk",
    # fingerprint-variant twins (their pair/join semantics are already
    # covered above by ext_dedup_winnow_pairs / ext_fingerprint)
    "ext_rolling_hash_fingerprint", "ext_winnow_fingerprint",
    # rows-only entries last (engine-specific hashes / library paths)
    "ext_dedup_minhash", "ext_dedup_simhash",
    "ext_ann_ivf_topk", "ext_lang_detect_lib",
]


def _reorder() -> None:
    front = [n for n in _PRIORITY if n in REGISTRY]
    fset = set(front)
    mid = [n for n in REGISTRY
           if n not in fset and n not in _R01_GREEN]
    back = [n for n in REGISTRY if n in _R01_GREEN]
    order = front + mid + back
    assert len(order) == len(REGISTRY), (len(order), len(REGISTRY))
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in order})


_reorder()

__all__ = ["REGISTRY", "Query"]
