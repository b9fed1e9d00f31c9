"""Physical-plan shape guards: broadcast dim joins, parquet filter
pushdown, and column pruning must survive refactors — at 100 TB these
ARE the performance model, so they're asserted, not just observed."""

from __future__ import annotations

from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
    REGISTRY,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(df) -> str:
    return df._jdf.queryExecution().toString()


def test_fact_dim_chain_broadcasts(spark, sf_dir):
    plan = _physical(REGISTRY["j1_fact_dim_join"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must not shuffle


def test_pricing_summary_pushes_date_filter(spark, sf_dir):
    df = REGISTRY["a1_pricing_summary"].build(spark, sf_dir)
    plan = _scan_lines(df)
    # to_date(ts) <= lit must be rewritten into a pushable ts predicate
    in_plan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert in_plan and "LessThan(l_shipdate" in in_plan[0]


def test_column_prune_reaches_scan(spark, sf_dir):
    df = REGISTRY["p1_column_prune"].build(spark, sf_dir)
    schema_lines = [ln for ln in _scan_lines(df).splitlines()
                    if "ReadSchema" in ln]
    assert schema_lines
    line = schema_lines[0]
    # exactly the three projected columns, nothing else
    assert "l_orderkey" in line and "l_quantity" in line
    assert "l_extendedprice" not in line and "l_shipdate" not in line


def test_weekly_rollup_single_exchange(spark, sf_dir):
    plan = _physical(REGISTRY["a7_weekly_rollup"].build(spark, sf_dir))
    # one shuffle (the rollup groupBy) and nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_anti_join_projects_keys_only(spark, sf_dir):
    plan = _physical(REGISTRY["j4_left_anti"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_cube_expands_in_single_exchange(spark, sf_dir):
    plan = _physical(REGISTRY["a17_cube"].build(spark, sf_dir))
    # all 4 grouping-set levels ride ONE shuffle over Expand — a
    # grouping-sets implementation that unions per-level aggregates
    # would scan and shuffle 4x
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pivot_with_value_list_has_no_distinct_scan(spark, sf_dir):
    df = REGISTRY["a18_pivot"].build(spark, sf_dir)
    plan = _physical(df)
    # explicit pivot values -> no separate distinct-collect job; the
    # pivot itself is the standard two-phase aggregate (pre-agg on
    # (status, flag), then pivotfirst on status) over ONE scan
    assert "pivotfirst" in plan
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    plan = _physical(REGISTRY["j13_asof_join"].build(spark, sf_dir))
    # the union+window rewrite: one shuffle on the key, a window pass,
    # and NO join operator at all (nothing the planner could ever turn
    # into a nested loop)
    assert plan.count("Exchange hashpartitioning") == 1
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan
    assert "Window" in plan


def test_range_join_is_shuffled_equi_join(spark, sf_dir):
    plan = _physical(REGISTRY["j14_range_join"].build(spark, sf_dir))
    # the bucketized rewrite must reach the planner as an EQUI-join
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_broadcasts_stats(spark, sf_dir):
    plan = _physical(REGISTRY["sq_scalar_threshold"].build(spark, sf_dir))
    # the 1-row (n, sum) aggregate must broadcast to the orders scan —
    # a SortMergeJoin here would shuffle the whole fact table to join
    # against one row
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exists_semi_pushes_filter_below_join(spark, sf_dir):
    df = REGISTRY["sq_exists_correlated"].build(spark, sf_dir)
    # the o_totalprice threshold must reach the orders parquet scan,
    # not run post-join (toString truncates long filter lists, so read
    # the formatted explain, which prints PushedFilters in full)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "GreaterThan(o_totalprice" in buf.getvalue()
    assert "LeftSemi" in _physical(df)


def test_value_windows_share_one_sort(spark, sf_dir):
    plan = _physical(REGISTRY["w6_value_windows"].build(spark, sf_dir))
    # both frames ride the same (o_custkey, o_orderdate, o_orderkey)
    # partitioning+sort: one exchange, one sort, one Window node
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 2  # global guard: no per-frame re-sort


def test_grouping_sets_single_expand_shuffle(spark, sf_dir):
    plan = _physical(REGISTRY["a21_grouping_sets"].build(spark, sf_dir))
    # irregular grouping sets still compile to ONE Expand over ONE
    # shuffle — never a union of per-set aggregates (3x scan at scale)
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_winnow_single_shuffle_by_doc(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    docs = read_table(spark, sf_dir, "documents")
    plan = _physical(winnow_fingerprints(docs, "doc_id", "text"))
    # gram explode + window-min + distinct: the window partitions by
    # doc_id, and AQE coalesces the distinct into the same
    # partitioning — at most 2 exchanges, no join, no extra scan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert plan.count("FileScan") == 1
    assert "Join" not in plan


def test_like_predicates_push_to_scan(spark, sf_dir):
    import contextlib
    import io

    df = REGISTRY["p11_like_predicates"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # contains/startswith LIKEs must reach the parquet scan as native
    # string filters, not evaluate post-scan only
    assert "StringContains(p_name,gold" in plan
    assert "StringStartsWith(p_type,SMALL" in plan


def test_min_max_by_partial_aggregates_map_side(spark, sf_dir):
    plan = _physical(REGISTRY["a25_min_max_by"].build(spark, sf_dir))
    # the selection aggregate must do a map-side partial (mergeable)
    # pass BEFORE the shuffle — the whole point of preferring
    # max_by/min_by over the ROW_NUMBER-rn=1 window idiom at scale —
    # and it needs exactly one exchange and no Window operator
    assert "partial_max_by" in plan and "partial_min_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_projection_ladders_have_no_exchange(spark, sf_dir):
    # f24 (higher-order lambdas) and f26 (NULL ladder) are pure
    # projections: single scan, zero shuffles, and the lambda/scalar
    # work stays inside whole-stage codegen or a single Project
    for name in ("f24_higher_order", "f26_null_ladder"):
        plan = _physical(REGISTRY[name].build(spark, sf_dir))
        assert "Exchange" not in plan, name
        assert plan.count("FileScan") == 1, name


def test_cross_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = _physical(REGISTRY["j15_cross_join"].build(spark, sf_dir))
    # tiny-by-construction sides: the cross product must ride a
    # broadcast, never a shuffle of the (already minuscule) inputs
    assert "BroadcastNestedLoopJoin" in plan
    assert "Cross" in plan


def test_ntile_single_shuffle_shared_sort(spark, sf_dir):
    plan = _physical(REGISTRY["w8_ntile"].build(spark, sf_dir))
    # one hash exchange on the partition key; the ntile rides the
    # same sort as any other window on (status, price, key)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_time_range_frame_single_shuffle_no_join(spark, sf_dir):
    plan = _physical(REGISTRY["w9_time_range_frame"].build(spark, sf_dir))
    # the whole point of the RANGE-frame formulation: trailing-window
    # aggregates as ONE shuffle on user_id + an ordered pass — never a
    # self-join (which would be quadratic in bucket size)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_stats_moments_partial_aggregate(spark, sf_dir):
    plan = _physical(REGISTRY["a27_stats_moments"].build(spark, sf_dir))
    # all five moments ride one partial-agg pass over one scan: the
    # mergeable formulation a 1000-executor variance needs
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_star_join_broadcasts_dims(spark, sf_dir):
    # j19: the 6-table star join must broadcast every dim side (part,
    # customer, nation, region) — at 100 TB the dims stay broadcast and
    # the lineitem-orders spine is the single unavoidable exchange (at
    # test SF orders fits under the broadcast threshold too, so the
    # count can be 5 and the join tree has ZERO shuffles).
    df = REGISTRY["j19_star_join_rollup"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partitioned_readback_prunes_partitions(spark, sf_dir):
    # the s10 probe's read-back must carry the IN filter as a PARTITION
    # filter (directory pruning before any IO), not a data filter —
    # the explain-visible form of "the partition column IS the index"
    import contextlib
    import io

    df = REGISTRY["s10_partition_prune_roundtrip"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    part_lines = [ln for ln in text.splitlines()
                  if "PartitionFilters" in ln]
    assert part_lines, text
    assert any("o_orderpriority" in ln and "IN" in ln.upper()
               for ln in part_lines), part_lines


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """j22: the dim-side filter must become a DynamicPruningExpression
    on the fact's partition column — runtime pruning, not a full scan
    plus post-join filter."""
    df = REGISTRY["j22_dynamic_partition_prune"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_sessionization_single_user_shuffle(spark, sf_dir):
    # the gap window and the session groupBy must share ONE user_id
    # exchange — a second shuffle here doubles the cost of the most
    # common event-analytics query at scale
    plan = _physical(REGISTRY["e5_sessionization"].build(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_resample_window_and_groupby_share_exchange(spark, sf_dir):
    # row_number + per-bucket count + the OHLC groupBy all partition
    # by bucket_id: one exchange total
    plan = _physical(REGISTRY["ts2_resample_ohlc"].build(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_attribution_single_shuffle_then_tiny_agg(spark, sf_dir):
    # one user_id exchange for the running-argmax window; the channel
    # groupBy is |types|-sized and may repartition that tiny set, but
    # the EVENT table must not shuffle twice: the window's exchange
    # comes first and the aggregate's input is the filtered carry
    plan = _physical(
        REGISTRY["e6_attribution_last_touch"].build(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "Join" not in plan


def test_hashed_linear_score_is_stateless_map(spark, sf_dir):
    # classifier scoring must stay a pure projection: no shuffle, no
    # UDF (BatchEvalPython/ArrowEvalPython), nothing but scan+project
    plan = _physical(
        REGISTRY["ext_hashed_linear_score"].build(spark, sf_dir))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_source_mixture_broadcasts_rates(spark, sf_dir):
    # the rates dim rides a broadcast; the corpus side never shuffles
    plan = _physical(REGISTRY["ext_source_mixture"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
