"""Declarative data-quality expectations.

The reference's validation is a single hand-rolled boolean fixer
(modules/data_validator.py in /root/reference, U5 in SURVEY §2.10) plus
ad-hoc count reconciliations after each load (A11). This generalizes
both into the warehouse-standard expectation report (the dbt-test /
Great-Expectations shape) as ONE Spark job:

* row checks — any boolean Column that must hold per row — become
  ``SUM(CASE WHEN NOT cond)`` conditional aggregates, ALL evaluated in
  a single scan (one partial-agg pass, map-side combinable, no
  per-check job);
* uniqueness checks are ``COUNT(*) - COUNT(DISTINCT struct(cols))``
  (exact; the distinct pays the one shuffle it must);
* referential checks are broadcast/shuffled left-anti counts against
  the referenced key set.

The report is a tidy (check_name, n_violations) DataFrame — joinable,
sinkable, assertable; a CI gate is ``report.filter(n_violations > 0)``.
NULL-handling rule: a row check counts a violation when the predicate
is NOT true (false OR NULL) — a NULL comparison is a failed
expectation, not a pass, which is the conservative reading the
reference's TRY_CAST quarantine takes (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = True) -> DataFrame:
    """Per-column EDA profile as ONE Spark job — the engine's
    "profile this file" surface (the reference's menu option 1,
    modules/data_analyzer.py:102-150, which shape/dtype/missing-counts
    a pandas sample; here the full table is profiled distributed).

    Returns one row per column:
    (column, dtype, n_rows, n_nulls, null_bp, n_distinct,
    min_value, max_value) — ``null_bp`` is integer basis points
    (floor(10000*nulls/rows)): exact cross-engine arithmetic, no
    float-division rounding ties. min/max are cast to string so one
    schema serves every column type.

    All per-column stats ride a single partial-aggregate scan
    (map-side combinable, one job regardless of column count); the
    final unpivot reshapes ONE row driver-free. ``approx=True``
    (default) uses approx_count_distinct (HLL — the 100 TB path);
    ``approx=False`` pays the exact-distinct expand, which is what an
    external SQL oracle can reproduce."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    distinct = (F.approx_count_distinct if approx else F.countDistinct)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.struct(
            F.coalesce(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
                       F.lit(0))   # empty table: sum is NULL, pin to 0
             .cast("long").alias("n_nulls"),
            distinct(c).cast("long").alias("n_distinct"),
            F.min(F.col(c).cast("string")).alias("min_value"),
            F.max(F.col(c).cast("string")).alias("max_value"),
        ).alias(c))
    one = df.agg(*aggs)
    dtype_map = F.create_map(*[F.lit(x) for kv in dtypes.items()
                               for x in kv])
    return (one.unpivot(["__n"], cols, "column", "stats")
            .select(
                "column",
                F.element_at(dtype_map, F.col("column")).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col("stats.n_nulls").alias("n_nulls"),
                F.floor(10000 * F.col("stats.n_nulls")
                        / F.greatest(F.col("__n"), F.lit(1)))
                 .cast("long").alias("null_bp"),
                F.col("stats.n_distinct").alias("n_distinct"),
                F.col("stats.min_value").alias("min_value"),
                F.col("stats.max_value").alias("max_value")))


def profile_csv_file(spark, path: str, columns: list[str] | None = None,
                     approx: bool = True) -> DataFrame:
    """EDA entry point over a raw Inside-Airbnb ``csv.gz`` file:
    schema-on-read scan (inferSchema=false, all strings — the
    reference's own Spark EDA read, modules/data_analyzer.py:136-139)
    piped into :func:`profile_table`."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_csv_raw,
    )
    return profile_table(read_csv_raw(spark, path), columns, approx)


def _violations(cond: Column) -> Column:
    # NOT true == false or NULL: nulls are violations, not passes.
    # coalesce: SUM over ZERO rows is NULL, but the truthful report
    # for an empty slice is 0 violations — the oracle's COUNT(*)
    # FILTER form already says 0, and the r12 full-registry empty
    # sweep caught the Spark side answering NULL (identity on any
    # non-empty input: a 0/1 sum is never NULL there).
    return F.coalesce(F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))),
                      F.lit(0))


def expectation_report(df: DataFrame, row_checks: dict[str, Column],
                       unique: dict[str, list[str]] | None = None,
                       references: dict[str, tuple[DataFrame, str, str]]
                       | None = None) -> DataFrame:
    """Evaluate all expectations; return (check_name, n_violations).

    ``row_checks``: name -> predicate that must hold on every row.
    ``unique``: name -> column list that must be duplicate-free.
    ``references``: name -> (dim_df, fact_key, dim_key): every non-null
    ``fact_key`` value must exist among ``dim_key`` values.
    """
    spark = df.sparkSession
    parts: list[DataFrame] = []

    if row_checks:
        one_pass = df.agg(*[
            _violations(cond).cast("long").alias(name)
            for name, cond in row_checks.items()])
        parts.append(one_pass.unpivot(
            [], list(row_checks), "check_name", "n_violations"))

    for name, cols in (unique or {}).items():
        # COUNT(DISTINCT struct(cols)), not COUNT(DISTINCT cols...):
        # the multi-arg form skips rows where ANY column is NULL,
        # which would inflate n_violations on nullable keys — the
        # struct is never NULL, so NULL patterns count as values.
        parts.append(df.agg(
            (F.count(F.lit(1))
             - F.countDistinct(F.struct(*[F.col(c) for c in cols])))
            .cast("long").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations"))

    for name, (dim, fact_key, dim_key) in (references or {}).items():
        orphans = (df.select(F.col(fact_key).alias("_k"))
                   .filter(F.col("_k").isNotNull())
                   .join(dim.select(F.col(dim_key).alias("_k")),
                         "_k", "left_anti"))
        parts.append(orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations"))

    if not parts:  # no checks supplied: empty report, not IndexError
        return spark.createDataFrame(
            [], "check_name string, n_violations long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def drift_bin_counts(df: DataFrame, is_current: Column,
                     bins: list[Column] | Column) -> DataFrame:
    """Distribution-drift bin counts between a baseline and a current
    slice of one relation — the input to PSI / chi-square / L1 drift
    monitors every production data pipeline runs between snapshots
    (a shifted source mix is the #1 silent corpus regression).

    ``is_current`` labels each row (false = baseline, true = current);
    ``bins`` are the bucketing expressions (categorical columns,
    ``width_bucket`` ladders, equi-depth ids from a35's boundaries —
    anything deterministic). Returns one row per observed bin:
    (bin columns..., n_base, n_cur) with integer-exact counts.

    The divergence SCALAR is derived off the compared path on purpose:
    PSI's Σ (p-q)·ln(p/q) is quotient-of-counts arithmetic, exactly
    the cross-engine rounding trap the registry conventions ban
    (plans/registry.py header) — counts hash-compare bit-exactly,
    logs do not. :func:`psi_from_counts` computes it client-side from
    this report (the dsir log_weight convention).

    One scan, one shuffle on the bin key: both counts are conditional
    sums in a single map-side-combinable aggregate — never two jobs
    diffed driver-side. NULL-labeled rows (``is_current`` NULL) count
    toward neither slice.
    """
    bin_cols = bins if isinstance(bins, list) else [bins]
    named = [F.col(b) if isinstance(b, str) else b for b in bin_cols]
    labeled = df.select(is_current.cast("boolean").alias("__cur"), *named)
    keys = [c for c in labeled.columns if c != "__cur"]
    return (labeled
            .groupBy(*keys)
            .agg(F.sum(F.when(~F.col("__cur"), 1).otherwise(0))
                 .cast("bigint").alias("n_base"),
                 F.sum(F.when(F.col("__cur"), 1).otherwise(0))
                 .cast("bigint").alias("n_cur")))


def psi_from_counts(rows, eps: float = 1e-6) -> float:
    """Population Stability Index from a collected
    :func:`drift_bin_counts` report (client-side — see that
    docstring for why the scalar stays off the compared path):

        PSI = Σ_bins (p_cur - p_base) * ln(p_cur / p_base)

    ``rows`` is any iterable with ``n_base``/``n_cur`` attributes or
    keys. Empty-side bins are floored at ``eps`` (the standard
    regularization — PSI is undefined on zero mass). Rule of thumb:
    <0.1 stable, 0.1-0.25 drifting, >0.25 shifted.
    """
    import math

    def _get(r, k):
        try:
            return r[k]
        except (TypeError, KeyError):
            return getattr(r, k)

    counts = [(_get(r, "n_base"), _get(r, "n_cur")) for r in rows]
    tb = sum(b for b, _ in counts)
    tc = sum(c for _, c in counts)
    if tb == 0 or tc == 0:
        raise ValueError("one side of the drift report is empty")
    psi = 0.0
    for b, c in counts:
        p = max(b / tb, eps)
        q = max(c / tc, eps)
        psi += (q - p) * math.log(q / p)
    return psi
