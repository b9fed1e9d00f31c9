"""Round-9 additions and repairs:

- ts5_vwap_components re-encode: lo/hi now integer cents BIGINT — the
  r8 driver red isolated its DECIMAL(18,6) outputs (the registry's
  only decimal-typed compared columns) as the canon hazard.
- tools/parity.py hard-fails ANY decimal-typed compared column on
  either engine (representation-sensitivity: trailing-zero scale
  survives canon().normalize() locally but not the driver's pandas
  canon).
- ext_fuzzy_blocked_join block key gains a length band; max block
  size is audited here so the Σblock² candidate cost stays bounded.
- e9_peak_concurrency sweep distributes on (day, hour) with carried
  prefix offsets instead of a single per-day sort partition.
"""

from __future__ import annotations

import importlib.util
import os
from decimal import Decimal

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity():
    spec = importlib.util.spec_from_file_location(
        "parity", os.path.join(_REPO, "tools", "parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------ parity decimal ban


def test_parity_rejects_decimal_typed_columns():
    """The r8 lesson encoded as a hard gate: a compared column whose
    Spark dtype or oracle Arrow dtype is decimal-typed must FAIL
    parity outright, regardless of value width — the driver canon is
    representation-sensitive (Decimal('55208.410000') vs 55208.41),
    which value-level checks cannot see."""
    import pyarrow as pa

    parity = _load_parity()
    stypes = [parity.coarse_spark_type(dt)
              for dt in ("bigint", "decimal(18,6)", "string")]
    bad = parity.decimal_typed_columns(["a", "lo_price", "c"], stypes)
    assert bad == ["lo_price"]

    otypes = [parity.coarse_arrow_type(t)
              for t in (pa.int64(), pa.decimal128(38, 0), pa.string())]
    bad_o = parity.decimal_typed_columns(["a", "hugeint_sum", "c"], otypes)
    assert bad_o == ["hugeint_sum"]

    ok = parity.decimal_typed_columns(
        ["a", "b"], [parity.coarse_spark_type("double"),
                     parity.coarse_spark_type("bigint")])
    assert ok == []


def test_ts5_has_no_decimal_outputs(spark, sf_dir):
    """The repaired entry ships every compared column as int64/date;
    lo/hi are integer cents (min/max of the exact per-row cents)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    df = REGISTRY["ts5_vwap_components"].build(spark, sf_dir)
    assert df.columns == ["month", "n_trades", "lo_cents", "hi_cents",
                          "sum_qty", "sum_pq_cents"]
    for col, dt in df.dtypes:
        assert not dt.startswith("decimal"), (col, dt)
    row = df.orderBy("month").first()
    assert row.lo_cents <= row.hi_cents
    # cents are plausible prices: strictly positive, exact integers
    assert row.lo_cents > 0


def test_registry_has_no_decimal_typed_outputs(spark, sf_dir):
    """Registry-wide pin of the r9 rule: no entry may expose a
    decimal-typed output column. Schema-only (no execution), so the
    sweep stays cheap."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    offenders = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue  # rows-only entries are not hash-compared
        try:
            df = q.build(spark, sf_dir)
        except Exception:
            continue  # build errors are parity's job, not this pin's
        for col, dt in df.dtypes:
            if dt.startswith("decimal"):
                offenders.append((name, col, dt))
    assert not offenders, offenders
