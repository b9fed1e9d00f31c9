"""Local mirror of the driver's correctness gate: run every registry
query on Spark AND its oracle SQL on DuckDB over the same parquet
tables, compare row count + sorted values.

Stricter than the driver spec claims: r01 showed the driver's value
hash is column-POSITION-sensitive (a7 failed on output order alone)
and dtype-sensitive (a5 failed on DuckDB HUGEINT vs Spark BIGINT), so
this mirror also enforces exact column order and audits the oracle's
Arrow dtypes against Spark's coarse type classes.

Usage: python tools/parity.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# The driver's value hash is EXACT — r5's a34 failed it while passing
# this mirror's old 9-significant-digit float canon. Default is now
# exact everywhere (17g doubles = round-trip repr, exact decimal
# strings, microsecond timestamps); PARITY_LOOSE=1 restores the old
# 9g/seconds canon for triaging whether a mismatch is last-ulp noise.
_LOOSE = bool(os.environ.get("PARITY_LOOSE"))
_FG = ".9g" if _LOOSE else ".17g"


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, Decimal):
        if _LOOSE:
            return "n:" + format(float(v), _FG)
        # exact, scale-independent (5.500000 == 5.5)
        return "n:" + format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "n:nan"
        return "n:" + format(v, _FG)
    if isinstance(v, int):
        # exact str(int) == exact decimal canon == 17g float canon for
        # any value all three can represent, so cross-type list
        # elements still compare equal
        return "n:" + format(float(v), _FG) if _LOOSE else "n:" + str(v)
    if isinstance(v, datetime):
        if _LOOSE:
            return "t:" + v.strftime("%Y-%m-%d %H:%M:%S")
        return "t:" + v.isoformat()
    if isinstance(v, date):
        return "d:" + v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def decimal_width_violations(cols, rows):
    """r6 canonicalizer-limit rule: a compared DECIMAL value must
    round-trip through float64 ``repr`` (``Decimal(repr(float(v))) ==
    v`` — the actual pandas-canon hazard; note this is looser than
    binary-exactness: Decimal('0.1') passes), because the driver's
    pandas canon may round-trip one engine's column through float
    while the other stays Decimal — equal values then hash
    differently (the r6 a34 red: DECIMAL(38,12) sums at ~1e10 carry
    ~23 significant digits vs float64's 15-17). Entries with wider
    values must ship the column as int64 (the r7 ts5 lesson — the
    only encoding with hundreds of green precedents) or an exact
    fixed-scale STRING on both engines.

    Sampling caveat: only the rows fetched at the parity scale factor
    are inspected — sums that fit float64 at sf0.01/sf0.1 can exceed
    it at larger sf, so re-run this guard at the adjudication scale
    factor when widening a workload. Returns [(col, sample_value)],
    one per offending column."""
    bad = {}
    for r in rows:
        for i, v in enumerate(r):
            if i in bad or not isinstance(v, Decimal):
                continue
            if v.is_finite() and Decimal(repr(float(v))) != v:
                bad[i] = (cols[i], str(v))
    return [bad[i] for i in sorted(bad)]


def decimal_typed_columns(cols, coarse_types):
    """r8 canonicalizer-limit rule (the final one for decimals): a
    compared column must not be DECIMAL-typed AT ALL, on either
    engine. ts5_vwap_components stayed driver-red across two
    encodings while its lo/hi DECIMAL(18,6) columns — the only
    decimal-typed compared columns in the whole registry — stayed
    constant: the driver's pandas canon is REPRESENTATION-sensitive
    for decimals (trailing-zero scale: Decimal('55208.410000') vs a
    float-round-tripped 55208.41), which canon()'s .normalize()
    above masks and decimal_width_violations cannot catch (it checks
    value round-trip, not representation). Safe encodings with green
    precedents: int64 scaled integers (cents), exact fixed-scale
    strings, round(CAST(... AS DOUBLE), 2), raw-double data values.
    Returns the offending column names."""
    return [c for c, t in zip(cols, coarse_types)
            if t.startswith("decimal")]


def coarse_spark_type(dt: str) -> str:
    """Map a Spark simpleString dtype to a coarse comparison class."""
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        scale = dt.rstrip(")").split(",")[-1] if "," in dt else "0"
        return f"decimal(s={scale.strip()})"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith(("array", "map", "struct")):
        return "nested"
    return dt  # string, date, boolean, binary


def coarse_arrow_type(t) -> str:
    """Map a pyarrow DataType (DuckDB result) to the same classes.
    Note DuckDB exports HUGEINT to Arrow as decimal128(38,0), so an
    uncast integer sum lands in the decimal class — it still fails
    against a Spark BIGINT (int != decimal, the r01 a5 case), and the
    scale check below distinguishes it from a real decimal(p,s>0)."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        # keep the scale: HUGEINT-as-decimal128(38,0) must not pass
        # against a Spark decimal(p,2) column (precision is looser
        # cross-engine — DuckDB widens sums to 38 — so only scale
        # participates in the class)
        return f"decimal(s={t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return "nested"
    return str(t)  # includes hugeint -> "int128" etc.


def check_entry(q, spark, con, sf_dir):
    """Run one registry entry on Spark and its oracle on DuckDB and
    compare with the driver-mirror rules above. Returns (status, msg)
    where status ∈ {'ok', 'rows', 'fail'} — 'rows' is the weaker
    no-oracle check. Factored out of main() so the hostile-data sweep
    (tools/hostile_parity.py) applies the IDENTICAL comparison to its
    degenerate-input table variants."""
    try:
        sdf = q.build(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        return "fail", f"spark error: {e}"
    if q.oracle is None:
        return "rows", f"{len(srows)} rows (no oracle)"
    try:
        otbl = con.execute(q.oracle).arrow()
        ocols = otbl.column_names
        orows = list(zip(*(otbl.column(i).to_pylist()
                           for i in range(otbl.num_columns)))) \
            if otbl.num_columns else []
    except Exception as e:
        return "fail", f"duckdb error: {e}"
    if scols != ocols:
        return "fail", f"column order {scols} != {ocols}"
    stypes = [coarse_spark_type(dt) for _, dt in sdf.dtypes]
    otypes = [coarse_arrow_type(otbl.schema.field(i).type)
              for i in range(otbl.num_columns)]
    if stypes != otypes:
        bad = [(c, s, o) for c, s, o in zip(scols, stypes, otypes)
               if s != o]
        return "fail", f"dtype class mismatch {bad}"
    dec = (decimal_typed_columns(scols, stypes)
           or decimal_typed_columns(ocols, otypes))
    if dec:
        return "fail", (f"DECIMAL-typed compared column(s) "
                        f"{dec} — driver canon is representation-"
                        f"sensitive; re-encode as int64 scaled ints, "
                        f"strings, or round(double,2)")
    wide = (decimal_width_violations(scols, srows)
            or decimal_width_violations(ocols, orows))
    if wide:
        return "fail", (f"decimal exceeds float64-exact width "
                        f"(driver canon hazard) — stringify: {wide}")
    sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
    if len(sk) != len(ok):
        return "fail", f"rowcount spark={len(sk)} duckdb={len(ok)}"
    if sk != ok:
        diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
        return "fail", f"value mismatch, first diffs: {diffs}"
    return "ok", f"{len(sk)} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark

    spark = get_spark("parity", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * "
                    f"FROM '{sf_dir}/{tbl}.parquet'")

    names = [n for n in REGISTRY
             if not filters or any(f in n for f in filters)]
    failed = []
    for name in names:
        status, msg = check_entry(REGISTRY[name], spark, con, sf_dir)
        if status == "fail":
            print(f"FAIL  {name}: {msg}")
            failed.append(name)
        elif status == "rows":
            print(f"rows  {name}: {msg}")
        else:
            print(f"ok    {name}: {msg}")
    print(f"\n{len(names) - len(failed)}/{len(names)} match", flush=True)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
