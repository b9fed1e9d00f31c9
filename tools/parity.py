"""Local mirror of the driver's correctness gate: run every registry
query on Spark AND its oracle SQL on DuckDB over the same parquet
tables, compare row count + sorted values.

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


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, Decimal):
        return "n:" + format(float(v), ".9g")
    if isinstance(v, float):
        if math.isnan(v):
            return "n:nan"
        return "n:" + format(v, ".9g")
    if isinstance(v, int):
        return "n:" + format(float(v), ".9g")
    if isinstance(v, datetime):
        return "t:" + v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return "d:" + v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


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
        q = REGISTRY[name]
        try:
            sdf = q.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failed.append(name)
            continue
        sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
        if len(sk) != len(ok):
            print(f"FAIL  {name}: rowcount spark={len(sk)} duckdb={len(ok)}")
            failed.append(name)
        elif sk != ok:
            diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(sk)} rows")
    print(f"\n{len(names) - len(failed)}/{len(names)} match", flush=True)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
