"""Differential fuzzing: generate random single-block queries
(filter → group → agg → sort) over the testdata tables, run them on
Spark AND DuckDB, and compare row-for-row. Complements the fixed
registry (tools/parity.py) with randomized coverage of predicate,
grouping, and aggregate combinations.

Usage: python tools/fuzz_parity.py [sf_dir] [n_cases] [seed]

Determinism: the generator is seeded; every emitted query has a total
sort order; double aggregates round to 6 digits; counts cast to BIGINT.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.parity import rows_key  # reuse the canonicalizer

TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "key": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "cat": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "num": ["o_totalprice"],
        "key": ["o_orderkey", "o_custkey"],
        "cat": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "num": ["c_acctbal"],
        "key": ["c_custkey", "c_nationkey"],
        "cat": ["c_mktsegment"],
    },
    "events": {
        "num": ["value"],
        "key": ["event_id", "user_id"],
        "cat": ["event_type"],
    },
}

AGGS = [
    ("count(*)", "CAST(COUNT(*) AS BIGINT) AS agg_n"),
    ("sum", "ROUND(SUM({c}), 4) AS agg_sum"),
    ("avg", "ROUND(AVG({c}), 6) AS agg_avg"),
    ("min", "ROUND(MIN({c}), 6) AS agg_min"),
    ("max", "ROUND(MAX({c}), 6) AS agg_max"),
    ("count_distinct", "CAST(COUNT(DISTINCT {c}) AS BIGINT) AS agg_cd"),
]


def gen_query(rng: random.Random) -> str:
    tbl = rng.choice(list(TABLES))
    cols = TABLES[tbl]
    preds = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.random()
        if kind < 0.4:
            c = rng.choice(cols["num"] + cols["key"])
            op = rng.choice(["<", "<=", ">", ">=", "<>", "="])
            if c in cols["key"]:
                preds.append(f"{c} {op} {rng.randint(0, 2000)}")
            else:
                preds.append(f"{c} {op} {rng.uniform(0, 1000):.2f}")
        elif kind < 0.7:
            c = rng.choice(cols["key"])
            lo = rng.randint(0, 1000)
            preds.append(f"{c} BETWEEN {lo} AND {lo + rng.randint(1, 5000)}")
        else:
            c = rng.choice(cols["key"])
            preds.append(f"{c} % {rng.randint(2, 13)} = {rng.randint(0, 1)}")
    where = (" WHERE " + rng.choice([" AND ", " OR "]).join(preds)
             if preds else "")

    group_cols = rng.sample(cols["cat"], rng.randint(0, len(cols["cat"])))
    n_aggs = rng.randint(1, 3)
    agg_exprs = []
    seen = set()
    for _ in range(n_aggs):
        name, tmpl = rng.choice(AGGS)
        c = rng.choice(cols["num"])
        sql = tmpl.format(c=c)
        alias = sql.rsplit(" AS ", 1)[1]
        if alias in seen:
            continue
        seen.add(alias)
        agg_exprs.append(sql)

    select = ", ".join(group_cols + agg_exprs)
    group = f" GROUP BY {', '.join(group_cols)}" if group_cols else ""
    order = f" ORDER BY {', '.join(group_cols)}" if group_cols else ""
    limit = rng.choice(["", "", f" LIMIT {rng.randint(1, 50)}"]) \
        if group_cols else ""
    return f"SELECT {select} FROM {tbl}{where}{group}{order}{limit}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = random.Random(seed)

    from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark

    spark = get_spark("fuzz", master="local[8]",
                      extra_conf={
                          "spark.sql.shuffle.partitions": "8",
                          # events.ts is TIMESTAMP(NANOS); read as long
                          # (the fuzzer only uses non-ts columns)
                          "spark.sql.legacy.parquet.nanosAsLong": "true",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        spark.read.parquet(path).createOrReplaceTempView(name)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for i in range(n_cases):
        sql = gen_query(rng)
        try:
            sdf = spark.sql(sql)
            s_cols = sdf.columns
            s_rows = sdf.collect()
            d = con.execute(sql)
            d_cols = [c[0] for c in d.description]
            d_rows = d.fetchall()
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append((i, sql, f"execution error: {e}"))
            continue
        # LIMIT without full determinism: compare counts only
        if " LIMIT " in sql:
            if len(s_rows) != len(d_rows):
                failures.append((i, sql,
                                 f"rowcount {len(s_rows)} vs {len(d_rows)}"))
            continue
        if rows_key(s_cols, s_rows) != rows_key(d_cols, d_rows):
            failures.append((i, sql, "value mismatch"))

    for i, sql, why in failures:
        print(f"FAIL #{i}: {why}\n  {sql}")
    print(f"{n_cases - len(failures)}/{n_cases} match (seed={seed})")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
