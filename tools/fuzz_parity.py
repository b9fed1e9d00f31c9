"""Differential fuzzing: generate random queries over the testdata
tables, run them on Spark AND DuckDB, and compare row-for-row.
Complements the fixed registry (tools/parity.py) with randomized
coverage the hand-written entries can't enumerate.

The grammar (r12 verdict item 2: join/window shapes are ≥ half the
corpus so the J/W registry families get the same adversarial
redundancy the A/P/O families have):

- two-table equi-joins: inner / LEFT OUTER / EXISTS (semi) /
  NOT EXISTS (anti) over orders⋈customer and lineitem⋈orders;
- 3-way star joins with grouped decimal-exact aggregates + HAVING;
- windowed blocks: row_number/rank ladders, decimal-exact running
  frames, lag/lead and first/last/nth_value selection, and
  rn-FILTERED top-k-per-group subqueries;
- ROLLUP / CUBE / GROUPING SETS with GROUPING flags;
- scalar and correlated-EXISTS subqueries;
- date-part group keys;
- single-block filter → group → agg → sort combinations.

Usage: python tools/fuzz_parity.py [sf_dir] [n_cases] [seed]

Determinism: the generator is seeded; every emitted query has a total
sort order (or is order-canonicalized); double aggregates either
round exact decimal sums or select raw parquet values; counts cast
to BIGINT.
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
    # AVG is a quotient of an order-dependent double sum: seed 777
    # case #152 rounded 6dp on opposite sides of a half-ulp across
    # engines. Same cure as the registry convention — emit the exact
    # decimal numerator + count and let the mean derive client-side.
    ("avg", "ROUND(CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE), 4)"
            " AS agg_avg_num, CAST(COUNT({c}) AS BIGINT) AS agg_avg_den"),
    ("min", "ROUND(MIN({c}), 6) AS agg_min"),
    ("max", "ROUND(MAX({c}), 6) AS agg_max"),
    ("count_distinct", "CAST(COUNT(DISTINCT {c}) AS BIGINT) AS agg_cd"),
]


def gen_join_query(rng: random.Random) -> str:
    """Random equi-join (inner/LEFT OUTER/semi/anti shapes)
    orders⋈customer or lineitem⋈orders with an optional predicate
    each side."""
    big, small, bk, sk = rng.choice([
        ("orders", "customer", "o_custkey", "c_custkey"),
        ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ])
    bcols = TABLES[big]
    pred = ""
    if rng.random() < 0.7:
        c = rng.choice(bcols["key"])
        pred = f" AND b.{c} % {rng.randint(2, 9)} = 0"
    kind = rng.random()
    if kind < 0.3:
        scol = rng.choice(TABLES[small]["cat"] + TABLES[small]["key"])
        return (f"SELECT b.{bk} AS k, s.{scol} AS v "
                f"FROM {big} b JOIN {small} s ON b.{bk} = s.{sk}"
                f" WHERE 1=1{pred}")
    if kind < 0.55:
        # LEFT OUTER with an extra ON-clause filter on the small side
        # so some probe rows genuinely miss (referential integrity
        # holds on this data, so a bare key-equality LEFT degenerates
        # to INNER) — exercises null-producing join semantics
        scol = rng.choice(TABLES[small]["cat"] + TABLES[small]["key"])
        sn = rng.choice(TABLES[small]["num"])
        thr = rng.randint(0, 4000)
        return (f"SELECT b.{bk} AS k, s.{scol} AS v "
                f"FROM {big} b LEFT JOIN {small} s ON b.{bk} = s.{sk} "
                f"AND s.{sn} > {thr} WHERE 1=1{pred}")
    exists = "EXISTS" if kind < 0.8 else "NOT EXISTS"
    thresh = f"s.{rng.choice(TABLES[small]['num'])} > {rng.randint(0, 500)}"
    return (f"SELECT b.{bk} AS k, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM {big} b WHERE {exists} (SELECT 1 FROM {small} s "
            f"WHERE s.{sk} = b.{bk} AND {thresh}){pred} "
            f"GROUP BY b.{bk}")


def gen_window_query(rng: random.Random) -> str:
    """Window shapes with a total-order tiebreak (deterministic):
    ranking, decimal-exact running frames, and lag/lead selection.
    Frame/lag queries ride orders (o_orderkey is unique; lineitem's
    (l_orderkey, l_linenumber) is NOT, which would make frame sums
    order-dependent)."""
    kind = rng.random()
    if kind < 0.25:
        return ("SELECT l_orderkey, l_linenumber, "
                "ROW_NUMBER() OVER (PARTITION BY l_returnflag "
                "ORDER BY l_orderkey, l_linenumber) AS rn "
                f"FROM lineitem WHERE l_orderkey % {rng.randint(3, 17)} = 0")
    if kind < 0.5:
        return ("SELECT o_orderkey, "
                "RANK() OVER (PARTITION BY o_orderpriority "
                "ORDER BY o_custkey, o_orderkey) AS rk "
                f"FROM orders WHERE o_custkey % {rng.randint(3, 17)} = 1")
    if kind < 0.75:
        # exact decimal frame sum: FP frame sums would be fine (the
        # order is total), but decimal keeps the tie-rounding rule out
        k = rng.randint(1, 5)
        part = rng.choice(["o_orderstatus", "o_orderpriority"])
        return ("SELECT o_orderkey, "
                "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) "
                f"OVER (PARTITION BY {part} ORDER BY o_orderkey "
                f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW) "
                "AS DOUBLE), 2) AS frame_sum "
                f"FROM orders WHERE o_orderkey % {rng.randint(2, 9)} = 0")
    # lag/lead as pure selection (no arithmetic -> raw doubles compare
    # exactly; both engines read the identical parquet values)
    fn = rng.choice(["LAG", "LEAD"])
    return (f"SELECT o_orderkey, {fn}(o_totalprice) "
            "OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS adj "
            f"FROM orders WHERE o_custkey % {rng.randint(2, 9)} = 1")


def gen_subquery_query(rng: random.Random) -> str:
    """Scalar and correlated-EXISTS subquery shapes. The scalar
    threshold is division-free (price*n > sum) so no mean-rounding
    can diverge; EXISTS/NOT EXISTS ride non-null keys."""
    if rng.random() < 0.5:
        m, r = rng.randint(2, 9), rng.randint(0, 8)
        return ("SELECT o_orderkey, o_totalprice FROM orders "
                f"WHERE o_orderkey % {m} = {r % m} AND "
                "o_totalprice * (SELECT COUNT(*) FROM orders) > "
                "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) "
                "AS DOUBLE) FROM orders)")
    neg = rng.choice(["EXISTS", "NOT EXISTS"])
    thr = rng.randint(50, 250) * 1000
    return ("SELECT c_custkey, c_nationkey FROM customer c "
            f"WHERE {neg} (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            f"AND o.o_totalprice > {thr})")


def gen_value_window_query(rng: random.Random) -> str:
    """first/last/nth_value selection with explicit frames over a
    total order (selection, no arithmetic -> raw doubles compare)."""
    fn = rng.choice(["FIRST_VALUE(o_totalprice)",
                     "LAST_VALUE(o_totalprice)",
                     f"NTH_VALUE(o_totalprice, {rng.randint(2, 4)})"])
    frame = rng.choice(
        ["ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
         "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"])
    return (f"SELECT o_orderkey, {fn} OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            f"{frame}) AS val "
            f"FROM orders WHERE o_custkey % {rng.randint(2, 9)} = 1")


def gen_topk_window_query(rng: random.Random) -> str:
    """rn-FILTERED window block: top-k per group via a ROW_NUMBER /
    RANK subquery with a total tiebreak order — the W10 registry
    shape, randomized. RANK can admit > k rows on ties only if the
    full ORDER BY ties, which the key tiebreak prevents."""
    k = rng.randint(1, 5)
    fn = rng.choice(["ROW_NUMBER()", "RANK()"])
    if rng.random() < 0.5:
        part, val, key, tbl = ("o_custkey", "o_totalprice",
                               "o_orderkey", "orders")
        pred = f"WHERE o_custkey % {rng.randint(2, 9)} = 1"
    else:
        part, val, key, tbl = ("l_suppkey", "l_extendedprice",
                               "l_orderkey, l_linenumber", "lineitem")
        pred = f"WHERE l_partkey % {rng.randint(3, 11)} = 0"
    direction = rng.choice(["ASC", "DESC"])
    return (f"SELECT {part} AS g, {key.split(',')[0].strip()} AS id, rn "
            f"FROM (SELECT {part}, {key}, {fn} OVER "
            f"(PARTITION BY {part} ORDER BY {val} {direction}, {key}) "
            f"AS rn FROM {tbl} {pred}) t WHERE rn <= {k}")


def gen_rollup_query(rng: random.Random) -> str:
    """ROLLUP/CUBE/GROUPING SETS with GROUPING flags disambiguating
    rolled-up NULLs."""
    op = rng.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
    tbl, a, b, num = rng.choice([
        ("lineitem", "l_returnflag", "l_linestatus", "l_quantity"),
        ("orders", "o_orderstatus", "o_orderpriority", "o_totalprice"),
    ])
    pred = f" WHERE {rng.choice(TABLES[tbl]['key'])} % {rng.randint(2, 7)} = 0"
    return (f"SELECT {a}, {b}, "
            f"CAST(GROUPING({a}) AS BIGINT) AS g_a, "
            f"CAST(GROUPING({b}) AS BIGINT) AS g_b, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            f"ROUND(CAST(SUM(CAST({num} AS DECIMAL(18,6))) AS DOUBLE), 2) "
            "AS s "
            f"FROM {tbl}{pred} GROUP BY "
            + (f"GROUPING SETS (({a}), ({b}), ())" if op == "GROUPING SETS"
               else f"{op}({a}, {b})"))


def gen_star_query(rng: random.Random) -> str:
    """3-way star join lineitem⋈orders⋈customer with a grouped
    decimal-exact aggregate and optional HAVING — the TPC-H shape the
    fixed registry covers with hand-written queries, randomized."""
    gcol = rng.choice(["c_mktsegment", "o_orderpriority", "o_orderstatus",
                       "c_nationkey"])
    num = rng.choice(["l_extendedprice", "l_quantity", "o_totalprice"])
    pred = ""
    if rng.random() < 0.6:
        pred = (f" WHERE l_orderkey % {rng.randint(2, 7)} = 0"
                + rng.choice(["", " AND l_returnflag = 'R'",
                              " AND l_linestatus = 'F'"]))
    having = ""
    if rng.random() < 0.5:
        having = f" HAVING COUNT(*) > {rng.randint(1, 2000)}"
    return (f"SELECT {gcol}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"ROUND(CAST(SUM(CAST({num} AS DECIMAL(18,6))) AS DOUBLE), 2) "
            "AS s "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey"
            f"{pred} GROUP BY {gcol}{having}")


def gen_date_query(rng: random.Random) -> str:
    """Date-part group keys over orders/lineitem: year/month/day
    derivations as GROUP BY columns with decimal-exact sums."""
    tbl, ts, num = rng.choice([
        ("orders", "o_orderdate", "o_totalprice"),
        ("lineitem", "l_shipdate", "l_extendedprice"),
    ])
    parts = rng.sample(["year", "month"], rng.randint(1, 2))
    keys = ", ".join(f"CAST({p}({ts}) AS BIGINT) AS k_{p}" for p in parts)
    gb = ", ".join(f"{p}({ts})" for p in parts)
    pred = ""
    if rng.random() < 0.5:
        y = rng.randint(1995, 2001)
        pred = f" WHERE {ts} >= TIMESTAMP '{y}-01-01'"
    return (f"SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"ROUND(CAST(SUM(CAST({num} AS DECIMAL(18,6))) AS DOUBLE), 2)"
            f" AS s FROM {tbl}{pred} GROUP BY {gb}")


def gen_query(rng: random.Random) -> str:
    # weights keep join + window shapes at ≥ half the corpus
    # (star 7 + join 18 + window 12 + value-window 6 + rn-filtered 8
    # = 51%, before counting the correlated-EXISTS subqueries)
    shape = rng.random()
    if shape < 0.05:
        return gen_date_query(rng)
    if shape < 0.12:
        return gen_star_query(rng)
    if shape < 0.30:
        return gen_join_query(rng)
    if shape < 0.42:
        return gen_window_query(rng)
    if shape < 0.48:
        return gen_value_window_query(rng)
    if shape < 0.56:
        return gen_topk_window_query(rng)
    if shape < 0.62:
        return gen_rollup_query(rng)
    if shape < 0.68:
        return gen_subquery_query(rng)
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
