"""Differential fuzz of the engine-portable primitives.

The oracle pairings for whole operator families rest on two
primitives translating exactly between Spark and DuckDB:

- ``rolling_hash`` (functions/text.py) == the ``list_reduce`` BIGINT
  fold in the oracle SQL — minhash banding, hashed-linear scoring,
  DSIR bucketing, fingerprints all ride it;
- ``exact_floordiv_sql`` (functions/numeric.py) — event-time buckets,
  spatial grid cells, nano→micro normalization.

The fixed fixtures cover the known alphabets; this module hammers the
same pairs with seeded random inputs, including unicode planes the
driver corpus never exercises (CJK, astral/emoji, combining marks,
control chars) and the int64 extremes. A divergence here would be a
silent oracle mismatch waiting for a nastier corpus.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.numeric import (
    exact_floordiv_sql,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    rolling_hash,
)

_DUCK_FOLD = """list_reduce(
    list_transform(range(1, length(s) + 1),
      i -> CAST(ascii(substr(s, CAST(i AS INTEGER), 1)) AS BIGINT)),
    (a, b) -> (a * 31 + b) % 1000000007)"""


def _random_strings(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    pools = [
        lambda: chr(rng.randint(0x20, 0x7E)),          # ascii
        lambda: chr(rng.randint(0x00A0, 0x024F)),      # latin ext
        lambda: chr(rng.randint(0x4E00, 0x9FFF)),      # CJK
        lambda: chr(rng.randint(0x1F300, 0x1F64F)),    # emoji (astral)
        lambda: chr(rng.randint(0x0300, 0x036F)),      # combining
        lambda: chr(rng.randint(0x0400, 0x04FF)),      # cyrillic
    ]
    out = []
    for _ in range(n):
        k = rng.randint(1, 24)
        out.append("".join(rng.choice(pools)() for _ in range(k)))
    out += ["", "a", "é", "\U0001F600", "áb"]
    return out


def test_rolling_hash_matches_duckdb_on_random_unicode(spark):
    strings = _random_strings(seed=20260814, n=400)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)],
                               ["i", "s"])
    got = {r["i"]: r["h"] for r in
           df.select("i", rolling_hash(F.col("s"), prefix_len=None)
                     .alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i in range(len(strings)))
                + ") v(i, s)", strings)
    want = {i: h for i, h in con.execute(
        f"SELECT i, CASE WHEN length(s) = 0 THEN 0 ELSE {_DUCK_FOLD} "
        f"END FROM t").fetchall()}
    diverged = {i: (strings[i], got[i], want[i])
                for i in want if got[i] != want[i]}
    assert not diverged, dict(list(diverged.items())[:5])


def test_exact_floordiv_matches_duckdb_on_int64_extremes(spark):
    rng = random.Random(20260815)
    divisors = [1, 2, 3, 7, 1000, 900_000_000, 2**31]
    xs = ([rng.randint(-2**62, 2**62) for _ in range(200)]
          + [0, -1, 1, 2**62, -2**62, 999, -999, -1000, 1000])
    rows = [(i, x, n) for i, x in enumerate(xs)
            for n in (rng.choice(divisors),)]
    df = spark.createDataFrame(rows, "i long, x long, n long")
    got = {}
    for n in set(r[2] for r in rows):
        part = df.filter(F.col("n") == n).select(
            "i", F.expr(exact_floordiv_sql("x", n)).alias("q"))
        got.update({r["i"]: r["q"] for r in part.collect()})
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, x BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    # DuckDB twin of the same formula (pmod spelled as ((x%n)+n)%n)
    want = {i: q for i, q in con.execute(
        "SELECT i, (x - ((x % n) + n) % n) // n FROM t").fetchall()}
    # python floor division is the ground truth for both
    truth = {i: x // n for i, x, n in rows}
    assert got == truth
    assert want == truth
