"""Round-8 additions, pinned:

- ext_kfold_assign: fold ids are total (every doc in exactly one of
  k folds), deterministic across repartitionings, and the audit
  matrix accounts for every document exactly once.
- ext_fuzzy_blocked_join (re-encoded r13, radius-bounded PassJoin):
  the full output equals an independent Python brute-force of the
  declared contract (same block, |Δlen| <= 1, edit <= 2, best by
  (dist, key)) on a hand-built frame that exercises substitutions,
  an indel that shifts every segment, 1-char segments, cross-length
  segment alignment, and the sub-3-char whole-block fallback.
- w11_running_distinct: running distinct cardinality equals the
  Python prefix-set size at every row of a hand-built sequence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_kfold_assign_partition_properties(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        ext_kfold_assign,
    )
    docs = read_table(spark, sf_dir, "documents")
    audit = ext_kfold_assign(spark, sf_dir).collect()
    folds = {r.fold for r in audit}
    assert folds <= {0, 1, 2, 3, 4}
    # the audit matrix accounts for every document exactly once
    assert sum(r.n_docs for r in audit) == docs.count()
    assert (sum(r.sum_chars for r in audit)
            == docs.agg(F.sum("n_chars")).first()[0])
    # deterministic: repartitioning must not move a single doc
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r6 import (
        md5_mod,
    )
    fold = md5_mod(F.col("doc_id").cast("string"), 5)
    a = {r.doc_id: r.f for r in
         docs.select("doc_id", fold.alias("f")).collect()}
    b = {r.doc_id: r.f for r in
         docs.repartition(13).select("doc_id", fold.alias("f"))
         .collect()}
    assert a == b


def test_fuzzy_blocked_join_model_check(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        ext_fuzzy_blocked_join,
    )
    import os
    import tempfile

    rows = [
        (1, "linen azure tomato navajo ghost", "B1", 5),
        (2, "linen azure tomato navajo frost", "B1", 5),   # 2 subs to 1
        (3, "wheat khaki orange papaya smoke", "B1", 5),   # out of radius
        (4, "linen azure tomato navajo ghost", "B2", 5),   # other block
        (5, "solo in its block", "B3", 9),                 # singleton
        (6, "linen azure tomato navajo ghos", "B1", 5),    # del: dist 1 to 1
        (7, "xlinen azure tomato navajo ghost", "B1", 5),  # front ins:
        #   shifts every PassJoin segment — exercises the ±2 probe shift
        (8, "abcd", "B4", 1),                              # 1-char
        (9, "abce", "B4", 1),                              # segments
        (10, "abcdefgh", "B5", 1),                         # len 8 vs
        (11, "abcdefghi", "B5", 1),  # len 9 — Δlen segment alignment
        (12, "ab", "B6", 1),         # len < 3: whole-block fallback
        (13, "ba", "B6", 1),         # dist 2 to 12, found via fallback
    ]
    df = spark.createDataFrame(
        rows, ["p_partkey", "p_name", "p_brand", "p_size"])
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "part.parquet"))
        got = {r.part_a: (r.part_b, r.edit_dist) for r in
               ext_fuzzy_blocked_join(spark, tmp).collect()}
    # independent brute-force model of the full declared contract:
    # same (brand, size), |Δlen| <= 1, edit <= 2, best by (dist, key)
    expect = {}
    for a, an, ab, asz in rows:
        cands = [(_lev(an, bn), b) for b, bn, bb, bsz in rows
                 if (bb, bsz) == (ab, asz) and b != a
                 and abs(len(an) - len(bn)) <= 1]
        cands = [(d, b) for d, b in cands if d <= 2]
        if cands:
            d, b = min(cands)
            expect[a] = (b, d)
    assert got == expect
    # the model itself behaves as designed: radius drops 3, the
    # deletion wins 1's tiebreak (6 and 7 both at dist 1 → lower
    # key), 1-char segments still pair 8↔9, cross-length segment
    # alignment pairs 10↔11, and the sub-3-char fallback pairs 12↔13
    assert 3 not in got and 4 not in got and 5 not in got
    assert got[1] == (6, 1) and got[6] == (1, 1) and got[7] == (1, 1)
    assert got[8] == (9, 1) and got[9] == (8, 1)
    assert got[10] == (11, 1) and got[11] == (10, 1)
    assert got[12] == (13, 2) and got[13] == (12, 2)


def test_running_distinct_matches_prefix_sets(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        w11_running_distinct,
    )
    out = w11_running_distinct(spark, sf_dir)
    li = (read_table(spark, sf_dir, "lineitem")
          .select("l_suppkey", "l_orderkey", "l_linenumber",
                  "l_shipdate", "l_partkey"))
    # independent model on the 3 smallest suppliers' rows
    supp = [r.l_suppkey for r in
            li.groupBy("l_suppkey").count()
            .orderBy("count", "l_suppkey").limit(3).collect()]
    rows = (li.filter(F.col("l_suppkey").isin(supp))
            .orderBy("l_suppkey", "l_shipdate", "l_orderkey",
                     "l_linenumber").collect())
    expect = {}
    seen: dict = {}
    for r in rows:
        s = seen.setdefault(r.l_suppkey, set())
        s.add(r.l_partkey)
        expect[(r.l_suppkey, r.l_orderkey, r.l_linenumber)] = len(s)
    got = {(r.l_suppkey, r.l_orderkey, r.l_linenumber):
           r.distinct_parts_seen
           for r in out.filter(F.col("l_suppkey").isin(supp)).collect()}
    assert got == expect
    # global sanity: the running count never exceeds the supplier's
    # total distinct parts, and ends exactly there
    finals = (out.groupBy("l_suppkey")
              .agg(F.max("distinct_parts_seen").alias("m")))
    truth = (li.groupBy("l_suppkey")
             .agg(F.countDistinct("l_partkey").alias("d")))
    diff = (finals.join(truth, "l_suppkey")
            .filter(F.col("m") != F.col("d")).count())
    assert diff == 0


def test_running_distinct_single_exchange(spark, sf_dir):
    """The supplier-only repartition must satisfy BOTH windows'
    clustering so the plan carries exactly one Exchange (Catalyst
    left alone inserts one per window — a full second shuffle of the
    fact at scale)."""
    import re

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        w11_running_distinct,
    )
    plan = (w11_running_distinct(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
    assert len(exchanges) == 1, exchanges
    assert "l_suppkey" in exchanges[0]
    assert plan.count("Window") >= 2


def test_url_canonicalize_collapses_all_arms(spark, sf_dir):
    """Every document's three messy URL arms must collapse to exactly
    ONE canonical key, and the key must carry none of the mess
    (scheme, www., default port, utm params, fragment, trailing
    slash) while keeping the real query param."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        ext_url_canonicalize,
    )
    out = ext_url_canonicalize(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert all(r.n_variants == 3 for r in out)
    for r in out[:20]:
        u = r.canonical_url
        assert "://" not in u and not u.startswith("www.")
        assert ":80" not in u and ":443" not in u
        assert "utm_" not in u and "#" not in u
        assert "page=2" in u  # the real param survives
        assert ".example.com/docs/" in u  # host lowercased
        assert not u.split("?")[0].endswith("/")


def test_weighted_median_model_check(spark):
    """Independent model: smallest value whose cumulative weight
    reaches half the total — checked on a hand frame with ties and
    skewed weights, written as a parquet table the builder reads."""
    import os
    import tempfile

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        a36_weighted_median,
    )
    rows = [
        # flag A: weights 1,1,8 over prices 1.00,2.00,3.00
        # cum at 1.00=1, 2.00=2, 3.00=10; half of 10 is 5 -> 3.00
        ("A", 1.00, 1.0), ("A", 2.00, 1.0), ("A", 3.00, 8.0),
        # flag B: equal-price tie rows must merge into one cum step:
        # weights 3+3 at 5.00, 2 at 9.00; 2*6 >= 8 -> 5.00
        ("B", 5.00, 3.0), ("B", 5.00, 3.0), ("B", 9.00, 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_extendedprice", "l_quantity"])
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "lineitem.parquet"))
        got = {r.flag: r.wmedian_cents
               for r in a36_weighted_median(spark, tmp).collect()}
    assert got == {"A": 300, "B": 500}


def test_simhash_portable_model_check(spark):
    """Independent Python model: md5-bounded 32-bit SimHash over word
    3-gram shingles. Planted near-dups must pair with the exact
    Hamming distance the model computes; unrelated docs must not."""
    import hashlib
    import itertools
    import os
    import tempfile

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        simhash_portable_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning before the sun rises")
    docs = [
        (1, base),
        (2, base + " indeed"),                    # near-dup of 1
        (3, "completely different words about spark shuffles and "
            "catalyst optimizer rules for distributed query plans"),
        (4, "tiny"),                              # <3 tokens: dropped
    ]

    def model_fp(text: str) -> int:
        toks = text.split()
        sh = {" ".join(toks[i:i + 3])
              for i in range(len(toks) - 2)} if len(toks) >= 3 else set()
        votes = [0] * 32
        for s in sh:
            h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            for i in range(32):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(32) if votes[i] > 0)

    fps = {k: model_fp(t) for k, t in docs if len(t.split()) >= 3}
    expect = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        ham = bin(fps[a] ^ fps[b]).count("1")
        # candidate only if some 8-bit band matches
        bands = any(((fps[a] >> (8 * i)) & 255)
                    == ((fps[b] >> (8 * i)) & 255) for i in range(4))
        if bands and ham <= 3:
            expect[(a, b)] = ham

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {(r.key_a, r.key_b): r.hamming for r in
               simhash_portable_pairs(
                   spark.read.parquet(
                       os.path.join(tmp, "documents.parquet")),
                   "doc_id", "text").collect()}
    assert got == expect
    assert (1, 2) in got  # the planted near-dup was actually found


def test_simhash_portable_planted_recall(spark, sf_dir):
    """On the dedup family's planted corpus, the portable SimHash must
    surface most ' mutation' twins at Hamming <= 3 (a short doc can
    legitimately flip more than 3 bits — measured 46/50 at sf0.001,
    floor pinned below)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r8 import (
        ext_dedup_simhash_portable,
    )
    got = ext_dedup_simhash_portable(spark, sf_dir).collect()
    planted = [r for r in got if r.key_b == r.key_a + 10_000_000]
    n_base = (read_table(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 10 == 0).count())
    assert n_base > 0
    assert len(planted) >= 0.8 * n_base, (len(planted), n_base)
    assert all(r.hamming <= 3 for r in got)


def test_peak_concurrency_model_check(spark):
    """Hand-built schedule with a known answer: 3 users overlap
    (peak 3), a single-event session registers concurrency 1, a
    touching pair (one ends exactly when the other starts) counts as
    overlapping (closed intervals), and a midnight-crossing session
    belongs to its START day."""
    import datetime as dt
    import os
    import tempfile

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
        peak_concurrency,
    )

    def t(d, h, m):
        return dt.datetime(2024, 3, d, h, m)

    schema = ["event_id", "ts", "user_id", "event_type", "value",
              "props"]
    rows = [
        # day 1: three sessions overlapping at 9:10 -> peak 3
        (1, t(1, 9, 0), 1, "view", 0.0, "{}"),
        (2, t(1, 9, 20), 1, "view", 0.0, "{}"),   # u1: 9:00-9:20
        (3, t(1, 9, 5), 2, "view", 0.0, "{}"),
        (4, t(1, 9, 15), 2, "view", 0.0, "{}"),   # u2: 9:05-9:15
        (5, t(1, 9, 10), 3, "view", 0.0, "{}"),   # u3: single @9:10
        # u1 second session touches u2's: 12:00-12:29 and 12:29-12:40
        # (29-min gap: exactly 30 would OPEN a new session — the
        # delta >= gap rule)
        (6, t(1, 12, 0), 1, "view", 0.0, "{}"),
        (7, t(1, 12, 29), 1, "view", 0.0, "{}"),
        (8, t(1, 12, 29), 2, "view", 0.0, "{}"),
        (9, t(1, 12, 40), 2, "view", 0.0, "{}"),
        # day 2: one session crossing midnight into day 3
        (10, t(2, 23, 50), 4, "view", 0.0, "{}"),
        (11, t(3, 0, 10), 4, "view", 0.0, "{}"),
        # day 3: an isolated session
        (12, t(3, 10, 0), 5, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(rows, schema)
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {str(r.day): (r.n_sessions, r.peak_concurrent)
               for r in peak_concurrency(
                   spark.read.parquet(
                       os.path.join(tmp, "events.parquet"))).collect()}
    # day 1: 5 sessions (u1 x2, u2 x2, u3), peak 3 at 9:10
    # (u4's 23:50 session starts day 2 even though it ends day 3;
    # gap 20 min < 30 keeps it ONE session)
    assert got == {"2024-03-01": (5, 3),
                   "2024-03-02": (1, 1),
                   "2024-03-03": (1, 1)}
