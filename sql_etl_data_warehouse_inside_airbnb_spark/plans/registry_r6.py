"""Round-6 additions: BFS reachability hops, per-group winsorization,
Benford first-digit monitoring, co-occurrence PMI components,
positional phrase search, hash-based negative sampling, DAU/WAU
active-user rollups, label-propagation communities, MMR diversity
re-ranking, VARIANT semi-structured extraction, and a native
recursive-CTE hierarchy walk.

Gaps the r1-r5 surface left open, each a workload a production
warehouse + LLM-data shop runs that no existing entry expresses:
bounded-depth graph REACHABILITY (g1/g5/g6 give components, triangles
and centrality — not "how far", the basis of fraud rings and social
graph features); distribution-tail CLAMPING for feature engineering
(x2 detects outliers, nothing repairs them); first-digit drift (the
classic fabricated-data monitor, one scan of integer counts);
co-occurrence association mining emitted as exact PMI COMPONENTS
(m1 gives frequent sets, not association strength; the quotient/log
derive client-side, the a34 lesson); PHRASE queries over the
retrieval family (keyword/BM25/RRF are bag-of-words — adjacency
needs token positions); and deterministic negative sampling (every
recommender/contrastive trainer needs non-interacted items, and
rand() is engine-unportable — the seeded-md5 trick from the MinHash
family makes it oracle-checkable).

All compared columns are integer / exact-data-value doubles (no
derived-float arithmetic — the registry quotient rule). Added inside
the round-6 adjudication window (full_registry docstring: the closure
round leaves positions 11-50 spare) after passing tools/parity.py's
EXACT canon at sf0.01 AND sf0.1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
    tokens,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    DBL_MAX_SQL,
    finite_sql,
    register,
    t,
)

# Engine-portable bounded pseudo-random integer in [0, mod): first 8
# md5 hex chars parsed base-16. Spark conv() and DuckDB's '0x' cast
# agree exactly; 8 hex chars < 2^32 so the bigint is always positive
# and % is safe without pmod gymnastics.
def md5_mod(col, mod: int):
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
            .cast("bigint") % mod)


def md5_mod_sql(expr: str, mod: int) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT) % {mod}"


@register(
    "g7_bfs_hops",
    """WITH RECURSIVE
       e AS (SELECT DISTINCT user_id AS u,
                    1000 + event_id % 50 AS v
             FROM events),
       sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
       walk(node, hops) AS (
         SELECT DISTINCT u AS node, 0 AS hops FROM e WHERE u % 10 = 0
         UNION
         SELECT s.v, w.hops + 1
         FROM walk w JOIN sym s ON s.u = w.node
         WHERE w.hops < 4)
       SELECT node, CAST(min(hops) AS BIGINT) AS hops
       FROM walk GROUP BY node""",
    survey="§7.5 graph ext (bounded BFS / reachability hops)",
    note="multi-source BFS shortest-hop distance, bounded to 4 rounds "
         "— the reachability primitive g1 (components) and g6 "
         "(PageRank) don't expose: 'how many hops from a seed set' is "
         "the fraud-ring / influence-radius / graph-feature query. "
         "Graph = the bipartite user <-> event-bucket relation "
         "(node ids disjoint by a +1000 offset). Spark side is "
         "frontier expansion: per round ONE equi-join frontier x "
         "edges + ONE left-anti against the reached set (so each "
         "node joins exactly once ever — total cost is edges "
         "touched, not rounds x edges; same per-round shape as "
         "g6_pagerank, localCheckpoint lineage control). Oracle: "
         "DuckDB recursive CTE, min(hops) = BFS layer because UNION "
         "dedups (node,hops) pairs and rounds are bounded. At scale "
         "the frontier join partitions on node id; the reached set "
         "is the only growing state and it's the answer itself")
def g7_bfs_hops(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # r13 (guide §2.4): e and sym were LAZY relations, so every round's
    # frontier join re-ran the events scan + two distincts. sym is now
    # checkpointed ONCE; the per-round `reached` checkpoint is gone —
    # reached is a union of already-checkpointed nxt frames,
    # re-materializing it bought nothing but one extra job per round.
    # r14 (advisor item): the repartition("u")-before-checkpoint is
    # gone — a checkpointed frame surfaces as UnknownPartitioning
    # under AQE (the r13 g9 finding), so the per-round join
    # re-exchanged sym anyway; it only added a setup exchange.
    e = (ev.select(F.col("user_id").alias("u"),
                   (F.lit(1000) + F.col("event_id") % 50).alias("v"))
         .distinct().localCheckpoint(eager=True))
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct().localCheckpoint(eager=True))
    frontier = (e.filter(F.col("u") % 10 == 0).select("u").distinct()
                .select(F.col("u").alias("node")))
    reached = frontier.withColumn("hops", F.lit(0).cast("bigint"))
    reached = reached.localCheckpoint()
    frontier = reached.select("node")
    for h in range(1, 5):
        nxt = (frontier.join(sym, frontier["node"] == sym["u"])
               .select(F.col("v").alias("node")).distinct()
               .join(reached.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(h).cast("bigint")))
        nxt = nxt.localCheckpoint()
        if not nxt.take(1):
            break
        reached = reached.unionByName(nxt)
        frontier = nxt.select("node")
    return reached.select("node", "hops")


@register(
    "f33_winsorize",
    f"""WITH b AS (SELECT event_type,
                         quantile_disc(value, 0.05) AS lo,
                         quantile_disc(value, 0.95) AS hi
                  FROM events
                  WHERE {finite_sql('value')}
                  GROUP BY event_type)
       SELECT event_id, e.event_type,
              CASE WHEN value < lo THEN lo
                   WHEN value > hi THEN hi
                   ELSE value END AS value_w
       FROM events e LEFT JOIN b ON e.event_type = b.event_type""",
    survey="§2.8 ext (feature engineering — percentile clamp)",
    note="per-group winsorization: clamp each value into its group's "
         "[p05, p95] — the outlier REPAIR step feature pipelines run "
         "after x2's outlier DETECTION (capping beats dropping when "
         "rows carry labels). percentile_disc selects actual data "
         "values (a22's exactness argument) and the clamp only ever "
         "emits a data value or a boundary — both raw doubles, no "
         "derived arithmetic, so the driver hash is exact. The "
         "boundary aggregate reads FINITE values only (the BETWEEN "
         "±DBL_MAX guard excludes ±Inf, and NaN because both engines "
         "order NaN above every value so NaN <= DBL_MAX is false — "
         "r12 hostile-data finding: NaN inside the percentile input "
         "contaminates the bounds DIFFERENTLY per engine, and a "
         "non-finite row should be clamped, not allowed to move the "
         "clamp); non-finite VALUES then clamp through the same CASE "
         "(NaN and +Inf compare greater than hi on both engines → "
         "hi; -Inf → lo), so the repair covers them. LEFT join: a "
         "group with NO finite values has no bounds row — its rows "
         "pass through unclamped (NULL bounds fall to ELSE) rather "
         "than vanish with an inner join (post-review fix). Identity "
         "on all-finite data — the driver hash is unchanged. Plan: "
         "one 5-row boundary aggregate broadcast-hash-joined back on "
         "the group key (equi join, never a nested loop); at 100 TB "
         "the boundary table is per-group stats, O(groups), and the "
         "scan stays single-pass")
def f33_winsorize(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events_f33")
    return spark.sql(
        f"""WITH b AS (SELECT event_type,
                             percentile_disc(0.05) WITHIN GROUP
                               (ORDER BY value) AS lo,
                             percentile_disc(0.95) WITHIN GROUP
                               (ORDER BY value) AS hi
                      FROM events_f33
                      WHERE {finite_sql('value')}
                      GROUP BY event_type)
           SELECT event_id, e.event_type,
                  CASE WHEN value < lo THEN lo
                       WHEN value > hi THEN hi
                       ELSE value END AS value_w
           FROM events_f33 e
           LEFT JOIN b ON e.event_type = b.event_type""")


@register(
    "x13_benford_first_digit",
    f"""SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS BIGINT) AS digit,
              CAST(count(*) AS BIGINT) AS n
       FROM orders
       WHERE o_totalprice BETWEEN 1 AND {DBL_MAX_SQL}
       GROUP BY digit""",
    survey="§7.5 monitoring ext (Benford first-digit audit)",
    note="first-significant-digit distribution of order totals — the "
         "classic fabricated/corrupted-feed audit (natural "
         "multiplicative amounts follow Benford's log law; a uniform "
         "or spiked digit histogram flags synthetic or truncated "
         "data). Digit extraction is INTEGER end to end: floor() to "
         "bigint (exact on both engines) then the first character of "
         "the integer's decimal string — never log10/pow double "
         "arithmetic, whose last-ulp rounding near digit boundaries "
         "diverges across engines. One scan, one 9-row aggregate; "
         "the expected-vs-observed chi-square derives client-side "
         "(quotient rule). At 100 TB this is a metadata-cheap full "
         "scan or a per-partition incremental rollup (x5's pattern)")
def x13_benford_first_digit(spark, sf_dir):
    # BETWEEN 1 AND DBL_MAX, not >= 1 (r12 hostile finding): both
    # engines order NaN above every value, so NaN >= 1 is TRUE and a
    # NaN total reaches floor→BIGINT where DuckDB errors and Spark
    # doesn't — the first digit is only defined for finite amounts.
    # Identity on finite data.
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice")
                 .between(1, float(DBL_MAX_SQL))))
    digit = (F.substring(F.floor("o_totalprice").cast("bigint")
                         .cast("string"), 1, 1).cast("bigint"))
    return (o.groupBy(digit.alias("digit"))
            .agg(F.count("*").alias("n")))


@register(
    "ext_cooccurrence_pmi",
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey % 100 AS item
                  FROM lineitem),
       n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
       pairs AS (SELECT a.item AS item_a, c.item AS item_b,
                        CAST(count(*) AS BIGINT) AS n_ab
                 FROM b a JOIN b c
                   ON a.l_orderkey = c.l_orderkey AND a.item < c.item
                 GROUP BY a.item, c.item
                 HAVING count(*) >= 20),
       m AS (SELECT item, CAST(count(*) AS BIGINT) AS n_i
             FROM b GROUP BY item)
       SELECT item_a, item_b, n_ab,
              ma.n_i AS n_a, mb.n_i AS n_b,
              CAST(n_orders AS BIGINT) AS n_orders
       FROM pairs
       JOIN m ma ON ma.item = item_a
       JOIN m mb ON mb.item = item_b
       CROSS JOIN n""",
    survey="§7.5 ext (co-occurrence / PMI association mining)",
    note="item-pair association strength as exact PMI COMPONENTS "
         "(n_ab, n_a, n_b, N): pmi = log(N*n_ab/(n_a*n_b)) is "
         "log-of-quotient arithmetic — the cross-engine trap — so "
         "the four integers ship and the scalar derives client-side "
         "(the a34/x11 discipline), and the components are MERGEABLE "
         "across corpus shards. m1 answers 'which sets are frequent'; "
         "PMI answers 'which pairs co-occur MORE than their "
         "popularity predicts' — the co-view/co-purchase/embedding-"
         "context statistic. Plan (r13): lineitem groups ONCE by the "
         "basket key into a sorted distinct item array; pairs explode "
         "the per-basket combination list (bounded by basket-size "
         "squared per order, never corpus-pairs, partial-agged to "
         "<=k^2/2 groups map-side), marginals explode the same arrays "
         "(partial-agged to <=k groups), and the pairs/marginals "
         "branches share one planned basket exchange (ReuseExchange — "
         "their subtrees are kept IDENTICAL, see the explode guard "
         "note). The old shape self-joined a distinct basket relation "
         "built independently 4x: 4 lineitem scans and two extra "
         "orderkey shuffles of it, all removed. r14: the N branch "
         "rides the SAME basket exchange (its count references "
         "`items` so pruning cannot rewrite it into a separate "
         "1-column scan — see the size() guard note in the builder), "
         "so lineitem is scanned exactly ONCE. 1-row N and the "
         "100-row marginals join as the allowlisted broadcast-global "
         "pattern (x7/bm25/a35/x12)")
def ext_cooccurrence_pmi(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    baskets = (li.select("l_orderkey",
                         (F.col("l_partkey") % 100).alias("item"))
               .groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("item")).alias("items")))
    # count == COUNT(DISTINCT l_orderkey): one basket row per key, and
    # the when() argument is NULL exactly on the NULL-key group, which
    # count() skips like DISTINCT does. The size(items) >= 0 guard is
    # ALWAYS true (collect_set yields [] for an all-NULL group, never
    # NULL) but the optimizer cannot prove it, so `items` stays
    # referenced and column pruning cannot rewrite this branch's child
    # aggregate from collect_set to a bare groupBy — keeping the
    # subtree canonically IDENTICAL to the pairs/marginals branches so
    # all THREE consumers share the one planned basket exchange
    # (r14, guide §2.4: N previously optimized into its own 1-column
    # lineitem scan + exchange; ReuseExchange now removes both).
    n = baskets.agg(F.count(
        F.when(F.size("items") >= 0, F.col("l_orderkey")))
        .alias("n_orders"))
    pair_list = F.flatten(F.transform(
        "items",
        lambda x, i: F.transform(
            F.slice(F.col("items"), i + 2,
                    F.greatest(F.size("items") - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")))))
    # NULL-basket guard INSIDE the explode expression (explode(NULL)
    # emits no rows, matching the oracle's NULL-never-joins pair
    # semantics) — a Filter here would be pushed to the scan and break
    # subtree identity with the marginals branch, losing ReuseExchange.
    pairs = (baskets
             .select(F.explode(
                 F.when(F.col("l_orderkey").isNotNull(), pair_list))
                 .alias("p"))
             .groupBy(F.col("p.item_a").alias("item_a"),
                      F.col("p.item_b").alias("item_b"))
             .agg(F.count("*").alias("n_ab"))
             .filter(F.col("n_ab") >= 20))
    m = (baskets.select(F.explode("items").alias("item"))
         .groupBy("item").agg(F.count("*").alias("n_i")))
    ma = m.select(F.col("item").alias("item_a"),
                  F.col("n_i").alias("n_a"))
    mb = m.select(F.col("item").alias("item_b"),
                  F.col("n_i").alias("n_b"))
    return (pairs.join(F.broadcast(ma), "item_a")
            .join(F.broadcast(mb), "item_b")
            .join(F.broadcast(n))
            .select("item_a", "item_b", "n_ab", "n_a", "n_b",
                    "n_orders"))


_TOKLIST_SQL = """list_filter(
      string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
      x -> x <> '')"""


@register(
    "ext_phrase_search",
    f"""WITH tok AS (
         SELECT doc_id, unnest(toks) AS term,
                unnest(range(1, len(toks) + 1)) AS pos
         FROM (SELECT doc_id, {_TOKLIST_SQL} AS toks
               FROM documents))
       SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
       FROM tok a JOIN tok b
         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'value' AND b.term = 'table'
       GROUP BY a.doc_id""",
    survey="§7.5 retrieval ext (positional / phrase query)",
    note="exact phrase search ('value table' as ADJACENT tokens) — "
         "the positional-index query the bag-of-words retrieval "
         "family (keyword/BM25/RRF) cannot express: postings carry "
         "token POSITIONS (posexplode; DuckDB zipped unnest+range, "
         "offset-base-independent because the join matches the pos "
         "DELTA) and adjacency is an equi-join on (doc_id, pos+1) — "
         "composite hash keys, never a nested loop. Each side prunes "
         "to its term's postings before the join, so cost is "
         "posting-list sized (term selectivity), not corpus sized — "
         "exactly how Lucene positional queries price. Extending to "
         "k-term phrases chains k-1 adjacency joins")
def ext_phrase_search(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens("text")).alias("pos", "term"))
    a = (tok.filter(F.col("term") == "value")
         .select("doc_id", F.col("pos").alias("pa")))
    b = (tok.filter(F.col("term") == "table")
         .select(F.col("doc_id").alias("doc_b"),
                 F.col("pos").alias("pb")))
    return (a.join(b, (a["doc_id"] == b["doc_b"])
                   & (b["pb"] == a["pa"] + 1))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matches")))


@register(
    "ext_negative_samples",
    f"""WITH pos AS (SELECT DISTINCT o_custkey AS user_id,
                            l_partkey % 100 AS item
                     FROM lineitem JOIN orders
                       ON l_orderkey = o_orderkey
                     WHERE o_custkey % 100 = 0),
       cand AS (SELECT user_id, item, j,
                       {md5_mod_sql(
                           "concat_ws(':', user_id, item, j)", 100)}
                           AS neg_item
                FROM pos CROSS JOIN (SELECT unnest([1, 2, 3]) AS j))
       SELECT c.user_id, c.item, CAST(c.j AS BIGINT) AS j, c.neg_item
       FROM cand c
       WHERE NOT EXISTS (SELECT 1 FROM pos p
                         WHERE p.user_id = c.user_id
                           AND p.item = c.neg_item)""",
    survey="§7.5 ext (negative sampling for contrastive training)",
    note="deterministic negative sampling: for every observed "
         "(user, item) interaction, 3 pseudo-random candidate items "
         "drawn by the seeded-md5 integer family (the MinHash trick "
         "— rand() differs per engine/partitioning, md5 doesn't), "
         "then a left-anti join removes accidental true positives — "
         "the standard recommender/contrastive-loss training-pair "
         "generator, fully reproducible across reruns AND engines. "
         "Plan: explode x3 on the positives (linear), one anti join "
         "hashed on (user, candidate); at 100 TB both sides partition "
         "on user_id so the anti join co-locates. Residual sampling "
         "bias (popular items sampled uniformly) is the documented "
         "trade of uniform negative sampling; frequency-weighted "
         "variants swap the modulus for an alias table")
def ext_negative_samples(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    pos = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .select(F.col("o_custkey").alias("user_id"),
                   (F.col("l_partkey") % 100).alias("item"))
           .distinct())
    cand = (pos.withColumn("j", F.explode(F.array(
                F.lit(1), F.lit(2), F.lit(3))))
            .withColumn("neg_item", md5_mod(
                F.concat_ws(":", "user_id", "item", "j"), 100)))
    hits = pos.select(F.col("user_id"),
                      F.col("item").alias("neg_item"))
    return (cand.join(hits, ["user_id", "neg_item"], "left_anti")
            .select("user_id", "item", F.col("j").cast("bigint")
                    .alias("j"), "neg_item"))


@register(
    "e8_dau_wau",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                   FROM events),
       bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
       dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
               FROM ud GROUP BY day),
       contrib AS (SELECT DISTINCT user_id,
                          day + CAST(x.o AS INTEGER) AS target_day
                   FROM ud CROSS JOIN
                        (SELECT unnest(range(0, 7)) AS o) x),
       wau AS (SELECT target_day AS day,
                      CAST(count(*) AS BIGINT) AS wau
               FROM contrib, bounds
               WHERE target_day BETWEEN lo AND hi
               GROUP BY target_day)
       SELECT COALESCE(d.day, w.day) AS day,
              COALESCE(d.dau, 0) AS dau,
              COALESCE(w.wau, 0) AS wau
       FROM dau d FULL OUTER JOIN wau w ON d.day = w.day""",
    survey="§7.5 product analytics ext (DAU / trailing-7-day WAU)",
    note="daily + trailing-7-day active users — THE product-analytics "
         "dashboard pair (e2's cohort retention answers 'do users "
         "come back'; DAU/WAU answers 'how many are here NOW' and "
         "their ratio is the stickiness metric, derived client-side "
         "per the quotient rule). The trailing window is computed by "
         "CONTRIBUTION EXPLODE: each (user, active-day) row fans out "
         "to the 7 calendar days it keeps the user 'weekly-active' "
         "for, then one distinct + count per target day — linear x7 "
         "in the activity relation, no day-range self-join and no "
         "window-frame count(DISTINCT) (which Spark window frames "
         "cannot express at all). At 100 TB the (user, day) distinct "
         "is the only shuffle that sees data volume; everything after "
         "is day-cardinality sized. The WAU window clamps to the "
         "OBSERVED corpus span via a min/max(day) 1-row broadcast "
         "(the allowlisted global pattern) — r6 advisor item: literal "
         "date bounds silently shrank the compared output on BOTH "
         "sides if the generator's span ever moved, the same latent-"
         "coupling class as x11's below-range bug")
def e8_dau_wau(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    ud = (ev.select("user_id", F.col("ts").cast("date").alias("day"))
          .distinct())
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = (ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"),
                             F.date_add(F.col("day"), 6)))
        .alias("target_day"))
        .distinct()
        .join(F.broadcast(bounds))
        .filter(F.col("target_day").between(F.col("lo"), F.col("hi")))
        .drop("lo", "hi"))
    wau = (contrib.groupBy(F.col("target_day").alias("day"))
           .agg(F.count("*").alias("wau")))
    return (dau.join(wau, "day", "full_outer")
            .select(F.col("day"),
                    F.coalesce("dau", F.lit(0)).alias("dau"),
                    F.coalesce("wau", F.lit(0)).alias("wau")))


def _g8_oracle(rounds: int = 5) -> str:
    """DuckDB oracle for g8: the r9 MMR unroll playbook applied to
    synchronous LPA — a FIXED round count of pure-integer min-label
    argmax propagation unrolls into static CTEs (one join + grouped
    count + row_number argmax per round; ties ORDER BY cnt DESC,
    label ASC = the Spark side's max(struct(cnt, -label)))."""
    steps = ["r0 AS MATERIALIZED "
             "(SELECT DISTINCT u AS node, u AS label FROM sym)"]
    for i in range(1, rounds + 1):
        steps.append(f"""r{i} AS MATERIALIZED (
         SELECT node, label FROM (
           SELECT s.u AS node, l.label,
                  row_number() OVER (PARTITION BY s.u
                                     ORDER BY count(*) DESC, l.label)
                      AS rn
           FROM sym s JOIN r{i - 1} l ON s.v = l.node
           GROUP BY s.u, l.label) t
         WHERE rn = 1)""")
    steps_sql = ",\n       ".join(steps)
    return f"""WITH e AS MATERIALIZED (
         SELECT DISTINCT user_id AS u,
                1000 + event_id % 50 AS v
         FROM events),
       sym AS MATERIALIZED (
               SELECT u, v FROM e
               UNION
               SELECT v AS u, u AS v FROM e),
       {steps_sql}
       SELECT node, label FROM r{rounds}"""


@register(
    "g8_label_propagation",
    _g8_oracle(5),
    survey="§7.5 graph ext (community detection, LPA)",
    note="synchronous label propagation (5 rounds, deterministic: new "
         "label = most frequent neighbor label, ties to the SMALLEST "
         "label) over the same bipartite user<->event-bucket graph as "
         "g7 — the community-detection primitive the graph family "
         "lacked: g1 finds components (trivially one big one here), "
         "LPA finds dense regions INSIDE a component, the basis of "
         "near-dup cluster splitting and engagement cohorts. Per "
         "round: one equi-join labels x edges, one (node, label) "
         "count, one max_by(struct(cnt, -label)) argmax — all "
         "map-side-combinable, localCheckpoint lineage control like "
         "g6. ORACLE-PAIRED since r10 (the r9-verdict item-2 "
         "conversion): everything is exact int64 and the round count "
         "is fixed, so the loop unrolls into static CTEs — the MMR "
         "unroll playbook; the r6 independent-Python-LPA pin stays "
         "(tests/test_r6.py, tests/test_r10.py)")
def g8_label_propagation(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    e = (ev.select(F.col("user_id").alias("u"),
                   (F.lit(1000) + F.col("event_id") % 50).alias("v"))
         .distinct())
    # Checkpoints are LAZY (the k_core_rounds precedent): the round
    # count is fixed and there is no convergence probe, so the whole
    # 5-round propagation materializes as ONE action cascade (each
    # round's frame persists exactly once — its only consumer is the
    # next round's join) instead of 7 scheduled jobs. r14 (advisor
    # item): the r13 repartition("v")-before-checkpoint is gone — a
    # checkpointed frame surfaces as UnknownPartitioning under AQE
    # (the r13 g9 finding), so each round's join re-exchanged sym
    # anyway and the repartition only added a setup exchange; the
    # old comment claiming the join "shuffles only the label state"
    # was inconsistent with that finding.
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct().localCheckpoint(eager=False))
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(5):
        nbr = (sym.join(labels, sym["v"] == labels["node"])
               .select(F.col("u").alias("node"), "label"))
        counts = nbr.groupBy("node", "label").agg(
            F.count("*").alias("cnt"))
        labels = (counts.groupBy("node")
                  .agg(F.max(F.struct(F.col("cnt"),
                                      (-F.col("label")).alias("neg")))
                       .alias("best"))
                  .select("node", (-F.col("best.neg")).alias("label"))
                  .localCheckpoint(eager=False))
    return labels.select("node", "label")


@register(
    "ext_mmr_diversify",
    None,
    survey="§7.5 retrieval ext (MMR diversity re-rank)",
    note="Maximal Marginal Relevance re-ranking: from the brute-force "
         "top-50 cosine candidates for a query vector, greedily pick "
         "10 maximizing lambda*sim(q,d) - (1-lambda)*max_sim(d, "
         "already-picked) (lambda=0.7) — the diversity pass RAG and "
         "search stacks run so the shortlist isn't 10 paraphrases of "
         "one document. Greedy selection is inherently sequential, so "
         "it runs as ONE applyInPandas group over the BOUNDED "
         "candidate shortlist (k=50 rows — the retriever has already "
         "reduced the corpus; MMR cost is k^2 floats, never "
         "corpus-sized, the same bounded-driver-state argument as "
         "rank_list). Deliberate rows-only (greedy argmax has no SQL "
         "form); selection pinned against an independent Python MMR "
         "in tests/test_r6.py; ties broken by vec_id so the pick "
         "order is total")
def ext_mmr_diversify(spark, sf_dir):
    import pandas as pd

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        as_double,
        brute_force_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(1)
    cand_ids = brute_force_topk(
        emb.join(q.select("vec_id"), "vec_id", "left_anti"),
        q, k=50).select("vec_id")
    cand = (emb.join(cand_ids, "vec_id")
            .join(F.broadcast(q.select(
                as_double(F.col("embedding")).alias("qvec"))))
            .select("vec_id", as_double(F.col("embedding")).alias("vec"),
                    "qvec")
            .withColumn("grp", F.lit(1)))

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        lam = 0.7
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["vec"].to_numpy())
        qv = np.asarray(pdf["qvec"].iloc[0])
        norm = np.linalg.norm
        qsim = mat @ qv / (norm(mat, axis=1) * norm(qv))
        inter = (mat @ mat.T) / np.outer(norm(mat, axis=1),
                                         norm(mat, axis=1))
        picked: list[int] = []
        rest = list(range(len(pdf)))
        while rest and len(picked) < 10:
            if picked:
                penal = inter[np.ix_(rest, picked)].max(axis=1)
            else:
                penal = np.zeros(len(rest))
            score = lam * qsim[rest] - (1 - lam) * penal
            # ties -> smallest vec_id; rest is vec_id-sorted so the
            # first argmax already breaks ties that way
            best = rest[int(np.argmax(score))]
            picked.append(best)
            rest.remove(best)
        return pd.DataFrame({
            "rank": range(1, len(picked) + 1),
            "vec_id": [int(pdf["vec_id"].iloc[i]) for i in picked]})

    return (cand.groupBy("grp")
            .applyInPandas(mmr, "rank int, vec_id bigint"))


@register(
    "f34_variant_json",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                  AS k_mod,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(json_extract_string(props, '$.k')
                            AS BIGINT)) AS BIGINT) AS k_sum
       FROM events GROUP BY k_mod""",
    survey="§2.8 ext (VARIANT semi-structured type — F17/F27 widened)",
    note="semi-structured analytics through Spark 4's VARIANT type: "
         "parse_json(props) parses ONCE into the binary variant "
         "encoding and variant_get extracts typed fields — the "
         "engine-native path that replaces per-access "
         "get_json_object string re-parsing (f17's surface; at 100 "
         "TB, N extractions from one column re-parse the JSON N "
         "times as strings but once as variant, and variant columns "
         "shred into parquet). Oracle mirrors with DuckDB's "
         "json_extract_string + cast; both engines agree on JSON "
         "number parsing for integer payloads. Output is the "
         "bucketed count/sum rollup so the whole extraction path is "
         "hash-checked, not just one row")
def f34_variant_json(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events_f34")
    return spark.sql(
        """SELECT variant_get(parse_json(props), '$.k', 'bigint') % 10
                      AS k_mod,
                  count(*) AS n,
                  sum(variant_get(parse_json(props), '$.k', 'bigint'))
                      AS k_sum
           FROM events_f34 GROUP BY k_mod""")


@register(
    "f35_recursive_hierarchy",
    """WITH RECURSIVE anc(node, a, depth) AS (
         SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
         UNION ALL
         SELECT node, a // 2, depth + 1 FROM anc WHERE a > 1)
       SELECT node, CAST(max(depth) AS BIGINT) AS depth,
              CAST(sum(a) AS BIGINT) AS anc_sum
       FROM anc GROUP BY node""",
    survey="§2.8 ext (recursive CTE — hierarchy walk)",
    note="hierarchical ancestor walk through Spark 4's native WITH "
         "RECURSIVE (the org-chart / BOM-rollup query): every "
         "supplier reports up a synthetic halving chain (parent = "
         "key div 2), and the walk emits each node's depth-to-root "
         "and the exact sum over its ancestor path. UNION ALL "
         "recursion is safe here BY CONSTRUCTION — each node has "
         "exactly one path to the root, so no path multiplication "
         "(the reason g7's BFS over a general graph uses the "
         "frontier+anti-join loop instead: Spark's recursive CTE "
         "does not yet support UNION dedup, and UNION ALL on a "
         "cyclic/dense graph enumerates PATHS, not nodes). Rounds "
         "are log2(max key), integer-exact on both engines (Spark "
         "div / DuckDB //)")
def f35_recursive_hierarchy(spark, sf_dir):
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_f35")
    return spark.sql(
        """WITH RECURSIVE anc(node, a, depth) AS (
             SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT)
             FROM supplier_f35
             UNION ALL
             SELECT node, a div 2, depth + 1 FROM anc WHERE a > 1)
           SELECT node, max(depth) AS depth,
                  CAST(sum(a) AS BIGINT) AS anc_sum
           FROM anc GROUP BY node""")


@register(
    "j28_cdc_apply",
    """WITH feed AS (
         SELECT o_orderkey, o_totalprice + 10 AS o_totalprice,
                o_orderstatus, 'U' AS op, 1 AS seq
         FROM orders WHERE o_orderkey % 5 = 0
         UNION ALL
         SELECT o_orderkey, NULL, NULL, 'D', 2
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey + 200000000, o_totalprice,
                o_orderstatus, 'I', 1
         FROM orders WHERE o_orderkey % 11 = 0),
       latest AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                        ORDER BY seq DESC) AS rn
           FROM feed) WHERE rn = 1)
       SELECT o_orderkey, o_totalprice, o_orderstatus
       FROM orders
       WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
       UNION ALL
       SELECT o_orderkey, o_totalprice, o_orderstatus
       FROM latest WHERE op <> 'D'""",
    survey="§2.3/§3.2 ext (full CDC MERGE — insert/update/DELETE)",
    note="apply an I/U/D change feed to a snapshot (operators/"
         "merge.py:apply_cdc) — the full MERGE the reference's "
         "OUTPUT-$action upsert (J8) lacks a delete branch for, and "
         "the execution half of x3's snapshot_diff (diff derives the "
         "feed, this applies one). The synthetic feed exercises all "
         "three ops AND multi-op compaction: every 35th key gets an "
         "update (seq 1) then a delete (seq 2) in the same batch, and "
         "the Debezium latest-wins rule must keep the DELETE. Plan: "
         "row_number compaction on the (small) feed, one broadcast "
         "anti join against the target, one union — the target never "
         "shuffles, deletes ride the anti join MERGE already pays")
def j28_cdc_apply(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
        apply_cdc,
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    upd = (o.filter(F.col("o_orderkey") % 5 == 0)
           .select("o_orderkey",
                   (F.col("o_totalprice") + 10).alias("o_totalprice"),
                   "o_orderstatus",
                   F.lit("U").alias("op"), F.lit(1).alias("seq")))
    dele = (o.filter(F.col("o_orderkey") % 7 == 0)
            .select("o_orderkey",
                    F.lit(None).cast("double").alias("o_totalprice"),
                    F.lit(None).cast("string").alias("o_orderstatus"),
                    F.lit("D").alias("op"), F.lit(2).alias("seq")))
    ins = (o.filter(F.col("o_orderkey") % 11 == 0)
           .select((F.col("o_orderkey") + 200000000).alias("o_orderkey"),
                   "o_totalprice", "o_orderstatus",
                   F.lit("I").alias("op"), F.lit(1).alias("seq")))
    feed = upd.unionByName(dele).unionByName(ins)
    return apply_cdc(o, feed, "o_orderkey", op_col="op", seq_col="seq")


@register(
    "x14_rowhash_checksum",
    f"""SELECT o_orderkey % 16 AS bucket,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum({md5_mod_sql(
                  "concat_ws(':', o_orderkey, o_orderstatus, "
                  "o_orderdate, o_orderpriority)", 2147483647)})
                   AS BIGINT) AS hash_sum
       FROM orders GROUP BY bucket""",
    survey="§7.5 monitoring ext (order-free table checksum / diff)",
    note="bucketed order-independent table checksum: each row hashes "
         "to a bounded integer via the portable seeded-md5 family "
         "over its key+attribute string, and buckets sum them — the "
         "anti-entropy primitive replication/migration verification "
         "runs on BOTH sides of a copy (two engines, two regions, "
         "pre/post-migration) to find WHICH key range diverged "
         "without moving any data: equal bucket sums ⇒ ranges match "
         "w.h.p., a differing bucket narrows the repair scan 16x "
         "(recurse for binary search). Only integer/string/date "
         "columns feed the hash — float formatting differs across "
         "engines, so doubles verify via the decimal-sum checksums "
         "(s17's pattern) instead. SUM (not XOR) keeps duplicate-row "
         "multiplicity visible; one scan, one combinable aggregate")
def x14_rowhash_checksum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    row = F.concat_ws(":", "o_orderkey", "o_orderstatus",
                      "o_orderdate", "o_orderpriority")
    return (o.groupBy((F.col("o_orderkey") % 16).alias("bucket"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum(md5_mod(row, 2147483647)).cast("bigint")
                 .alias("hash_sum")))


@register(
    "ts4_gap_islands",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                   FROM events),
       grp AS (SELECT user_id, day,
                      day - CAST(row_number() OVER (
                          PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS island
               FROM ud),
       streaks AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len,
                          min(day) AS streak_start
                   FROM grp GROUP BY user_id, island)
       SELECT user_id,
              CAST(max(len) AS BIGINT) AS longest_streak,
              CAST(count(*) AS BIGINT) AS n_streaks,
              min(streak_start) AS first_day
       FROM streaks GROUP BY user_id""",
    survey="§2.7 ext (gaps-and-islands — consecutive-day streaks)",
    note="gaps-and-islands: each user's activity days collapse into "
         "maximal consecutive-day runs via the classic day-minus-"
         "row_number trick (consecutive days share a constant "
         "difference, so the derived 'island' key groups a whole run "
         "in ONE window pass + one aggregate — no self-join, no "
         "iteration), then roll up to longest streak / streak count — "
         "the engagement-streak feature (e2's retention asks 'came "
         "back in week N'; this asks 'how many days IN A ROW'), and "
         "the same shape dedups contiguous ID ranges or finds sensor "
         "outage windows. One shuffle on user_id shared by the window "
         "and both aggregates; date-integer arithmetic is exact on "
         "both engines")
def ts4_gap_islands(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window
    ud = (ev.select("user_id", F.col("ts").cast("date").alias("day"))
          .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    grp = ud.withColumn(
        "island", F.date_sub("day", F.row_number().over(w)))
    streaks = (grp.groupBy("user_id", "island")
               .agg(F.count("*").alias("len"),
                    F.min("day").alias("streak_start")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").alias("longest_streak"),
                 F.count("*").alias("n_streaks"),
                 F.min("streak_start").alias("first_day")))


@register(
    "ext_ngram_novelty",
    """WITH grams AS (
         SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2]))) AS gram
         FROM (SELECT doc_id,
                      list_filter(string_split_regex(lower(trim(text)),
                          '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')
                          AS toks
               FROM documents) d
         WHERE len(toks) >= 3),
       firsts AS (SELECT gram, min(doc_id) AS first_doc
                  FROM grams GROUP BY gram)
       SELECT g.doc_id,
              CAST(count(*) AS BIGINT) AS n_grams,
              CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id)
                   AS BIGINT) AS n_novel
       FROM grams g JOIN firsts f ON g.gram = f.gram
       GROUP BY g.doc_id""",
    survey="§7.5 curation ext (n-gram novelty / corpus contribution)",
    note="per-document novelty: of a doc's DISTINCT 3-grams, how many "
         "first appear at this doc (ingest order = doc_id) — the "
         "marginal-contribution score curation orderings use "
         "(near-zero novelty = the doc adds nothing the corpus "
         "doesn't already have, the D4/SemDeDup intuition at n-gram "
         "granularity, and the streaming form is exactly the "
         "ingest-dedup index question 'have we seen this before'). "
         "Both engines explode distinct trigrams, take min(doc_id) "
         "per gram (one combinable aggregate — the 'first seen' "
         "relation is the same reusable artifact as the inverted "
         "index), and count back per doc. The novelty RATIO derives "
         "client-side from (n_grams, n_novel) — quotient rule. At "
         "100 TB the gram relation shuffles once on the gram key; "
         "doc_id-as-ingest-order generalizes to any monotone "
         "ingest timestamp")
def ext_ngram_novelty(spark, sf_dir):
    # doc_ngrams binds the token array ONCE (the shingles lesson in
    # SCALE.md) and stays in the column API — routing the whitespace
    # class through an F.expr SQL literal adds a second escaping
    # layer that silently mangles \x0b into [x0b].
    # r13 (guide §2.4): the old plan joined the full gram relation back
    # to firsts and re-aggregated every gram row by doc — but n_grams
    # is the map-side SIZE of the doc's distinct-gram array, and
    # n_novel is one count over the firsts relation grouped by
    # first_doc, so the gram relation shuffles ONCE (for firsts)
    # instead of three times. fan_out spreads the single-row-group
    # scan's tokenize/explode across the cores (no-op at scale).
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        doc_gram_counts,
        doc_ngrams,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    docs = fan_out(t(spark, sf_dir, "documents"), "doc_id")
    grams = doc_ngrams(docs, "doc_id", "text")
    per_doc = doc_gram_counts(docs, "doc_id", "text")
    novel = (grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
             .groupBy("first_doc").agg(F.count("*").alias("__n_novel")))
    return (per_doc.join(novel, per_doc["doc_id"] == novel["first_doc"],
                         "left")
            .select("doc_id", "n_grams",
                    F.coalesce("__n_novel", F.lit(0)).cast("bigint")
                    .alias("n_novel")))


_QC_MODELS: dict = {}


@register(
    "ext_quality_train_eval",
    None,
    survey="§7.5 curation ext (quality classifier TRAIN + eval)",
    note="trains the fasttext-shape quality classifier (hashed "
         "bag-of-words -> logistic regression, operators/curation.py:"
         "train_quality_classifier) whose fixed-weight SCORING half "
         "is ext_hashed_linear_score, then evaluates on a held-out "
         "split: the planted signal is token presence ('spark' in "
         "the text => label 1) and the split is the deterministic "
         "md5 gate (doc_id hash % 5 == 0 => test), so the whole "
         "train/eval loop reproduces bit-for-bit across runs. Output "
         "is ONE row of integer counts (n_train, n_test, n_correct); "
         "deliberate rows-only — LBFGS float aggregation order has "
         "no SQL oracle — with an accuracy floor pinned in "
         "tests/test_r6.py. Maintenance-shaped: the fit caches per "
         "(applicationId, sf_dir) like the IVF quantizer so repeated "
         "builds (bench passes, plan audit) pay it once; at 100 TB "
         "the fit runs on a labeled sample offline and the frozen "
         "model broadcast-scores the corpus")
def ext_quality_train_eval(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        score_quality_classifier,
        train_quality_classifier,
    )

    docs = (t(spark, sf_dir, "documents")
            .withColumn("label",
                        F.when(F.array_contains(tokens("text"), "spark"),
                               1.0).otherwise(0.0))
            .withColumn("__is_test",
                        md5_mod(F.col("doc_id").cast("string"), 5) == 0))
    train = docs.filter(~F.col("__is_test"))
    test = docs.filter(F.col("__is_test"))
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    model = _QC_MODELS.get(cache_key)
    if model is None:
        model = train_quality_classifier(train, "text", "label")
        _QC_MODELS[cache_key] = model
    scored = score_quality_classifier(model, test, "doc_id", "text")
    joined = scored.join(test.select("doc_id", "label"), "doc_id")
    return (joined.crossJoin(
        F.broadcast(train.agg(F.count("*").alias("n_train"))))
        .groupBy("n_train")
        .agg(F.count("*").alias("n_test"),
             F.sum(F.when(F.col("prediction") == F.col("label")
                          .cast("bigint"), 1).otherwise(0))
             .cast("bigint").alias("n_correct"))
        .select("n_train", "n_test", "n_correct"))


@register(
    "g9_k_core",
    None,
    survey="§7.5 graph ext (k-core decomposition)",
    note="k-core membership over the bipartite user<->event-bucket "
         "graph (operators/graph.py:k_core, k=8): iteratively peel "
         "nodes of symmetric degree < k to the fixpoint and emit the "
         "survivors with their in-core degree — the densest-region "
         "primitive between components (too coarse) and triangles "
         "(too local), the spam-ring/community-kernel query. Per "
         "round one degree aggregate + two semi joins + one scalar "
         "convergence count (the g6/g7 bounded-driver discipline); "
         "synchronous peeling converges in a handful of rounds. "
         "Deliberate rows-only (iterative fixpoint, no SQL oracle); "
         "pinned against an independent Python peeler in "
         "tests/test_r6.py")
def g9_k_core(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.graph import (
        k_core,
    )
    ev = t(spark, sf_dir, "events")
    edges = ev.select(F.col("user_id").alias("src"),
                      (F.lit(1000) + F.col("event_id") % 50)
                      .alias("dst"))
    return k_core(edges, k=8)


@register(
    "ext_novelty_ingest",
    """WITH grams AS (
         SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2]))) AS gram
         FROM (SELECT doc_id,
                      list_filter(string_split_regex(lower(trim(text)),
                          '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')
                          AS toks
               FROM documents) d
         WHERE len(toks) >= 3),
       firsts AS (SELECT gram, min(doc_id) AS first_doc
                  FROM grams GROUP BY gram)
       SELECT g.doc_id,
              CAST(count(*) AS BIGINT) AS n_grams,
              CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id)
                   AS BIGINT) AS n_novel
       FROM grams g JOIN firsts f ON g.gram = f.gram
       WHERE g.doc_id >= 400
       GROUP BY g.doc_id""",
    survey="§7.5 curation ext (incremental novelty ingest)",
    note="the daily-ingest twin of ext_ngram_novelty (the "
         "minhash_ingest_pairs argument applied to novelty): the "
         "already-scored corpus (doc_id < 400) persists as the "
         "(gram, first_key) first-seen index (operators/curation.py:"
         "novelty_index) and a new batch scores by PROBING it — "
         "batch grams left-join the index plus a within-batch "
         "min-key pass, so shuffled volume is ∝ |batch grams|, never "
         "the corpus (at 100 TB the index is bucketed by gram and "
         "the probe co-locates; novelty_ingest also returns the "
         "index DELTA to append, so the corpus is scanned exactly "
         "once across its lifetime). The incremental path is "
         "EXACTLY the full scorer restricted to batch docs — that "
         "equality IS the oracle (full-corpus firsts, batch-filtered "
         "aggregate), and the replay-in-3-batches equivalence is "
         "pinned in tests/test_r6.py")
def ext_novelty_ingest(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        novelty_index,
        novelty_ingest,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    # fan_out before the per-row-heavy tokenize/gram pass: the
    # single-row-group scan is one task (no-op at scale, see io.py)
    docs = fan_out(t(spark, sf_dir, "documents"), "doc_id")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    idx = novelty_index(corpus)
    scores, _delta = novelty_ingest(batch, idx)
    return scores


@register(
    "ext_dup_span_coverage",
    """WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)),
                    '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS toks
         FROM documents),
       grams AS (
         SELECT doc_id, i AS pos,
                toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
         FROM (SELECT doc_id, toks,
                      unnest(range(1, len(toks) - 1)) AS i
               FROM toks WHERE len(toks) >= 3)),
       shared AS (SELECT gram FROM grams
                  GROUP BY gram
                  HAVING count(DISTINCT doc_id) > 1),
       covered AS (
         SELECT DISTINCT g.doc_id, g.pos + o.o AS cpos
         FROM grams g JOIN shared s ON g.gram = s.gram
         CROSS JOIN (SELECT unnest([0, 1, 2]) AS o) o),
       n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
             FROM toks WHERE len(toks) >= 3)
       SELECT n.doc_id, n.n_tokens,
              CAST(count(c.cpos) AS BIGINT) AS n_dup_covered
       FROM n LEFT JOIN covered c ON n.doc_id = c.doc_id
       GROUP BY n.doc_id, n.n_tokens""",
    survey="§7.5 dedup ext (cross-document duplicated-span coverage)",
    note="per-document CROSS-corpus duplicated-span coverage — the "
         "token-granular exact-substring signal (the RefinedWeb / "
         "deduplicate-text-datasets idea expressed relationally): a "
         "token position counts as duplicated if ANY 3-gram covering "
         "it also occurs in another document, so (n_dup_covered / "
         "n_tokens) is the fraction of the doc that is boilerplate "
         "shared with the rest of the corpus — the removal or "
         "down-weighting signal doc-level dedup (exact/MinHash) "
         "misses when only a paragraph is copied, and "
         "ext_dup_ngram_fraction (WITHIN-doc repetition) cannot see "
         "at all. Plan: positional 3-grams (posexplode), the shared "
         "relation via one HAVING count(distinct doc)>1 aggregate "
         "(the inverted-index shuffle), explode each colliding start "
         "to its 3 covered positions, distinct, count per doc — all "
         "equi-joins on the gram/doc keys, never pairwise across "
         "docs, so cost is gram-relation-sized at any corpus scale. "
         "The ratio derives client-side (quotient rule)")
def ext_dup_span_coverage(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    bound = (docs.select("doc_id", tokens("text").alias("toks"))
             .filter(F.size("toks") >= 3))
    grams = bound.select(
        "doc_id", F.size("toks").alias("n_tokens"),
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("toks"), i + 1, 3))))
        .alias("pos", "gram"))
    shared = (grams.groupBy("gram")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .filter(F.col("nd") > 1).select("gram"))
    covered = (grams.join(shared, "gram")
               .select("doc_id",
                       F.explode(F.array(F.col("pos"), F.col("pos") + 1,
                                         F.col("pos") + 2)).alias("cpos"))
               .distinct())
    n = bound.select("doc_id", F.size("toks").cast("bigint")
                     .alias("n_tokens"))
    cov = covered.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_covered"))
    return (n.join(cov, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_dup_covered", F.lit(0))
                    .cast("bigint").alias("n_dup_covered")))
