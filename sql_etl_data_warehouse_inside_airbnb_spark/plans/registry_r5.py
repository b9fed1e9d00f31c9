"""Round-5 additions: position-based multi-touch attribution,
distribution-drift monitoring (PSI bins), and hybrid-retrieval rank
fusion (RRF).

Three gaps the r1-r4 surface left open: e6 credits conversions to ONE
touch (last-touch) — position-based models split credit fractionally,
done here in exact integer basis points; the x-report family profiles
one snapshot — drift monitoring compares two; and the retrieval family
ranks with one scorer at a time — production search fuses several, the
standard calibration-free combinator being Reciprocal Rank Fusion.

All three stay integer-exact in every compared column (the registry
quotient rule): attribution credit is basis points with deterministic
remainder placement, drift emits bin COUNTS (the PSI scalar derives
client-side via operators/quality.py:psi_from_counts — its log/ratio
arithmetic is exactly the cross-engine trap), and RRF contributions
are ``scale DIV (k + rank)`` integer reciprocals.

Registered AFTER the round-5 adjudication window (the standing
discipline — full_registry parks in-round additions below the
position-50 boundary; they front-load round 6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    position_attribution_bp,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
    drift_bin_counts,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
    keyword_search,
    rank_list,
    rrf_fuse,
    tokens,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    DBL_MAX,
    finite_sql,
    register,
    t,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_ext import (
    _SHINGLE_SQL,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_search import (
    _TOK_SQL,
)


@register(
    "e7_position_attribution",
    """WITH ordered AS (
         SELECT user_id, event_id, ts, event_type,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
         FROM events),
       conv AS (
         SELECT user_id, min(rn) AS conv_rn
         FROM ordered WHERE event_type = 'purchase' GROUP BY user_id),
       touches AS (
         SELECT o.user_id, o.event_type,
                row_number() OVER (PARTITION BY o.user_id
                                   ORDER BY o.rn) AS tidx,
                count(*) OVER (PARTITION BY o.user_id) AS m
         FROM ordered o JOIN conv c ON o.user_id = c.user_id
         WHERE o.rn < c.conv_rn AND o.event_type <> 'purchase'),
       credited AS (
         SELECT user_id, event_type,
                CASE WHEN m = 1 THEN 10000
                     WHEN m = 2 AND tidx = 1 THEN 5000
                     WHEN m = 2 THEN 5000
                     WHEN tidx = 1 THEN 4000
                     WHEN tidx = m THEN 4000
                     ELSE 2000 // (m - 2)
                          + CASE WHEN tidx - 1 <= 2000 % (m - 2)
                                 THEN 1 ELSE 0 END
                END AS bp
         FROM touches)
       SELECT event_type AS channel,
              CAST(sum(bp) AS BIGINT) AS total_bp,
              CAST(count(*) AS BIGINT) AS n_touches,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM credited GROUP BY channel""",
    survey="§7.5 product-analytics ext (multi-touch attribution)",
    note="U-shaped (position-based) multi-touch attribution in exact "
         "integer basis points (operators/events.py:"
         "position_attribution_bp) — the fractional-credit sibling of "
         "e6's last-touch: each converting user's 10000 bp splits "
         "40/20/40 over first/middles/last of the touches before "
         "their FIRST conversion, middle remainder one bp to the "
         "earliest middles, so per-user credit sums to exactly 10000 "
         "(invariant asserted in tests/test_events_r5.py). Rationals "
         "would hit the cross-engine quotient-rounding trap; basis "
         "points keep the whole model hash-comparable. One shuffle "
         "on user_id (rank window, touch window, and count share the "
         "partitioning), then a tiny channel rollup")
def e7_position_attribution(spark, sf_dir):
    return position_attribution_bp(t(spark, sf_dir, "events"), "purchase")


@register(
    "x11_drift_psi",
    f"""SELECT event_type,
              CASE WHEN value >= 500 THEN 11
                   WHEN value < 0 THEN 0
                   ELSE 1 + CAST(floor(value / 50) AS BIGINT)
              END AS value_bucket,
              CAST(count(*) FILTER (WHERE ts <  TIMESTAMP '2024-01-16')
                   AS BIGINT) AS n_base,
              CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16')
                   AS BIGINT) AS n_cur
       FROM events
       WHERE value IS NULL OR {finite_sql('value')}
       GROUP BY event_type, value_bucket""",
    survey="§7.5 monitoring ext (distribution drift / PSI)",
    note="distribution-drift bin counts between a baseline and a "
         "current snapshot slice (operators/quality.py:"
         "drift_bin_counts), binned on event_type x width_bucket("
         "value, 0, 500, 10) — the input relation of the PSI / "
         "chi-square drift monitors a corpus pipeline runs between "
         "ingests. The oracle's closed-form CASE carries an explicit "
         "below-range branch (value < 0 -> 0) to match width_bucket "
         "for any input domain, not just the current [0, 560] one; "
         "both sides bin finite values PLUS the NULL bucket and drop "
         "only NaN/±Inf (r12 hostile finding: Spark width_bucket(NaN) "
         "is NULL where the CASE lands NaN above-range — "
         "cross-engine-undefined, while the NULL bucket is consistent "
         "on both engines and a feed going NULL is drift signal; "
         "identity on finite data, non-finite RATES belong to a14's "
         "profile). "
         "Counts are integer-exact conditional sums in ONE "
         "scan + one shuffle on the bin key (never two jobs diffed "
         "driver-side); the PSI scalar itself is log-of-quotient "
         "arithmetic — the cross-engine rounding trap — so it "
         "derives client-side (quality.py:psi_from_counts, pinned "
         "against hand-computed PSI in tests/test_events_r5.py). "
         "width_bucket mirrors via the f29 closed-form rewrite "
         "(DuckDB has none); boundary-exact on both engines. "
         "Streaming twin: streaming/monitor.py splits the relation "
         "into a frozen baseline + running stream counts (state = "
         "bin cardinality) with stream==batch pinned in "
         "tests/test_streaming_monitor.py")
def x11_drift_psi(spark, sf_dir):
    # finite values only (r12 hostile finding): Spark's width_bucket
    # maps NaN to NULL where the oracle's closed-form CASE lands it in
    # the above-range bucket — cross-engine-undefined, so the binned
    # relation keeps finite doubles AND NULLs (the NULL bucket was
    # always cross-engine-consistent and IS drift signal — a feed
    # going NULL must move the monitor; post-review fix) and drops
    # only NaN/±Inf (identity on finite data; track non-finite RATES
    # with a14's profile, not a drift bin)
    ev = (t(spark, sf_dir, "events")
          .filter(F.col("value").isNull()
                  | F.col("value").between(-DBL_MAX, DBL_MAX)))
    return drift_bin_counts(
        ev,
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
        [F.col("event_type"),
         F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
         .cast("bigint").alias("value_bucket")])


@register(
    "ext_hybrid_rrf",
    f"""WITH tok AS ({_TOK_SQL} AND tt.term IN ('spark','window','merge')),
       tf AS (SELECT doc_id, term, count(*) AS tf
              FROM tok GROUP BY doc_id, term),
       kw AS (SELECT doc_id, sum(tf) AS score
              FROM tf GROUP BY doc_id
              HAVING count(DISTINCT term) = 3),
       lex AS (SELECT doc_id,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rank
               FROM kw QUALIFY rank <= 20),
       anyterm AS (SELECT DISTINCT doc_id FROM tok),
       prior AS (SELECT d.doc_id,
                        row_number() OVER (ORDER BY d.n_chars DESC,
                                           d.doc_id) AS rank
                 FROM documents d JOIN anyterm a USING (doc_id)
                 QUALIFY rank <= 20),
       contrib AS (
         SELECT doc_id, 1000000 // (60 + rank) AS c FROM lex
         UNION ALL
         SELECT doc_id, 1000000 // (60 + rank) AS c FROM prior),
       fused AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_milli,
                        CAST(count(*) AS BIGINT) AS n_lists
                 FROM contrib GROUP BY doc_id)
       SELECT doc_id, rrf_milli, n_lists,
              CAST(row_number() OVER (ORDER BY rrf_milli DESC, doc_id)
                   AS INT) AS fused_rank
       FROM fused QUALIFY fused_rank <= 10""",
    survey="§7.5 retrieval ext (hybrid rank fusion)",
    note="Reciprocal Rank Fusion (Cormack et al., SIGIR'09; "
         "operators/search.py:rrf_fuse) of two heterogeneous rankers "
         "— the conjunctive lexical top-20 (ext_keyword_search's "
         "integer Σtf ranking) and a document-quality prior (n_chars "
         "desc over the any-term recall set) — the standard "
         "calibration-free hybrid-search combinator (swap the prior "
         "for the int8/PQ ANN ranker and the plan is unchanged). "
         "Contributions are scale DIV (k+rank) integer reciprocals, "
         "so the fused ordering is bit-exact cross-engine; fusion "
         "cost is Σ|candidate lists| (union + one hash agg + one "
         "bounded row_number) — the corpus is touched only by the "
         "retrievers themselves, never by the fusion")
def ext_hybrid_rrf(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    terms = ["spark", "window", "merge"]
    kw = keyword_search(docs, "doc_id", "text", terms, k=20)
    lexical = rank_list(kw, "doc_id",
                        [F.desc("score"), F.col("doc_id")], 20)
    recall = docs.filter(F.arrays_overlap(
        tokens("text"), F.array(*[F.lit(x) for x in terms])))
    prior = rank_list(recall.select("doc_id", "n_chars"), "doc_id",
                      [F.desc("n_chars"), F.col("doc_id")], 20)
    return rrf_fuse([lexical, prior], "doc_id", k=60, topk=10)


@register(
    "ext_dedup_ingest_minhash",
    f"""WITH base AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       tagged AS (
         SELECT doc_id, text, 0 AS src FROM base
         UNION ALL
         SELECT doc_id + 10000000, text || ' mutation', 1 FROM base
         UNION ALL
         SELECT doc_id + 20000000, text || ' mutation two', 1 FROM base),
       s AS (
         SELECT doc_id, src, sh FROM (
           SELECT doc_id, src, {_SHINGLE_SQL} AS sh FROM tagged) d
         WHERE len(sh) > 0),
       sig AS (
         SELECT doc_id, src,
                list_min(list_transform(sh, g -> md5('mh0:' || g))) AS s0,
                list_min(list_transform(sh, g -> md5('mh1:' || g))) AS s1,
                list_min(list_transform(sh, g -> md5('mh2:' || g))) AS s2,
                list_min(list_transform(sh, g -> md5('mh3:' || g))) AS s3,
                list_min(list_transform(sh, g -> md5('mh4:' || g))) AS s4,
                list_min(list_transform(sh, g -> md5('mh5:' || g))) AS s5,
                list_min(list_transform(sh, g -> md5('mh6:' || g))) AS s6,
                list_min(list_transform(sh, g -> md5('mh7:' || g))) AS s7
         FROM s),
       bands AS (
         SELECT doc_id, src,
                md5(s0 || '|' || s1) AS b0, md5(s2 || '|' || s3) AS b1,
                md5(s4 || '|' || s5) AS b2, md5(s6 || '|' || s7) AS b3
         FROM sig),
       long AS (
         SELECT doc_id, src, 0 AS band_idx, b0 AS band_key FROM bands
         UNION ALL SELECT doc_id, src, 1, b1 FROM bands
         UNION ALL SELECT doc_id, src, 2, b2 FROM bands
         UNION ALL SELECT doc_id, src, 3, b3 FROM bands),
       cand AS (
         SELECT DISTINCT a.doc_id AS key_new, b.doc_id AS key_dup
         FROM long a JOIN long b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          AND a.src = 1 AND (b.src = 0 OR b.doc_id < a.doc_id)),
       scored AS (
         SELECT c.key_new, c.key_dup,
                len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS inter_n,
                len(sa.sh) + len(sb.sh)
                  - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS union_n
         FROM cand c
         JOIN s sa ON sa.doc_id = c.key_new
         JOIN s sb ON sb.doc_id = c.key_dup)
       SELECT key_new, key_dup,
              CAST(inter_n AS BIGINT) AS inter_n,
              CAST(union_n AS BIGINT) AS union_n
       FROM scored WHERE inter_n * 2 >= 1 * union_n""",
    survey="§7.5 dedup ext (incremental ingest)",
    note="incremental MinHash ingest dedup (operators/dedup.py:"
         "minhash_index + minhash_ingest_pairs): the corpus is signed "
         "ONCE into a persistable band/shingle index; a new batch "
         "(two planted mutation families over the 10% base corpus) "
         "dedups against index ∪ batch via the band equi-join, so "
         "the shuffled volume is ∝ |batch| + matching buckets, never "
         "the corpus — the daily-ingest shape where re-running the "
         "batch self-join would re-sign 1000x the delta. Same "
         "seeded-md5 family as ext_dedup_minhash_banded (index "
         "compatibility by construction); within-batch pairs orient "
         "key_dup < key_new, corpus partners pair with every "
         "matching batch doc; integer (inter_n, union_n) at the "
         "t=1/2 exact re-check keeps the full pipeline "
         "value-hash-checkable")
def ext_dedup_ingest_minhash(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        minhash_index,
        minhash_ingest_pairs,
    )
    base = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text"))
    batch = (base.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat("text", F.lit(" mutation")).alias("text"))
        .unionByName(base.select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat("text", F.lit(" mutation two")).alias("text"))))
    bands, sh = minhash_index(base)
    return minhash_ingest_pairs(batch, bands, sh)


@register(
    "j26_asof_tolerance",
    """SELECT e.event_id, e.user_id,
              CASE WHEN p.ts IS NOT NULL
                     AND epoch_us(e.ts) - epoch_us(p.ts) <= 1800000000
                   THEN p.pid END AS prior_purchase_id
       FROM (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'click') e
       ASOF LEFT JOIN
            (SELECT min(event_id) AS pid, user_id, ts FROM events
             WHERE event_type = 'purchase' GROUP BY user_id, ts) p
       ON e.user_id = p.user_id AND e.ts >= p.ts""",
    survey="§2.3 ext (as-of join with tolerance)",
    note="bounded-staleness as-of join (operators/temporal.py:"
         "asof_join(tolerance_us=...), pandas merge_asof tolerance / "
         "the feature-store point-in-time rule): each click takes the "
         "user's latest prior purchase ONLY if it is at most 30 min "
         "old — a quote staler than the bound must not enrich the "
         "row. Purchases are pre-deduped per (user_id, ts) with a "
         "min(event_id) winner on BOTH sides, as asof_join's "
         "right-uniqueness contract prescribes — otherwise equal-ts "
         "duplicates make the carried pid engine-arbitrary. The "
         "carry is unchanged (union + ONE window pass, one "
         "shuffle, no join node); staleness nulls the carried struct "
         "per-row with an exact unix_micros diff. Oracle: DuckDB "
         "ASOF LEFT JOIN + the same integer staleness CASE")
def j26_asof_tolerance(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.temporal import (
        asof_join,
    )
    ev = t(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    # asof_join's contract requires right-side (on, ts) uniqueness —
    # pre-dedup equal-ts purchases with a deterministic winner
    # (min event_id) so the carried pid is well-defined on both
    # engines even if the generator ever emits ts ties
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.min("event_id").alias("prior_purchase_id")))
    return (asof_join(clicks, purchases, on="user_id",
                      left_time="ts", right_time="ts",
                      value_cols=["prior_purchase_id"],
                      tolerance_us=1_800_000_000)
            .select("event_id", "user_id", "prior_purchase_id"))


_DECILE_CASE = """CASE
         WHEN value IS NULL THEN CAST(NULL AS BIGINT)
         WHEN value <= q1 THEN 1 WHEN value <= q2 THEN 2
         WHEN value <= q3 THEN 3 WHEN value <= q4 THEN 4
         WHEN value <= q5 THEN 5 WHEN value <= q6 THEN 6
         WHEN value <= q7 THEN 7 WHEN value <= q8 THEN 8
         WHEN value <= q9 THEN 9 ELSE 10 END"""


@register(
    "x12_drift_equidepth",
    f"""WITH b AS (SELECT
           quantile_disc(value, 0.1) AS q1, quantile_disc(value, 0.2) AS q2,
           quantile_disc(value, 0.3) AS q3, quantile_disc(value, 0.4) AS q4,
           quantile_disc(value, 0.5) AS q5, quantile_disc(value, 0.6) AS q6,
           quantile_disc(value, 0.7) AS q7, quantile_disc(value, 0.8) AS q8,
           quantile_disc(value, 0.9) AS q9
         FROM events WHERE ts < TIMESTAMP '2024-01-16'
           AND {finite_sql('value')})
       SELECT bucket,
              CAST(count(*) FILTER (WHERE ts <  TIMESTAMP '2024-01-16')
                   AS BIGINT) AS n_base,
              CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16')
                   AS BIGINT) AS n_cur
       FROM (SELECT ts, {_DECILE_CASE} AS bucket
             FROM events CROSS JOIN b)
       GROUP BY bucket""",
    survey="§7.5 monitoring ext (decile PSI — baseline-derived cut)",
    note="equi-depth drift bins — the standard PSI practice: decile "
         "boundaries computed from the BASELINE slice only "
         "(percentile_disc VALUES — actual rows, exact cross-engine, "
         "the a35 idiom), broadcast as one row, then BOTH slices "
         "bucketed by the same cut in one scan of conditional counts. "
         "A baseline-derived cut is what makes PSI comparable across "
         "runs (fixed-width bins — x11 — shift meaning when the range "
         "drifts); under no drift every decile holds ~10% of current "
         "rows, and psi_from_counts turns the report into the scalar "
         "client-side. The cut aggregate reads FINITE baseline values "
         "only (r12 hostile finding: NaN inside the percentile input "
         "moves the deciles differently per engine — the f33 guard; "
         "identity on finite data); non-finite rows still COUNT, "
         "landing in the edge buckets through the CASE (NaN/+Inf > "
         "q9 → 10, -Inf ≤ q1 → 1, identical on both engines), and "
         "NULL values form their own NULL bucket (explicit first "
         "branch — aligned with x11's width_bucket(NULL) semantics "
         "rather than silently counting NULLs as top-decile mass). "
         "1-row "
         "broadcast cross join (allowlisted pattern), no global sort "
         "anywhere")
def x12_drift_equidepth(spark, sf_dir):
    t(spark, sf_dir, "events").createOrReplaceTempView("events_x12")
    qs = ", ".join(
        f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY value) AS q{i}"
        for i in range(1, 10))
    return spark.sql(
        f"""WITH b AS (SELECT {qs} FROM events_x12
                       WHERE ts < TIMESTAMP '2024-01-16'
                         AND {finite_sql('value')})
            SELECT bucket,
                   CAST(count(*) FILTER (WHERE ts < TIMESTAMP
                        '2024-01-16') AS BIGINT) AS n_base,
                   CAST(count(*) FILTER (WHERE ts >= TIMESTAMP
                        '2024-01-16') AS BIGINT) AS n_cur
            FROM (SELECT ts, {_DECILE_CASE} AS bucket
                  FROM events_x12 CROSS JOIN b)
            GROUP BY bucket""")
