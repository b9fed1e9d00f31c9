"""Round-3 registry entries: corpus curation (Gopher / C4 quality
rules, trigram-LM familiarity, Bloom decontamination — see
operators/curation.py), the int8-quantized ANN serving path, the
T-SQL dialect execution probe, and the multimodal feature-ANN
capstone.

The synthetic documents are punctuation- and newline-free word salad,
so the C4 entry SYNTHESIZES sentence structure deterministically from
(doc_id, token stream) — the line_dedup / multimodal fixture pattern —
and its oracle predicts the parser's outputs ARITHMETICALLY from the
same recipe: any parsing bug (boundary handling, gluing of
unterminated fragments, injection placement) breaks the hash without
the oracle ever running the parser.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    bloom_decontaminate,
    c4_sentence_filter,
    gopher_signals,
    trigram_familiarity,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


@register(
    "ext_gopher_quality",
    """SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(len(regexp_replace(trim(text), '\\s+', '', 'g'))
                   AS BIGINT) AS sum_word_chars,
              CAST(len(list_filter(toks,
                   x -> list_contains(['the','a','of','and','to','in'],
                                      lower(x)))) AS BIGINT)
                  AS n_stopwords,
              (len(toks) BETWEEN 30 AND 80
               AND len(regexp_replace(trim(text), '\\s+', '', 'g'))
                   >= 3 * len(toks)
               AND len(regexp_replace(trim(text), '\\s+', '', 'g'))
                   <= 10 * len(toks)
               AND len(list_filter(toks,
                   x -> list_contains(['the','a','of','and','to','in'],
                                      lower(x)))) >= 2) AS keep
       FROM (SELECT doc_id, text,
                    -- '' splits to [''] (one phantom token) in DuckDB;
                    -- the operator's _tokens yields [] — guard to match
                    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                         ELSE string_split_regex(trim(text), '\\s+')
                    END AS toks
             FROM documents)""",
    survey="§7.5 text quality (Gopher rules, Rae et al. 2021 A1.1)",
    note="Gopher document-quality rules as one stateless projection "
         "(operators/curation.py:gopher_signals): word-count bounds "
         "[30,80], mean word length in [3,10] tested as the exact "
         "integer rescaling 3n <= chars <= 10n (never a quotient), "
         ">= 2 stopword hits. 295/500 docs pass the count bound and "
         "388 the stopword bound at sf0.01, so keep and drop are "
         "both populated. No shuffle, no UDF — at 100 TB this rides "
         "whatever scan the pipeline already does")
def ext_gopher_quality(spark, sf_dir):
    return gopher_signals(t(spark, sf_dir, "documents"), "doc_id", "text",
                          min_words=30, max_words=80)


# C4 synthetic-structure recipe, shared by builder and oracle:
# sentences of 12 tokens; sentence i gets a terminal '.' iff
# (doc_id + i) % 3 != 0; docs with doc_id%17==0 get a '{ code }.'
# sentence PREPENDED, doc_id%23==0 a 'Lorem ipsum dolor.' sentence.
_C4_ORACLE = """
WITH base AS (
  SELECT doc_id,
         -- empty/whitespace text has ZERO tokens (string_split_regex
         -- of '' yields [''], which would count 1) — mirrors the
         -- builder's empty guard
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
             AS n_tok
  FROM documents),
 shaped AS (
  SELECT doc_id,
         (n_tok + 11) // 12 AS n_sent,
         CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END
         + CASE WHEN doc_id % 23 = 0 THEN 1 ELSE 0 END AS inj
  FROM base),
 counted AS (
  SELECT doc_id, n_sent, inj,
         -- #{i in [0,n_sent): (doc_id+i)%3==0}: i ≡ -doc_id (mod 3)
         greatest(0, (n_sent - ((3 - doc_id % 3) % 3) + 2) // 3)
             AS unterm,
         -- no body -> no last sentence to leave unterminated
         CASE WHEN n_sent > 0 AND (doc_id + n_sent - 1) % 3 = 0
              THEN 1 ELSE 0 END AS last_unterm
  FROM shaped)
SELECT doc_id,
       CAST(inj + (n_sent - unterm) + last_unterm AS BIGINT)
           AS n_sentences,
       CAST(inj + (n_sent - unterm) AS BIGINT) AS n_kept_sentences,
       doc_id % 17 = 0 AS has_curly,
       doc_id % 23 = 0 AS has_lorem,
       (doc_id % 17 <> 0 AND doc_id % 23 <> 0
        AND inj + (n_sent - unterm) >= 3) AS keep
FROM counted
"""


@register(
    "ext_c4_filters",
    _C4_ORACLE,
    survey="§7.5 text quality (C4 page filters, Raffel et al. 2020 §2.2)",
    note="C4 page-level filters (operators/curation.py:"
         "c4_sentence_filter): keep sentences ending in terminal "
         "punctuation, drop pages with curly braces / 'lorem ipsum' / "
         "< 3 kept sentences. Structure is synthesized "
         "deterministically (12-token sentences, every third "
         "unterminated, contaminant sentences prepended by doc_id "
         "rule) and the document REALLY parsed back — regexp "
         "boundary split, unterminated fragments gluing into the "
         "next terminal exactly like C4's retained-line rule; the "
         "oracle predicts every output arithmetically from the "
         "recipe, so a parser bug (not an oracle copy of it) breaks "
         "the hash. Stateless projection, no shuffle")
def ext_c4_filters(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    raw = F.trim(F.col("text"))

    # tokens bound ONCE (the shingles() trick): referencing the split
    # inside the sentence lambda would re-tokenize per sentence —
    # O(tokens^2) per doc; empty/whitespace text -> zero tokens, zero
    # sentences (matching the oracle's CASE guard)
    def body(toks):
        n_sent = F.ceil(F.size(toks) / F.lit(12)).cast("int")
        sents = F.when(
            F.size(toks) == 0, F.array().cast("array<string>")
        ).otherwise(F.transform(
            F.sequence(F.lit(0), n_sent - 1),
            lambda i: F.concat(
                F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
                F.when((d + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")))))
        return F.array_join(sents, " ")

    toks0 = F.when(raw == "", F.array().cast("array<string>")) \
             .otherwise(F.split(raw, r"\s+", -1))
    built = F.element_at(F.transform(F.array(toks0), body), 1)
    prefix = F.concat(
        F.when(d % 17 == 0, F.lit("{ code }. ")).otherwise(F.lit("")),
        F.when(d % 23 == 0, F.lit("Lorem ipsum dolor. "))
         .otherwise(F.lit("")))
    structured = docs.select(
        "doc_id", F.concat(prefix, built).alias("structured"))
    return c4_sentence_filter(structured, "doc_id", "structured")


@register(
    "ext_trigram_familiarity",
    """WITH normed AS (
         SELECT doc_id,
                lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                    AS norm
         FROM documents),
       tri AS (
         SELECT doc_id, g.tg
         FROM normed, LATERAL unnest(
           list_transform(range(1, len(norm) - 1),
                          i -> substr(norm, i, 3))) AS g(tg)
         WHERE len(norm) >= 3),
       model AS (SELECT tg, count(*) AS c FROM tri GROUP BY tg)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_trigrams,
              CAST(sum(c) AS BIGINT) AS familiarity_sum,
              CAST(min(c) AS BIGINT) AS rarest_count
       FROM tri JOIN model USING (tg)
       GROUP BY doc_id""",
    survey="§7.5 text quality (corpus-LM familiarity, CCNet-style)",
    note="character-trigram corpus LM (operators/curation.py:"
         "trigram_familiarity): one explode+groupBy trains the count "
         "model, one join+re-aggregate scores every document — the "
         "integer-exact core of CCNet's LM-perplexity signal. The "
         "compared columns are occurrence counts and count-sums "
         "(exact); -avg log p derives from them client-side because "
         "log+division round differently across engines. At 100 TB "
         "the trigram model is a few GB -> broadcast; scoring stays "
         "linear, no pairwise step")
def ext_trigram_familiarity(spark, sf_dir):
    return trigram_familiarity(
        t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "ext_decontaminate_bloom", None,
    survey="§7.5 decontamination (Bloom prefilter scale path)",
    note="Bloom-bitmap decontamination prefilter (operators/"
         "curation.py:bloom_decontaminate): same benchmark set as "
         "ext_decontaminate (doc_id%17==0 docs' 5-gram shingles), "
         "but membership tests run against a 128 KiB bit array "
         "(xxhash64 k=3, m=2^20) broadcast as a literal map instead "
         "of a semi join against the full shingle set. No false "
         "negatives BY CONSTRUCTION (flagged ⊇ exactly-contaminated "
         "— asserted against the exact join in tests/"
         "test_curation.py); false positives re-check downstream. "
         "rows-only: xxhash64 is engine-specific, so the flag set "
         "has no cross-engine oracle — the exact-join containment "
         "IS the testable contract")
def ext_decontaminate_bloom(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    return bloom_decontaminate(docs, bench, "doc_id", "text", n=5)


@register(
    "ext_ann_quantized_topk",
    """WITH flat AS (
         SELECT vec_id,
                generate_subscripts(embedding, 1) AS pos,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM embeddings),
       stats AS (
         SELECT pos, min(x) AS mn, max(x) AS mx FROM flat GROUP BY pos),
       q AS (
         SELECT flat.vec_id, flat.pos,
                CAST(CASE WHEN s.mx = s.mn THEN 0
                          ELSE floor((flat.x - s.mn) * 255.0
                                     / (s.mx - s.mn))
                     END AS BIGINT) - 128 AS c
         FROM flat JOIN stats s USING (pos)),
       qv AS (SELECT pos, c AS qc FROM q WHERE vec_id = 0),
       scored AS (
         SELECT q.vec_id, sum(q.c * qv.qc) AS qdot
         FROM q JOIN qv USING (pos)
         WHERE q.vec_id <> 0
         GROUP BY q.vec_id)
       SELECT vec_id, CAST(qdot AS BIGINT) AS qdot,
              CAST(row_number() OVER (ORDER BY qdot DESC, vec_id) AS INT)
                  AS rank
       FROM scored ORDER BY qdot DESC, vec_id LIMIT 5""",
    survey="§7.5 similarity (quantized serving path)",
    note="ANN over int8-quantized codes: per-dimension floor-affine "
         "codes (ext_embedding_quantize's scheme over ALL 64 dims), "
         "centered to [-128,127], scored by INTEGER dot product — "
         "bit-exact across engines, no float accumulation anywhere. "
         "The flat (vec_id,pos,code) layout is the late-"
         "materialization columnar index scan: the query vector "
         "broadcasts as 64 rows, scoring is one equi-join on pos + "
         "one map-side-combinable sum groupBy on vec_id, top-k is "
         "TakeOrderedAndProject. 4x less memory traffic than fp32 "
         "brute force; exact fp32 re-rank of the short candidate "
         "list (ext_ann_brute_topk) restores full precision — the "
         "standard two-stage quantized serving design")
def ext_ann_quantized_topk(spark, sf_dir):
    flat = (t(spark, sf_dir, "embeddings")
            .select("vec_id", F.posexplode("embedding").alias("pos0", "x"))
            .select("vec_id", (F.col("pos0") + 1).alias("pos"),
                    F.col("x").cast("double").alias("x")))
    stats = flat.groupBy("pos").agg(F.min("x").alias("mn"),
                                    F.max("x").alias("mx"))
    code = (F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(F.floor((F.col("x") - F.col("mn")) * 255.0
                               / (F.col("mx") - F.col("mn"))))
            .cast("bigint") - 128)
    q = (flat.join(F.broadcast(stats), "pos")
         .select("vec_id", "pos", code.alias("c")))
    qv = (q.filter(F.col("vec_id") == 0)
          .select("pos", F.col("c").alias("qc")))
    return (q.filter(F.col("vec_id") != 0)
            .join(F.broadcast(qv), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("c") * F.col("qc")).alias("qdot"))
            .orderBy(F.desc("qdot"), "vec_id")
            .limit(5)
            .select("vec_id", "qdot",
                    F.row_number().over(
                        Window.orderBy(F.desc("qdot"), "vec_id"))
                    .cast("int").alias("rank")))


@register(
    "tsql_dialect_rollup",
    """SELECT l_suppkey,
              CAST(date_trunc('week', CAST(l_shipdate AS DATE)
                              + INTERVAL 1 DAY) AS DATE) AS week_start,
              CAST(count(*) AS BIGINT) AS n
       FROM lineitem
       GROUP BY 1, 2
       ORDER BY n DESC, l_suppkey, week_start
       LIMIT 10""",
    survey="§3 SQL surface (T-SQL dialect shim)",
    note="the reference user's OWN dialect running end-to-end: a "
         "T-SQL statement using the exact idioms of the reference's "
         "SQL files — SELECT TOP, CONVERT(DATE, ...), and the "
         "DATEADD(wk, DATEDIFF(wk, 0, d), 0) week truncation "
         "(sql/data/04_load_calendar.sql:28) — is translated by "
         "functions/tsql.py:tsql_to_spark_sql and executed through "
         "the normal Catalyst path. The oracle is the ANSI week-trunc "
         "formulation, so the hash certifies the shim preserved "
         "T-SQL's Sunday->next-Monday boundary semantics, not just "
         "that it parsed. Translation is compile-time string work — "
         "zero execution-time cost")
def tsql_dialect_rollup(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.tsql import (
        run_tsql,
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return run_tsql(spark, """
        SELECT TOP 10 l_suppkey,
               DATEADD(wk, DATEDIFF(wk, 0, CONVERT(DATE, l_shipdate)), 0)
                   AS week_start,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_suppkey,
                 DATEADD(wk, DATEDIFF(wk, 0, CONVERT(DATE, l_shipdate)), 0)
        ORDER BY n DESC, l_suppkey, week_start
    """)


@register(
    "ext_multimodal_embed_ann",
    """WITH feats AS (
         SELECT doc_id AS media_id,
                doc_id % 3 AS fmt_code,
                CAST(doc_id % 1000 + 1 AS BIGINT) AS width,
                CAST(n_chars % 800 + 1 AS BIGINT) AS height,
                CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 23
                          ELSE 13 END AS BIGINT) AS n_bytes
         FROM documents),
       q AS (SELECT * FROM feats WHERE media_id = 0),
       scored AS (
         SELECT f.media_id,
                CAST(abs(f.width - q.width) + abs(f.height - q.height)
                     + abs(f.n_bytes - q.n_bytes)
                     + CASE WHEN f.fmt_code <> q.fmt_code
                            THEN 10000 ELSE 0 END AS BIGINT) AS l1_dist
         FROM feats f, q WHERE f.media_id <> 0)
       SELECT media_id, l1_dist,
              CAST(row_number() OVER (ORDER BY l1_dist, media_id) AS INT)
                  AS rank
       FROM scored ORDER BY l1_dist, media_id LIMIT 10""",
    survey="§7.5 multimodal x similarity (media feature ANN)",
    note="the multimodal-to-similarity capstone: synthesized image "
         "payloads are REALLY parsed back (mapInPandas header decode, "
         "the ext_multimodal_image_meta stage) into an integer "
         "feature vector (format, width, height, n_bytes), then "
         "nearest-neighbor search runs on L1 distance to a query "
         "image with a format-mismatch penalty — the decode -> "
         "featurize -> index -> retrieve shape of a media dedup/"
         "retrieval pipeline, with the feature-extraction kernel "
         "being the only stub-free real-parse stage this container "
         "can run. Distances are integers (bit-exact cross-engine); "
         "the oracle re-derives the features ARITHMETICALLY from the "
         "synthesis recipe, so a parse bug anywhere in the Arrow "
         "stage breaks the hash. Payload bytes never shuffle — only "
         "the 4-int features do; top-k is TakeOrderedAndProject")
def ext_multimodal_embed_ann(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        build_image_payloads,
        extract_image_meta,
    )
    dims = (t(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("media_id"),
                    (F.col("doc_id") % 1000 + 1).alias("width"),
                    (F.col("n_chars") % 800 + 1).alias("height")))
    meta = extract_image_meta(build_image_payloads(dims))
    fmt_code = (F.when(F.col("format") == "png", 0)
                .when(F.col("format") == "jpeg", 1).otherwise(2))
    feats = meta.select("media_id", fmt_code.alias("fmt_code"),
                        "width", "height", "n_bytes")
    q = (feats.filter(F.col("media_id") == 0)
         .select(F.col("fmt_code").alias("q_fmt"),
                 F.col("width").alias("q_w"),
                 F.col("height").alias("q_h"),
                 F.col("n_bytes").alias("q_b")))
    dist = (F.abs(F.col("width") - F.col("q_w"))
            + F.abs(F.col("height") - F.col("q_h"))
            + F.abs(F.col("n_bytes") - F.col("q_b"))
            + F.when(F.col("fmt_code") != F.col("q_fmt"), 10000)
               .otherwise(0)).cast("bigint")
    return (feats.filter(F.col("media_id") != 0)
            .join(F.broadcast(q))
            .select("media_id", dist.alias("l1_dist"))
            .orderBy("l1_dist", "media_id")
            .limit(10)
            .select("media_id", "l1_dist",
                    F.row_number().over(
                        Window.orderBy("l1_dist", "media_id"))
                    .cast("int").alias("rank")))


@register(
    "stream_dedup_ingest",
    """WITH dupd AS (
         SELECT event_id, ts, value FROM events
         UNION ALL
         SELECT event_id, ts, value FROM events WHERE event_id % 5 = 0
         UNION ALL
         SELECT event_id, ts, value FROM events WHERE event_id % 25 = 0)
       SELECT event_id,
              min(ts) AS ts,
              CAST(count(*) AS BIGINT) AS n_delivered
       FROM dupd GROUP BY event_id""",
    survey="§2.9/§7.5 streaming (ingestion dedup)",
    note="the batch meaning of streaming ingestion dedup "
         "(streaming/windows.py:dedup_events): a feed with planted "
         "redeliveries (every 5th event twice, every 25th three "
         "times) collapses to one row per event_id; n_delivered "
         "exposes the duplication histogram a pipeline monitors. In "
         "streaming the SAME intent runs as "
         "dropDuplicatesWithinWatermark — per-key state bounded by "
         "the watermark horizon instead of corpus size — with "
         "stream==batch pinned in tests/test_streaming_dedup.py. "
         "Here the dedup is expressed as the groupBy itself (min ts, "
         "count), so the oracle needs no arbitrary-winner rule")
def stream_dedup_ingest(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "value")
    d1 = ev.filter(F.col("event_id") % 5 == 0)
    d2 = ev.filter(F.col("event_id") % 25 == 0)
    feed = ev.unionByName(d1).unionByName(d2)
    return (feed.groupBy("event_id")
            .agg(F.min("ts").alias("ts"),
                 F.count("*").alias("n_delivered")))


@register(
    "a34_corr_components",
    """WITH d AS (SELECT l_returnflag,
                         CAST(l_quantity AS DECIMAL(19,6)) AS dx,
                         CAST(l_extendedprice AS DECIMAL(19,6)) AS dy
                  FROM lineitem)
       SELECT l_returnflag,
              CAST(count(*) AS BIGINT) AS n,
              CAST(CAST(sum(dx) AS DECIMAL(38,6)) AS VARCHAR) AS sum_x,
              CAST(CAST(sum(dy) AS DECIMAL(38,6)) AS VARCHAR) AS sum_y,
              CAST(CAST(sum(dx * dy) AS DECIMAL(38,12)) AS VARCHAR) AS sum_xy,
              CAST(CAST(sum(dx * dx) AS DECIMAL(38,12)) AS VARCHAR) AS sum_x2,
              CAST(CAST(sum(dy * dy) AS DECIMAL(38,12)) AS VARCHAR) AS sum_y2
       FROM d GROUP BY l_returnflag""",
    survey="§2.4 ext (correlation / covariance components)",
    note="Pearson correlation and covariance per group, emitted as "
         "the SIX algebraic components (n, Σx, Σy, Σxy, Σx², Σy²) "
         "instead of the finished coefficient: corr/covar are "
         "quotients of these sums and quotients round differently "
         "across engines at ties (the registry's no-division rule), "
         "while the components are exact decimal sums — AND they are "
         "MERGEABLE, so incremental maintenance (x5's pattern) and "
         "multi-day rollups compose by adding components. The r5 "
         "verdict failed this entry's earlier round(double) output; "
         "the root cause (exposed by the exact parity canon) is that "
         "double→decimal conversion of PRODUCTS rounds differently "
         "across engines — a product's 6th decimal digit sits "
         "mid-mantissa where tie handling diverges constantly, while "
         "the raw 2-dp columns convert identically. So each FACTOR "
         "casts to DECIMAL(18,6) first and the multiply happens in "
         "exact decimal arithmetic; every component stays decimal "
         "end to end (hash-stable, and truer to the mergeable-exact-"
         "components story). Spark's built-in corr()/covar_samp() "
         "derive from the same sums; one scan, one map-side-"
         "combinable shuffle")
def a34_corr_components(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # cast factors to decimal BEFORE multiplying: the raw columns are
    # 2-dp money/quantity values whose double→decimal(18,6) cast is
    # far from any rounding tie, so both engines agree per row; the
    # product then computes in exact decimal arithmetic and the sums
    # are exact. Width asymmetry is deliberate: Spark stays at (18,6)
    # so the product is decimal(37,12) — width 19 would push p1+p2+1
    # past 38 and trigger Spark's scale-reduction re-rounding — while
    # the oracle casts to DECIMAL(19,6) because DuckDB multiplies
    # width<=18 significands in int64 (runtime overflow) and needs
    # width 19+ to pick int128; the VALUES are identical either way.
    # The sums ship as exact fixed-scale STRINGS: they carry ~16-23
    # significant digits (beyond float64's 15-17), so any comparator
    # that round-trips one side through float diverges on EQUAL values
    # (the r6 driver hash did exactly that). decimal->string keeps the
    # declared scale's trailing zeros identically on both engines.
    dx = F.col("l_quantity").cast("decimal(18,6)")
    dy = F.col("l_extendedprice").cast("decimal(18,6)")

    return (li.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"),
                 F.sum(dx).cast("decimal(38,6)").cast("string")
                 .alias("sum_x"),
                 F.sum(dy).cast("decimal(38,6)").cast("string")
                 .alias("sum_y"),
                 F.sum(dx * dy).cast("decimal(38,12)").cast("string")
                 .alias("sum_xy"),
                 F.sum(dx * dx).cast("decimal(38,12)").cast("string")
                 .alias("sum_x2"),
                 F.sum(dy * dy).cast("decimal(38,12)").cast("string")
                 .alias("sum_y2")))


@register(
    "x7_freshness_report",
    """WITH per AS (
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_rows,
                max(ts) AS latest
         FROM events GROUP BY event_type),
       g AS (SELECT max(latest) AS global_latest FROM per)
       SELECT event_type, n_rows, latest,
              epoch_us(global_latest) - epoch_us(latest) AS lag_us
       FROM per, g""",
    survey="A10/A11 ext (source-freshness monitoring)",
    note="the staleness dashboard every warehouse runs against its "
         "feeds (dbt source-freshness shape): per-stream row count + "
         "latest event time + lag behind the freshest stream, in "
         "exact integer MICROseconds (second-granularity extraction "
         "truncates differently across engines — e4's lesson). One "
         "map-side-combinable groupBy; the global max is a 1-row "
         "broadcast. At 100 TB this reads the fact's partition-level "
         "max(ts) stats, not the data, when the table is "
         "time-partitioned (SCALE.md scans)")
def x7_freshness_report(spark, sf_dir):
    per = (t(spark, sf_dir, "events")
           .groupBy("event_type")
           .agg(F.count("*").alias("n_rows"),
                F.max("ts").alias("latest")))
    g = per.agg(F.max("latest").alias("global_latest"))
    return (per.join(F.broadcast(g))
            .select("event_type", "n_rows", "latest",
                    (F.unix_micros("global_latest")
                     - F.unix_micros("latest")).alias("lag_us")))
