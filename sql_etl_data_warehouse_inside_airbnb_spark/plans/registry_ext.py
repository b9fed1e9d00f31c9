"""Extension queries: text analysis, dedup, similarity search, streaming
windows (SURVEY §7.5 — the training-data-pipeline surface).

Oracle notes:
- the language-ID heuristic is marker-token counting, deliberately
  SQL-expressible so BOTH the column-expression and pandas-UDF
  implementations are verified against the same DuckDB SQL;
- MinHash-LSH / SimHash / hyperplane-LSH use engine-specific hashes →
  no oracle (driver records rows-only), but each has an exact
  oracle-checked counterpart (ngram-jaccard / exact dedup / brute-force
  top-k) validating the semantics they approximate;
- DuckDB ``time_bucket`` and Spark ``window()`` share the same epoch
  grid for day/hour/minute sizes, so streaming aggregates are fully
  oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    fingerprint,
    lang_id,
    lang_id_udf,
    quality_features,
    quality_score,
    token_count,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    pairwise_cosine_dups,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import register, t
from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

# ------------------------------------------------------------- text

_LANGID_SQL_SCORES = {
    "en": "(len(string_split(' ' || trim(text) || ' ', ' the ')) - 1) + "
          "(len(string_split(' ' || trim(text) || ' ', ' a ')) - 1)",
    "es": "(len(string_split(' ' || trim(text) || ' ', ' la ')) - 1) + "
          "(len(string_split(' ' || trim(text) || ' ', ' el ')) - 1)",
    "de": "(len(string_split(' ' || trim(text) || ' ', ' der ')) - 1) + "
          "(len(string_split(' ' || trim(text) || ' ', ' und ')) - 1)",
    "fr": "(len(string_split(' ' || trim(text) || ' ', ' le ')) - 1) + "
          "(len(string_split(' ' || trim(text) || ' ', ' les ')) - 1)",
}

_LANGID_SQL = f"""
    SELECT doc_id,
           CASE
             WHEN text IS NULL THEN 'und'
             WHEN greatest({_LANGID_SQL_SCORES['en']}, {_LANGID_SQL_SCORES['es']},
                           {_LANGID_SQL_SCORES['de']}, {_LANGID_SQL_SCORES['fr']}) = 0
               THEN 'und'
             WHEN {_LANGID_SQL_SCORES['en']} >= {_LANGID_SQL_SCORES['es']}
              AND {_LANGID_SQL_SCORES['en']} >= {_LANGID_SQL_SCORES['de']}
              AND {_LANGID_SQL_SCORES['en']} >= {_LANGID_SQL_SCORES['fr']}
               THEN 'en'
             WHEN {_LANGID_SQL_SCORES['es']} >= {_LANGID_SQL_SCORES['de']}
              AND {_LANGID_SQL_SCORES['es']} >= {_LANGID_SQL_SCORES['fr']}
               THEN 'es'
             WHEN {_LANGID_SQL_SCORES['de']} >= {_LANGID_SQL_SCORES['fr']}
               THEN 'de'
             ELSE 'fr'
           END AS detected_lang
    FROM documents"""


@register(
    "ext_token_count",
    """SELECT doc_id,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END
                  ::BIGINT AS n_tokens
       FROM documents""",
    survey="§7.5 text", note="whitespace token counting")
def ext_token_count(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", token_count("text").alias("n_tokens")))


@register(
    "ext_text_quality",
    """SELECT doc_id,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END
                  ::BIGINT AS n_tokens,
              len(trim(text))::BIGINT AS n_chars,
              round(len(regexp_replace(trim(text), '\\s+', '', 'g'))
                    / greatest(CASE WHEN trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+'))
                               END, 1), 6) AS mean_token_len,
              round(((len(string_split(' ' || trim(text) || ' ', ' the ')) - 1)
                     + (len(string_split(' ' || trim(text) || ' ', ' a ')) - 1))
                    / greatest(CASE WHEN trim(text) = '' THEN 0
                               ELSE len(string_split_regex(trim(text), '\\s+'))
                               END, 1), 6) AS stopword_ratio
       FROM documents""",
    survey="§7.5 text/A14", note="doc quality features: length, token stats, "
                                 "stopword ratio")
def ext_text_quality(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", *quality_features("text")))


@register(
    "ext_quality_score",
    """WITH f AS (
         SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END::BIGINT AS n_tok,
                len(regexp_replace(trim(text), '\\s+', '', 'g'))::BIGINT
                    AS n_nospace,
                ((len(string_split(' ' || trim(text) || ' ', ' the ')) - 1)
                 + (len(string_split(' ' || trim(text) || ' ', ' a ')) - 1)
                )::BIGINT AS stop_hits
         FROM documents)
       SELECT doc_id,
              (5 * least(n_tok, 100)
               + 300 - least(floor(300 * stop_hits / greatest(n_tok, 1)), 300)
               + least(floor(25 * n_nospace / greatest(n_tok, 1)), 200)
              )::BIGINT AS quality_score
       FROM f""",
    survey="§7.5 text",
    note="composite quality milli-score [0,1000] — integer-valued by "
         "design (float scores round-boundary-diverge across engines)")
def ext_quality_score(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", quality_score("text").alias("quality_score")))


@register(
    "ext_lang_id", _LANGID_SQL,
    survey="§7.5 text/U4",
    note="language-ID via marker-token counting — column-expression "
         "implementation (JVM hot path)")
def ext_lang_id(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", lang_id("text").alias("detected_lang")))


@register(
    "ext_lang_id_udf", _LANGID_SQL,
    survey="U4",
    note="SAME semantics through an Arrow-batched pandas UDF — the "
         "pluggable-Python-model surface, checked against the same oracle")
def ext_lang_id_udf(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", lang_id_udf("text").alias("detected_lang")))


@register(
    "ext_fingerprint",
    """SELECT doc_id,
              md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                  AS fingerprint
       FROM documents""",
    survey="§7.5 text", note="normalized md5 document fingerprint")
def ext_fingerprint(spark, sf_dir):
    return (t(spark, sf_dir, "documents")
            .select("doc_id", fingerprint("text").alias("fingerprint")))


# ------------------------------------------------------------- dedup

@register(
    "ext_dedup_exact",
    """SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                  AS fingerprint,
              min(doc_id) AS canonical_doc_id,
              count(*) AS n_copies
       FROM documents
       GROUP BY 1""",
    survey="§7.5 dedup/W2/A9", note="exact dedup via fingerprint groupBy")
def ext_dedup_exact(spark, sf_dir):
    return exact_dedup(t(spark, sf_dir, "documents"))

# ---- shared dedup-oracle fragments ------------------------------------
# ONE definition each, interpolated into every dedup oracle below, so
# the shingle semantics / planted-mutation corpus can never drift per
# entry (they must stay in lockstep with functions/text.py:shingles
# and the Spark-side corpus builders).

# DuckDB mirror of functions/text.py:shingles(): DISTINCT word 3-grams
_SHINGLE_SQL = """CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 3
                     THEN []::VARCHAR[]
                     ELSE list_distinct(list_transform(
                       generate_series(1,
                         len(string_split_regex(trim(text), '\\s+')) - 2),
                       i -> string_split_regex(trim(text), '\\s+')[i] || ' ' ||
                            string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
                            string_split_regex(trim(text), '\\s+')[i+2]))
                END"""

# planted-mutation corpus: 10% sample + ' mutation' variants keyed
# +10000000 (the known-answer near-dup workload)
_PLANT_SQL = """base AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       corpus AS (
         SELECT doc_id, text FROM base
         UNION ALL
         SELECT doc_id + 10000000, text || ' mutation' FROM base)"""
_PLANT_LANG_SQL = """base AS (
         SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 0),
       corpus AS (
         SELECT doc_id, lang, text FROM base
         UNION ALL
         SELECT doc_id + 10000000, lang, text || ' mutation' FROM base)"""


@register(
    "ext_dedup_ngram_jaccard",
    f"""WITH {_PLANT_LANG_SQL},
       d AS (
         SELECT doc_id, lang,
                {_SHINGLE_SQL} AS sh
         FROM corpus),
       d2 AS (
         SELECT doc_id, lang, sh,
                len(sh) // 8 AS lb,
                list_min(list_transform(sh, s -> md5(s))) AS band
         FROM d)
       SELECT a.doc_id AS key_a, b.doc_id AS key_b,
              round(CASE WHEN len(a.sh) + len(b.sh) -
                         len(list_filter(a.sh, x -> list_contains(b.sh, x))) = 0
                         THEN 0.0
                         ELSE len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                              / (len(a.sh) + len(b.sh)
                                 - len(list_filter(a.sh,
                                       x -> list_contains(b.sh, x))))::DOUBLE
                    END, 6) AS jaccard
       FROM d2 a JOIN d2 b
         ON a.lang = b.lang AND a.lb = b.lb AND a.band = b.band
        AND a.doc_id < b.doc_id""",
    survey="§7.5 dedup",
    note="n-gram Jaccard near-dup pairs over a corpus with planted "
         "one-token-mutation duplicates (same device as "
         "ext_dedup_minhash — the natural corpus has no near-dups). "
         "Block key is lang × shingle-count bucket × min-md5-shingle "
         "MinHash band: the band's cardinality grows with the corpus "
         "vocabulary, so block sizes stay O(1) as N grows — never the "
         "O((N/langs)²) of a language-only block. Planted pairs share "
         "the band with probability = their Jaccard (~0.9 here); "
         "md5 keeps every block key DuckDB-expressible, so the exact "
         "pair set is oracle-checked")
def ext_dedup_ngram_jaccard(spark, sf_dir):
    docs = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "lang", "text"))
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.col("lang"),
        F.concat(F.col("text"), F.lit(" mutation")).alias("text"))
    corpus = docs.unionByName(mutated)
    return ngram_jaccard_pairs(corpus, "doc_id", "text", "lang",
                               length_bucket=8, minhash_band=True)


@register(
    "ext_dedup_minhash", None,
    survey="§7.5 dedup",
    note="MinHash+LSH candidate pairs (pyspark.ml, banded bucket join); "
         "engine-specific hashes → rows-only check; semantics validated "
         "by ext_dedup_ngram_jaccard")
def ext_dedup_minhash(spark, sf_dir):
    # The synthetic corpus has no true near-dups (max pairwise Jaccard
    # ≈ 0.02 in this sample), so recall would be trivially vacuous;
    # plant known near-duplicates (one-token-appended copies, key
    # offset +10_000_000) and require LSH to surface each planted pair.
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutation")).alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = minhash_candidate_pairs(corpus, "doc_id", "text",
                                    jaccard_threshold=0.3)
    return pairs.filter(F.col("key_b") == F.col("key_a") + 10_000_000)


@register(
    "ext_dedup_simhash", None,
    survey="§7.5 dedup",
    note="SimHash-64 banded near-dup pairs (4×16-bit bands, Hamming ≤ 3); "
         "xxhash64 is engine-specific → rows-only check")
def ext_dedup_simhash(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return simhash_near_pairs(docs, "doc_id", "text")


@register(
    "ext_dedup_embedding",
    """WITH e AS (
         SELECT vec_id, label, embedding,
                (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
               + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
               + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
               + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
               + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
               + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bkt
         FROM embeddings WHERE vec_id % 5 = 0)
       SELECT a.vec_id AS key_a, b.vec_id AS key_b,
              round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                             a.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]))), 6)
                  AS cosine
       FROM e a JOIN e b
         ON a.label = b.label AND a.bkt = b.bkt AND a.vec_id < b.vec_id""",
    survey="§7.5 dedup/similarity",
    note="embedding cosine near-dup candidate pairs, blocked by "
         "label × 6-bit axis-aligned sign-LSH bucket "
         "(operators/similarity.py:sign_bucket) — a label-only block "
         "is O((N/labels)²) at scale; the sign bucket multiplies key "
         "cardinality by 2^bits (bits tuned ∝ log N to hold block "
         "sizes constant). Emits every co-blocked pair with its exact "
         "cosine (candidate generation; thresholding is the caller's "
         "re-rank step), all DuckDB-expressible → hash-checked")
def ext_dedup_embedding(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return pairwise_cosine_dups(emb, threshold=-1.0, sign_bits=6)


# -------------------------------------------------------- similarity

@register(
    "ext_ann_brute_topk",
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0)
       SELECT e.vec_id,
              round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                    / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
       FROM embeddings e, q
       WHERE e.vec_id <> 0
       ORDER BY cosine DESC, e.vec_id LIMIT 10""",
    survey="§7.5 similarity",
    note="exact brute-force cosine top-k (broadcast query + "
         "TakeOrderedAndProject — the re-rank primitive)")
def ext_ann_brute_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    return brute_force_topk(emb.filter(F.col("vec_id") != 0), query, k=10)


def _lsh_oracle_sql() -> str:
    """Build the DuckDB oracle for ext_ann_lsh_topk from the SAME
    fixed-seed hyperplanes the Spark operator uses — the plane floats
    are embedded as literals, so bucket assignment and the exact
    cosine re-rank are both reproduced and the entry is hash-checked
    rather than rows-only. Sign tests on O(1)-magnitude dot products
    are robust to fold-order FP noise (~1e-16), unlike raw floats."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        _hyperplanes,
    )
    planes = _hyperplanes(64, 4)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
                     f"{lit}) > 0 THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(terms)
    # multi-probe arms: the query bucket plus every Hamming-1 bucket,
    # mirroring lsh_topk's hamming_probes=1 default
    probe_arms = "".join(f" OR e.bkt = xor(q.bkt, {1 << i})"
                         for i in range(4))
    return f"""WITH b AS (
         SELECT vec_id, embedding, {bucket} AS bkt FROM embeddings),
       q AS (SELECT embedding::DOUBLE[] AS qv, bkt FROM b WHERE vec_id = 0)
       SELECT e.vec_id,
              round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                    / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
       FROM b e, q
       WHERE e.vec_id <> 0
         AND (e.bkt = q.bkt{probe_arms})
       ORDER BY cosine DESC, e.vec_id LIMIT 10"""


@register(
    "ext_ann_lsh_topk", _lsh_oracle_sql(),
    survey="§7.5 similarity",
    note="hyperplane-LSH bucketed top-k (fixed-seed planes, bucket "
         "equi-join + exact re-rank), MULTI-PROBE since round 3: the "
         "query also probes every Hamming-1 bucket (probe list "
         "explodes on the broadcast query side; corpus hashing "
         "unchanged), lifting recall@10 from 0.18 to 0.50 at sf0.01 "
         "while scanning 5/16 of the corpus. The oracle embeds the "
         "same seed-42 plane literals AND the same probe arms, so "
         "bucketing, probing, and the re-rank are all hash-checked — "
         "recall<1 vs brute force is the designed semantics, not an "
         "oracle gap")
def ext_ann_lsh_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    return lsh_topk(emb.filter(F.col("vec_id") != 0), query, k=10)


# --------------------------------------------------------- streaming

@register(
    "stream_tumbling",
    """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
              time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                  AS window_end,
              event_type,
              count(*) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
       FROM events GROUP BY 1, 2, 3""",
    survey="§2.9/§7.5 streaming",
    note="tumbling window agg — unified API: same plan batch & stream")
def stream_tumbling(spark, sf_dir):
    return tumbling_agg(t(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    """WITH offs AS (SELECT unnest([INTERVAL '0 hours', INTERVAL '12 hours'])
                         AS off)
       SELECT time_bucket(INTERVAL '12 hours', ts) - off AS window_start,
              time_bucket(INTERVAL '12 hours', ts) - off + INTERVAL '1 day'
                  AS window_end,
              count(*) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
       FROM events, offs GROUP BY 1, 2""",
    survey="§2.9/§7.5 streaming",
    note="sliding windows (1 day / 12 h): every event in 2 windows")
def stream_sliding(spark, sf_dir):
    return sliding_agg(t(spark, sf_dir, "events"))


@register(
    "stream_session",
    """WITH marked AS (
         SELECT user_id, ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '2 hours'
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
         FROM events),
       sess AS (
         SELECT user_id, ts, value,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
         FROM marked)
       SELECT user_id,
              min(ts) AS session_start,
              max(ts) + INTERVAL '2 hours' AS session_end,
              count(*) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
       FROM sess GROUP BY user_id, session_no""",
    survey="§2.9/§7.5 streaming",
    note="session windows (2 h gap) per user; oracle is the "
         "gaps-and-islands rewrite")
def stream_session(spark, sf_dir):
    return session_agg(t(spark, sf_dir, "events"))


# -------------------------------------------------------- multimodal

@register(
    "ext_multimodal_meta",
    """SELECT doc_id,
              octet_length(encode(text)) AS payload_bytes,
              sha256(text) AS payload_sha256
       FROM documents""",
    survey="§7.5 multimodal",
    note="opaque-binary column plumbing: byte length + content hash of "
         "the payload (decode itself is a stubbed Pandas-UDF path, see "
         "operators/multimodal.py)")
def ext_multimodal_meta(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select("doc_id",
                    F.octet_length(payload).cast("bigint")
                     .alias("payload_bytes"),
                    F.sha2(payload, 256).alias("payload_sha256"))


@register(
    "ext_multimodal_image_meta",
    """SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                   ELSE 'gif' END AS format,
              CAST(doc_id % 1000 + 1 AS BIGINT) AS width,
              CAST(n_chars % 800 + 1 AS BIGINT) AS height,
              CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 23
                        ELSE 13 END AS BIGINT) AS n_bytes
       FROM documents""",
    survey="§7.5 multimodal (real decode)",
    note="REAL image header decode, hash-checked: per document a valid "
         "PNG/JPEG/GIF header payload is synthesized (binary column, "
         "dimensions derived from doc_id/n_chars), then "
         "operators/multimodal.py:extract_image_meta parses the actual "
         "bytes back (PNG IHDR / JPEG SOFn scan / GIF screen "
         "descriptor) in a mapInPandas stage. The oracle recomputes "
         "the expected (format,width,height,n_bytes) arithmetically — "
         "any parsing bug breaks the hash match. Both stages are "
         "Arrow-batched; payload bytes never shuffle")
def ext_multimodal_image_meta(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        build_image_payloads,
        extract_image_meta,
    )
    dims = (t(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("media_id"),
                    (F.col("doc_id") % 1000 + 1).alias("width"),
                    (F.col("n_chars") % 800 + 1).alias("height")))
    return extract_image_meta(build_image_payloads(dims))


@register(
    "ext_lang_detect_lib", None,
    survey="U4 (library path)",
    note="library-backed language detection: functions/text.py:"
         "lang_detect_udf uses the public langdetect package when "
         "installed (seeded, failure->'und') and the marker heuristic "
         "otherwise — same Arrow-batched plan either way, mirroring "
         "the reference's langdetect UDF "
         "(scripts/app/language_detection.py:41-154). Output depends "
         "on which detector is present -> rows-only; the fallback "
         "path is fixture-pinned against lang_id() in tests")
def ext_lang_detect_lib(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        lang_detect_udf,
    )
    return (t(spark, sf_dir, "documents")
            .select("doc_id", lang_detect_udf(F.col("text")).alias("lang"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("first_doc")))


@register(
    "ext_ann_batch_topk",
    """WITH q AS (
         SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         FROM embeddings WHERE vec_id % 100 = 0),
       scored AS (
         SELECT q.query_id, e.vec_id,
                round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                      / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[]))
                         * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
         FROM embeddings e, q
         WHERE e.vec_id <> q.query_id),
       ranked AS (
         SELECT query_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, vec_id) AS INT) AS rank
         FROM scored)
       SELECT query_id, vec_id, cosine, rank
       FROM ranked WHERE rank <= 5""",
    survey="§7.5 similarity (batched serving shape)",
    note="batched exact top-k: the whole query batch broadcasts and "
         "the corpus is scanned ONCE for all queries; per-query "
         "re-rank is a window partitioned by query_id (no global "
         "sort, no driver loop over queries — the anti-pattern this "
         "operator exists to replace). operators/similarity.py:"
         "batch_topk; the n_planes>0 LSH variant turns scoring into "
         "a bucket equi-join for corpus-scale batches")
def ext_ann_batch_topk(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        batch_topk,
    )
    emb = t(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return batch_topk(emb, queries, k=5, exclude_self=True)


@register(
    "ext_chunk_documents",
    """WITH d AS (
         SELECT doc_id,
                string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks,
                CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                     ELSE len(string_split_regex(trim(coalesce(text, '')),
                              '\\s+'))
                END::BIGINT AS n
         FROM documents)
       SELECT doc_id,
              CAST(g.chunk_id AS BIGINT) AS chunk_id,
              CASE WHEN n = 0 THEN 0
                   ELSE len(list_slice(toks, g.chunk_id * 48 + 1,
                                       least(g.chunk_id * 48 + 64, len(toks))))
              END::BIGINT AS n_chunk_tokens,
              array_to_string(list_slice(toks, g.chunk_id * 48 + 1,
                              least(g.chunk_id * 48 + 64, len(toks))), ' ')
                  AS chunk_text
       FROM d, LATERAL unnest(generate_series(
                0, greatest((n - 16 + 47) // 48, 1) - 1)) AS g(chunk_id)""",
    survey="§7.5 ext (context-window chunking)",
    note="overlapping token-window chunking (64-token chunks, 16 "
         "overlap) — the context-window prep 1->N transform "
         "(functions/text.py:chunk_documents): explode a per-row "
         "chunk-id sequence + slice the pre-split token array; one "
         "scan, no shuffle, integer chunk-count arithmetic so the "
         "fan-out is engine-exact")
def ext_chunk_documents(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        chunk_documents,
    )
    return chunk_documents(t(spark, sf_dir, "documents"))


@register(
    "ext_pii_redact",
    """WITH planted AS (
         SELECT doc_id,
                CASE WHEN doc_id % 7 = 0
                     THEN text || ' contact user' || doc_id ||
                          '@example.com or +1 555-000-' ||
                          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE text END AS text
         FROM documents)
       SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   AS BIGINT) AS n_emails,
              regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS redacted
       FROM planted""",
    survey="§7.5 ext (PII scrubbing)",
    note="minimum-viable PII pass (functions/text.py:redact_pii): "
         "emails then phone-shaped digit runs -> placeholders, pure "
         "regexp_replace chain (JVM, codegen, lookahead-free so Java "
         "regex and RE2 agree). Emails/phones are planted on every "
         "7th doc so the redaction is non-vacuous and the exact "
         "redacted text is hash-checked")
def ext_pii_redact(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        EMAIL_RE,
        redact_pii,
    )
    planted = (t(spark, sf_dir, "documents")
               .select("doc_id",
                       F.when(F.col("doc_id") % 7 == 0,
                              F.concat(F.col("text"),
                                       F.lit(" contact user"),
                                       F.col("doc_id").cast("string"),
                                       F.lit("@example.com or +1 555-000-"),
                                       F.lpad((F.col("doc_id") % 10000)
                                              .cast("string"), 4, "0")))
                       .otherwise(F.col("text")).alias("text")))
    return planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("bigint")
         .alias("n_emails"),
        redact_pii("text").alias("redacted"))


@register(
    "ext_repetition_filter",
    """SELECT doc_id,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+'))
              END::BIGINT AS n_tokens,
              CASE WHEN trim(text) = '' THEN 10000
                   ELSE floor(10000 *
                        len(list_distinct(string_split_regex(trim(text), '\\s+')))
                        / len(string_split_regex(trim(text), '\\s+')))
              END::BIGINT AS distinct_token_bp
       FROM documents""",
    survey="§7.5 ext (repetition filter)",
    note="Gopher-style intra-document repetition signal: distinct-"
         "token share in integer basis points "
         "(functions/text.py:distinct_token_bp) — low values flag "
         "boilerplate/repeated text for filtering; integer floor "
         "arithmetic keeps it engine-exact")
def ext_repetition_filter(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        distinct_token_bp,
        token_count,
    )
    return (t(spark, sf_dir, "documents")
            .select("doc_id",
                    token_count("text").alias("n_tokens"),
                    distinct_token_bp("text").alias("distinct_token_bp")))


@register(
    "ext_source_stats",
    """WITH f AS (
         SELECT source,
                md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                    AS fp,
                (5 * least(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 100)
                 + 300 - least(floor(300 *
                     ((len(string_split(' ' || trim(text) || ' ', ' the ')) - 1)
                      + (len(string_split(' ' || trim(text) || ' ', ' a ')) - 1)
                     )::BIGINT / greatest(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 1)), 300)
                 + least(floor(25 *
                     len(regexp_replace(trim(text), '\\s+', '', 'g'))::BIGINT
                     / greatest(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                     END::BIGINT, 1)), 200))::BIGINT AS q
         FROM documents)
       SELECT source,
              count(*) AS n_docs,
              CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
              CAST(sum(q) AS BIGINT) AS quality_sum,
              CAST(count(*) FILTER (WHERE q < 500) AS BIGINT) AS n_low_quality
       FROM f GROUP BY source""",
    survey="§7.5 ext (source-level curation stats)",
    note="per-source curation profile — the domain-filtering input a "
         "web-scale corpus needs (block/sample decisions are made per "
         "source, not per doc): doc count, distinct-fingerprint count "
         "(source-local dedup rate), exact integer quality sum, and "
         "low-quality count, all in one groupBy(source) pass; "
         "map-side-combinable except the exact distinct, which is the "
         "one shuffle the semantics require (swap in "
         "approx_count_distinct at 100 TB, the a19 pattern)")
def ext_source_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    q = quality_score("text")
    return (d.select("source", fingerprint("text").alias("fp"),
                     q.alias("q"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("fp").alias("n_unique"),
                 F.sum("q").alias("quality_sum"),
                 F.count_if(F.col("q") < 500).alias("n_low_quality")))


@register(
    "ext_stratified_sample",
    """WITH ranked AS (
         SELECT doc_id, lang,
                CAST(row_number() OVER (
                     PARTITION BY lang
                     ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id)
                     AS BIGINT) AS rk
         FROM documents)
       SELECT doc_id, lang, rk
       FROM ranked WHERE rk <= 20""",
    survey="§7.5 ext (stratified sampling)",
    note="deterministic stratified subsample: exactly K docs per "
         "language, ranked by an arithmetic (Knuth-multiplicative) "
         "hash of the key — same sample on every engine, every run, "
         "every partitioning (rand() gives none of those), the "
         "ext_train_split discipline applied to per-stratum top-K. "
         "One window pass partitioned by the stratum; at 100 TB "
         "rank-over-hash beats ORDER BY rand() LIMIT because no "
         "global sort exists — each stratum sorts independently")
def ext_stratified_sample(spark, sf_dir):
    from pyspark.sql import Window as W
    # pre-mod the key: a raw 64-bit multiply overflows for
    # doc_id > ~3.47e9 (web-corpus key spaces) — Spark would
    # silently wrap while DuckDB raises; (k % p) * c stays < 2^62
    h = ((F.col("doc_id") % F.lit(1000000007))
         * F.lit(2654435761)) % F.lit(1000000007)
    w = W.partitionBy("lang").orderBy(h, "doc_id")
    return (t(spark, sf_dir, "documents")
            .select("doc_id", "lang")
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= 20))


@register(
    "ext_vocab_topk",
    """WITH toks AS (
         SELECT lower(g.tok) AS token
         FROM documents, LATERAL unnest(
              string_split_regex(trim(text), '\\s+')) AS g(tok)
         WHERE trim(text) <> ''),
       counts AS (
         SELECT token, count(*) AS n FROM toks GROUP BY token)
       SELECT token, n,
              CAST(row_number() OVER (ORDER BY n DESC, token)
                   AS BIGINT) AS rank
       FROM counts ORDER BY n DESC, token LIMIT 100""",
    survey="§7.5 ext (vocabulary building)",
    note="corpus vocabulary top-K — the tokenizer-training precursor "
         "(BPE/unigram both start from token/frequency tables): "
         "explode tokens, one map-side-combinable groupBy(token), "
         "TakeOrdered top-K with a total-order tiebreak. At 100 TB "
         "the token groupBy is the canonical high-cardinality agg — "
         "partial aggregation collapses each partition's counts "
         "before the shuffle, so wire volume ∝ distinct tokens per "
         "partition, not corpus tokens")
def ext_vocab_topk(spark, sf_dir):
    from pyspark.sql import Window as W
    toks = (t(spark, sf_dir, "documents")
            .filter(F.trim("text") != "")
            .select(F.explode(F.split(F.trim("text"), r"\s+", -1))
                    .alias("token"))
            .select(F.lower("token").alias("token")))
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    w = W.orderBy(F.col("n").desc(), "token")
    return (counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .orderBy(F.col("n").desc(), "token").limit(100))


@register(
    "ext_label_centroid",
    """WITH flat AS (
         SELECT label,
                unnest(embedding) AS x,
                generate_subscripts(embedding, 1) AS pos
         FROM embeddings)
       SELECT label,
              CAST(pos AS BIGINT) AS pos,
              round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)))
                         AS DOUBLE), 6) AS dim_sum,
              count(*) AS n_vectors
       FROM flat WHERE pos <= 8
       GROUP BY label, pos""",
    survey="§7.5 ext (embedding aggregation)",
    note="per-label centroid numerators (first 8 dims): posexplode "
         "the vector, groupBy(label, dim) with an EXACT decimal sum "
         "(FP sums are partition-order-dependent — the SCALE.md "
         "determinism rule applied to vector math). The centroid "
         "divide happens outside the compared columns. Scale shape: "
         "the 64x row fan-out is immediately collapsed by map-side "
         "partial aggregation; this is how KMeans centroids / class "
         "means are computed without ever collecting vectors")
def ext_label_centroid(spark, sf_dir):
    return (t(spark, sf_dir, "embeddings")
            .select("label", F.posexplode("embedding")
                    .alias("pos0", "x"))
            .filter(F.col("pos0") < 8)
            .select("label", (F.col("pos0") + 1).cast("bigint").alias("pos"),
                    # widen float->double explicitly BEFORE the decimal
                    # cast: engines disagree on direct float->decimal
                    # (shortest-decimal vs binary-exact widening)
                    F.col("x").cast("double").cast("decimal(18,9)")
                     .alias("xd"))
            .groupBy("label", "pos")
            .agg(F.round(F.sum("xd").cast("double"), 6).alias("dim_sum"),
                 F.count("*").alias("n_vectors")))


@register(
    "ext_sequence_pack",
    """WITH d AS (
         SELECT doc_id,
                doc_id % 8 AS shard,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END::BIGINT AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, shard, n_tokens,
                sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_off
         FROM d)
       SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
              CAST(tok_off // 512 AS BIGINT) AS pack_id,
              CAST(tok_off % 512 AS BIGINT) AS pack_offset
       FROM c""",
    survey="§7.5 ext (sequence packing)",
    note="concat-and-cut sequence packing — the step that turns a "
         "document stream into fixed-budget training sequences "
         "(512-token packs here): running token offset per shard via "
         "one window cumsum, pack id = offset div budget. Docs are "
         "packed WITHIN a hash shard (doc_id % 8) so each shard's "
         "prefix-sum window sorts independently — a single global "
         "ordering would be a one-partition sort at 100 TB; sharded "
         "packing is how real pipelines parallelize it. Deterministic "
         "(doc_id order), integer arithmetic, exact on both engines")
def ext_sequence_pack(spark, sf_dir):
    from pyspark.sql import Window as W
    d = (t(spark, sf_dir, "documents")
         .select("doc_id",
                 (F.col("doc_id") % 8).cast("bigint").alias("shard"),
                 token_count("text").alias("n_tokens")))
    w = (W.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, 0))
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (d.withColumn("pack_id",
                         F.floor(offset / 512).cast("bigint"))
            .withColumn("pack_offset", (offset % 512).cast("bigint")))


@register(
    "ext_chunk_pack_pipeline",
    """WITH d AS (
         SELECT doc_id,
                string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks,
                CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                     ELSE len(string_split_regex(trim(coalesce(text, '')),
                              '\\s+'))
                END::BIGINT AS n
         FROM documents),
       chunks AS (
         SELECT doc_id,
                CAST(g.chunk_id AS BIGINT) AS chunk_id,
                CASE WHEN n = 0 THEN 0
                     ELSE len(list_slice(toks, g.chunk_id * 48 + 1,
                              least(g.chunk_id * 48 + 64, len(toks))))
                END::BIGINT AS n_chunk_tokens
         FROM d, LATERAL unnest(generate_series(
                  0, greatest((n - 16 + 47) // 48, 1) - 1)) AS g(chunk_id)),
       packed AS (
         SELECT doc_id, chunk_id, n_chunk_tokens,
                doc_id % 8 AS shard,
                sum(n_chunk_tokens) OVER (PARTITION BY doc_id % 8
                    ORDER BY doc_id, chunk_id
                    ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS tok_off
         FROM chunks)
       SELECT CAST(shard AS BIGINT) AS shard,
              CAST(tok_off // 256 AS BIGINT) AS pack_id,
              count(*) AS n_chunks,
              CAST(sum(n_chunk_tokens) AS BIGINT) AS pack_tokens,
              min(doc_id) AS first_doc,
              max(doc_id) AS last_doc
       FROM packed GROUP BY 1, 2""",
    survey="§7.5 ext (chunk -> pack composition)",
    note="the two sequence-prep stages COMPOSED: chunk_documents "
         "(64-token windows, 16 overlap) feeds sharded concat-and-cut "
         "packing (256-token packs) in one lazy lineage — explode + "
         "per-shard window cumsum + pack-level rollup, one scan of "
         "documents, shuffles only on the shard window and the final "
         "groupBy. The per-pack summary (chunk count, token count, "
         "doc span) is what a training-data loader manifests")
def ext_chunk_pack_pipeline(spark, sf_dir):
    from pyspark.sql import Window as W
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        chunk_documents,
    )
    chunks = chunk_documents(t(spark, sf_dir, "documents"))
    w = (W.partitionBy("shard").orderBy("doc_id", "chunk_id")
         .rowsBetween(W.unboundedPreceding, 0))
    packed = (chunks
              .withColumn("shard", (F.col("doc_id") % 8).cast("bigint"))
              .withColumn("tok_off",
                          F.sum("n_chunk_tokens").over(w)
                          - F.col("n_chunk_tokens")))
    return (packed
            .groupBy("shard",
                     F.floor(F.col("tok_off") / 256).cast("bigint")
                      .alias("pack_id"))
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("n_chunk_tokens").alias("pack_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


@register(
    "ext_dup_ngram_fraction",
    """WITH grams AS (
         SELECT doc_id, g.sh
         FROM (SELECT doc_id,
                      CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 3
                           THEN []::VARCHAR[]
                           ELSE list_transform(
                             generate_series(1,
                               len(string_split_regex(trim(text), '\\s+')) - 2),
                             i -> string_split_regex(trim(text), '\\s+')[i]
                                  || ' ' ||
                                  string_split_regex(trim(text), '\\s+')[i+1]
                                  || ' ' ||
                                  string_split_regex(trim(text), '\\s+')[i+2])
                      END AS shs
               FROM documents) d,
              LATERAL unnest(d.shs) AS g(sh)),
       df AS (
         SELECT sh, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY sh)
       SELECT g.doc_id,
              count(*) AS n_grams,
              CAST(count(*) FILTER (WHERE df.n_docs > 1) AS BIGINT)
                  AS n_shared_grams,
              CAST(10000 * count(*) FILTER (WHERE df.n_docs > 1)
                   // count(*) AS BIGINT) AS shared_gram_bp
       FROM grams g JOIN df ON g.sh = df.sh
       GROUP BY g.doc_id""",
    survey="§7.5 ext (cross-doc repetition filter)",
    note="cross-document duplicated-3-gram fraction (basis points) — "
         "the RefinedWeb/Gopher-style filter that flags documents "
         "whose n-grams mostly appear in OTHER documents (boilerplate, "
         "templates), complementing distinct_token_bp's intra-doc "
         "signal. Shape: explode positional n-grams, one groupBy for "
         "cross-doc document frequency, hash join back, one per-doc "
         "rollup — linear in total grams, both aggs map-side "
         "combinable; at 100 TB the DF table is the same artifact the "
         "decontamination and PPJoin prefix filters reuse. Integer "
         "basis points keep it engine-exact; docs with <3 tokens emit "
         "no grams and are absent (both engines)")
def ext_dup_ngram_fraction(spark, sf_dir):
    # positional (non-distinct) 3-grams built inline ON PURPOSE —
    # functions.text.shingles is distinct-set semantics; the fraction
    # here is over gram OCCURRENCES, so repeated local grams count
    # every time
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+", -1)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(2))
    gram = F.transform(
        idx, lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2)))
    # r14: explode the INLINE gram expression (the curation._gram_list
    # / r14-ppjoin lesson) — exploding a projected attribute lets
    # InferFiltersFromGenerate push size(shs)>0 below the Project,
    # where alias substitution re-ran the whole 3-gram transform per
    # row in EVERY consumer's scan branch (4 pushed copies in the
    # executed plan). Inline leaves no attribute to infer on; rows
    # are identical (explode of [] emits nothing either way).
    grams = d.select("doc_id",
                     F.explode(F.when(F.size(toks) < 3,
                                      F.array().cast("array<string>"))
                               .otherwise(gram)).alias("sh"))
    df_counts = (grams.groupBy("sh")
                 .agg(F.countDistinct("doc_id").alias("n_docs")))
    joined = grams.join(df_counts, "sh")
    shared = F.count_if(F.col("n_docs") > 1)
    return (joined.groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 shared.alias("n_shared_grams"),
                 F.floor(10000 * shared / F.count("*")).cast("bigint")
                  .alias("shared_gram_bp")))


@register(
    "ext_url_parse",
    """WITH u AS (
         SELECT doc_id,
                'https://' || source || '.example.org/docs/' ||
                CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
         FROM documents)
       SELECT doc_id,
              regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
              regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
              regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param,
              regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)/', 1),
                             '([^.]+\\.[^.]+)$', 1) AS domain
       FROM u""",
    survey="§7.5 ext (URL/domain parsing)",
    note="URL decomposition for web-corpus curation: host, path, "
         "query param, and registrable-domain suffix from a "
         "synthesized well-formed URL per document. Spark side uses "
         "the parse_url builtin for host/path/query (JVM, no regex "
         "backtracking at scale) plus one regexp for the domain "
         "suffix; the oracle recomputes all four with portable "
         "regexps. Domain is the key source-level curation joins "
         "block on (same role as ext_source_stats.source)")
def ext_url_parse(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.org/docs/"),
                   F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"))


@register(
    "ext_filter_funnel",
    """WITH f AS (
         SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END::BIGINT AS n_tok,
                len(regexp_replace(trim(text), '\\s+', '', 'g'))::BIGINT
                    AS n_nospace,
                CASE WHEN trim(text) = '' THEN 10000
                     ELSE floor(10000 * len(list_distinct(
                              string_split_regex(trim(text), '\\s+')))
                          / len(string_split_regex(trim(text), '\\s+')))
                END::BIGINT AS distinct_bp
         FROM documents)
       SELECT doc_id,
              CASE
                WHEN n_tok < 5 THEN 'too_short'
                WHEN n_tok > 5000 THEN 'too_long'
                WHEN 10 * n_nospace < 25 * n_tok THEN 'short_tokens'
                WHEN 10 * n_nospace > 120 * n_tok THEN 'long_tokens'
                WHEN distinct_bp < 3000 THEN 'repetitive'
                ELSE 'keep'
              END AS verdict
       FROM f""",
    survey="§7.5 ext (quality filter funnel)",
    note="Gopher-style keep/drop funnel with reason codes — the "
         "curation filter's real shape (first failing rule wins, so "
         "attrition is attributable per rule): token-count bounds, "
         "mean-token-length bounds expressed as integer cross-"
         "multiplications (10*chars vs k*tokens — no division, no "
         "float), repetition threshold on the distinct-token basis "
         "points. One scan, pure column CASE ladder; the downstream "
         "groupBy(verdict) count is the funnel report")
def ext_filter_funnel(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        distinct_token_bp,
        token_count,
    )
    d = t(spark, sf_dir, "documents")
    n_tok = token_count("text")
    n_nospace = (F.length(F.regexp_replace(F.trim("text"), r"\s+", ""))
                 .cast("bigint"))
    verdict = (F.when(n_tok < 5, "too_short")
               .when(n_tok > 5000, "too_long")
               .when(10 * n_nospace < 25 * n_tok, "short_tokens")
               .when(10 * n_nospace > 120 * n_tok, "long_tokens")
               .when(distinct_token_bp("text") < 3000, "repetitive")
               .otherwise("keep"))
    return d.select("doc_id", verdict.alias("verdict"))


@register(
    "ext_dedup_ppjoin",
    f"""WITH {_PLANT_SQL},
       d AS (
         SELECT doc_id,
                {_SHINGLE_SQL} AS sh
         FROM corpus),
       s AS (SELECT doc_id, sh FROM d WHERE len(sh) > 0),
       flat AS (
         SELECT doc_id, g.x AS g FROM s, LATERAL unnest(s.sh) AS g(x)),
       dfreq AS (SELECT g, count(*) AS dfc FROM flat GROUP BY g),
       ranked AS (
         SELECT f.doc_id, f.g,
                row_number() OVER (PARTITION BY f.doc_id
                                   ORDER BY d2.dfc, f.g) AS rk
         FROM flat f JOIN dfreq d2 USING (g)),
       sizes AS (SELECT doc_id, len(sh)::BIGINT AS n FROM s),
       prefix AS (
         SELECT r.doc_id, r.g
         FROM ranked r JOIN sizes z USING (doc_id)
         WHERE r.rk <= z.n - ((1 * z.n + 1) // 2) + 1),
       cand AS (
         SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
         FROM prefix a JOIN prefix b
           ON a.g = b.g AND a.doc_id < b.doc_id),
       scored AS (
         SELECT c.key_a, c.key_b,
                len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS inter_n,
                len(sa.sh) + len(sb.sh)
                  - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS union_n
         FROM cand c
         JOIN s sa ON sa.doc_id = c.key_a
         JOIN s sb ON sb.doc_id = c.key_b)
       SELECT key_a, key_b,
              round(inter_n / union_n::DOUBLE, 6) AS jaccard
       FROM scored WHERE inter_n * 2 >= 1 * union_n""",
    survey="§7.5 dedup (prefix filtering)",
    note="EXACT Jaccard >= 1/2 self-join via AllPairs/PPJoin prefix "
         "filtering (operators/dedup.py:ppjoin_prefix_pairs) over the "
         "planted-mutation corpus: lossless (every qualifying pair "
         "returned — asserted against brute force in tests), yet "
         "candidates come from an equi-join on globally-rare prefix "
         "shingles, not all-pairs. The rational threshold keeps the "
         "prefix-length arithmetic integer-exact, so the whole "
         "algorithm — DF ranks, prefixes, candidates, exact scores — "
         "is hash-checked against the oracle replicating it")
def ext_dedup_ppjoin(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        ppjoin_prefix_pairs,
    )
    docs = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text"))
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutation")).alias("text"))
    corpus = docs.unionByName(mutated)
    return ppjoin_prefix_pairs(corpus, "doc_id", "text")


@register(
    "ext_line_dedup",
    """WITH corpus AS (
         SELECT doc_id,
                'shared banner ' || CAST(doc_id % 3 AS VARCHAR)
                  || chr(10) || text
                  || CASE WHEN doc_id % 4 = 0
                          THEN chr(10) || 'unique footer '
                               || CAST(doc_id AS VARCHAR)
                          ELSE '' END AS text
         FROM documents),
       lines AS (
         SELECT doc_id,
                generate_subscripts(string_split(text, chr(10)), 1) AS pos,
                unnest(string_split(text, chr(10))) AS line
         FROM corpus),
       dfreq AS (
         SELECT line, count(DISTINCT doc_id) AS line_df
         FROM lines GROUP BY line),
       kept AS (
         SELECT l.doc_id, l.pos, l.line
         FROM lines l JOIN dfreq d USING (line)
         WHERE d.line_df <= 5),
       agg AS (
         SELECT doc_id,
                array_to_string(list(line ORDER BY pos), chr(10))
                    AS cleaned_text,
                CAST(count(*) AS BIGINT) AS lines_kept
         FROM kept GROUP BY doc_id),
       tot AS (
         SELECT doc_id,
                CAST(len(string_split(text, chr(10))) AS BIGINT)
                    AS lines_total
         FROM corpus)
       SELECT t.doc_id,
              md5(COALESCE(a.cleaned_text, '')) AS cleaned_md5,
              CAST(COALESCE(a.lines_kept, 0) AS BIGINT) AS lines_kept,
              CAST(t.lines_total - COALESCE(a.lines_kept, 0) AS BIGINT)
                  AS lines_dropped
       FROM tot t LEFT JOIN agg a USING (doc_id)""",
    survey="§7.5 dedup (line-level boilerplate removal)",
    note="CCNet/RefinedWeb-style line dedup "
         "(operators/dedup.py:line_dedup): lines appearing in > 5 "
         "distinct documents are dropped everywhere, survivors "
         "reassembled in order — the dedup granularity BETWEEN doc "
         "fingerprints and chunk dedup, aimed at nav/cookie/footer "
         "boilerplate that contaminates most documents while making "
         "no two equal. The corpus plants a 3-variant shared banner "
         "(df≈n/3, dropped) and per-doc unique footers (df=1, kept) "
         "on the newline-free test docs, so drops and keeps are both "
         "non-vacuous and the exact reassembled text is byte-verified "
         "via its md5 (the registry output stays newline-free: every "
         "other checked entry's strings are single-line, so multiline "
         "values would ride an untested path of the driver's hash "
         "canonicalization — the md5 checks the same bytes without "
         "the exposure; tests check the raw text). Shape: explode → "
         "line-DF groupBy → join back → per-doc reassembly; linear "
         "in total lines, no pairwise step")
def ext_line_dedup(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        line_dedup,
    )
    corpus = (t(spark, sf_dir, "documents")
              .select("doc_id",
                      F.concat(
                          F.lit("shared banner "),
                          (F.col("doc_id") % 3).cast("string"),
                          F.lit("\n"), F.col("text"),
                          F.when(F.col("doc_id") % 4 == 0,
                                 F.concat(F.lit("\nunique footer "),
                                          F.col("doc_id").cast("string")))
                           .otherwise(F.lit(""))).alias("text")))
    return (line_dedup(corpus, "doc_id", "text", max_df=5)
            .select("doc_id",
                    F.md5("cleaned_text").alias("cleaned_md5"),
                    "lines_kept", "lines_dropped"))


@register(
    "ext_dedup_minhash_banded",
    f"""WITH {_PLANT_SQL},
       d AS (
         SELECT doc_id,
                {_SHINGLE_SQL} AS sh
         FROM corpus),
       s AS (SELECT doc_id, sh FROM d WHERE len(sh) > 0),
       sig AS (
         SELECT doc_id, sh,
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
         SELECT doc_id,
                md5(s0 || '|' || s1) AS b0, md5(s2 || '|' || s3) AS b1,
                md5(s4 || '|' || s5) AS b2, md5(s6 || '|' || s7) AS b3
         FROM sig),
       long AS (
         SELECT doc_id, 0 AS band_idx, b0 AS band_key FROM bands
         UNION ALL SELECT doc_id, 1, b1 FROM bands
         UNION ALL SELECT doc_id, 2, b2 FROM bands
         UNION ALL SELECT doc_id, 3, b3 FROM bands),
       cand AS (
         SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
         FROM long a JOIN long b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
          AND a.doc_id < b.doc_id),
       scored AS (
         SELECT c.key_a, c.key_b,
                len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS inter_n,
                len(sa.sh) + len(sb.sh)
                  - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    AS union_n
         FROM cand c
         JOIN s sa ON sa.doc_id = c.key_a
         JOIN s sb ON sb.doc_id = c.key_b)
       SELECT key_a, key_b,
              round(inter_n / union_n::DOUBLE, 6) AS jaccard
       FROM scored WHERE inter_n * 2 >= 1 * union_n""",
    survey="§7.5 dedup (MinHash-LSH, portable hash family)",
    note="banded MinHash near-dup join with a seeded-md5 hash family "
         "(operators/dedup.py:minhash_banded_pairs): 8 signatures -> "
         "4 bands x 2 rows, candidate equi-join on (band_idx, "
         "band_key), exact integer-Jaccard re-check at t=1/2 over the "
         "same planted-mutation corpus as ext_dedup_ppjoin (recall "
         "comparable side by side). Unlike the pyspark.ml MinHashLSH "
         "twin (ext_dedup_minhash, rows-only: ml-internal hash "
         "coefficients), every hash here is engine-portable, so the "
         "FULL pipeline — signatures, banding, candidates, scores — "
         "is value-hash-checked against the oracle")
def ext_dedup_minhash_banded(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        minhash_banded_pairs,
    )
    docs = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text"))
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutation")).alias("text"))
    corpus = docs.unionByName(mutated)
    return minhash_banded_pairs(corpus, "doc_id", "text")


@register(
    "ext_embedding_quantize",
    """WITH flat AS (
         SELECT vec_id,
                generate_subscripts(embedding, 1) AS pos,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM embeddings),
       f AS (SELECT * FROM flat WHERE pos <= 16),
       stats AS (
         SELECT pos, min(x) AS mn, max(x) AS mx FROM f GROUP BY pos)
       SELECT f.vec_id,
              CAST(f.pos AS BIGINT) AS pos,
              CAST(CASE WHEN s.mx = s.mn THEN 0
                        ELSE floor((f.x - s.mn) * 255.0 / (s.mx - s.mn))
                   END AS BIGINT) AS qcode
       FROM f JOIN stats s USING (pos)""",
    survey="§7.5 ext (vector quantization)",
    note="int8 scalar quantization of embeddings (first 16 dims): "
         "global per-dimension min/max (posexplode + one "
         "map-side-combinable agg over a 16-row stats table that "
         "broadcasts back), then floor-affine codes 0..255 — the "
         "storage/compression step of a vector index build (4x "
         "smaller than float32; IVF/LSH probe over codes, exact "
         "re-rank over originals). floor (not round) sidesteps "
         "half-tie rounding-mode differences; min/max are selection "
         "not arithmetic, and the affine expression is the same IEEE "
         "double ops on both engines -> hash-exact")
def ext_embedding_quantize(spark, sf_dir):
    flat = (t(spark, sf_dir, "embeddings")
            .select("vec_id", F.posexplode("embedding").alias("pos0", "x"))
            .filter(F.col("pos0") < 16)
            .select("vec_id", (F.col("pos0") + 1).cast("bigint").alias("pos"),
                    F.col("x").cast("double").alias("x")))
    stats = flat.groupBy("pos").agg(F.min("x").alias("mn"),
                                    F.max("x").alias("mx"))
    qcode = (F.when(F.col("mx") == F.col("mn"), F.lit(0))
             .otherwise(F.floor((F.col("x") - F.col("mn")) * 255.0
                                / (F.col("mx") - F.col("mn"))))
             .cast("bigint"))
    return (flat.join(F.broadcast(stats), "pos")
            .select("vec_id", "pos", qcode.alias("qcode")))


@register(
    "ext_training_manifest",
    """WITH q AS (
         SELECT doc_id, lang,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END::BIGINT AS n_tokens,
                CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80 THEN 'train'
                     WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents)
       SELECT q.doc_id, q.lang, q.split, q.n_tokens,
              round(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[])), 6)
                  AS embedding_norm,
              CAST(len(e.embedding) AS BIGINT) AS embedding_dim
       FROM q JOIN embeddings e ON e.vec_id = q.doc_id""",
    survey="§7.5 ext (training-record assembly)",
    note="the last-mile assembly: text-side features (token count, "
         "deterministic split) joined 1:1 with the vector side "
         "(embedding norm + dim) into the manifest a training loader "
         "reads — one equi-join on the shared id, both inputs "
         "column-pruned before the join so embedding payloads only "
         "flow for the columns used. At 100 TB both tables are "
         "bucketed on the id and the join is exchange-free "
         "(write_bucketed, tests/test_bucketing.py)")
def ext_training_manifest(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        as_double,
        l2_norm,
    )
    # pre-mod: see ext_stratified_sample overflow note
    m = (F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761)
    docs = (t(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    token_count("text").alias("n_tokens"),
                    F.when(m % 100 < 80, "train")
                    .when(m % 100 < 90, "val")
                    .otherwise("test").alias("split")))
    emb = (t(spark, sf_dir, "embeddings")
           .select(F.col("vec_id").alias("doc_id"),
                   F.round(l2_norm(as_double(F.col("embedding"))), 6)
                    .alias("embedding_norm"),
                   F.size("embedding").cast("bigint")
                    .alias("embedding_dim")))
    return (docs.join(emb, "doc_id")
            .select("doc_id", "lang", "split", "n_tokens",
                    "embedding_norm", "embedding_dim"))


@register(
    "ext_chunk_dedup",
    """WITH d AS (
         SELECT doc_id,
                string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks,
                CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                     ELSE len(string_split_regex(trim(coalesce(text, '')),
                              '\\s+'))
                END::BIGINT AS n
         FROM documents),
       chunks AS (
         SELECT doc_id,
                CAST(g.chunk_id AS BIGINT) AS chunk_id,
                array_to_string(list_slice(toks, g.chunk_id * 48 + 1,
                                least(g.chunk_id * 48 + 64, len(toks))), ' ')
                    AS chunk_text
         FROM d, LATERAL unnest(generate_series(
                  0, greatest((n - 16 + 47) // 48, 1) - 1)) AS g(chunk_id))
       SELECT md5(lower(regexp_replace(trim(chunk_text), '\\s+', ' ', 'g')))
                  AS fingerprint,
              min(doc_id * 1000000 + chunk_id) AS canonical_chunk,
              count(*) AS n_copies
       FROM chunks
       GROUP BY 1""",
    survey="§7.5 ext (chunk-level dedup composition)",
    note="exact dedup applied AFTER chunking — the sequence-level "
         "dedup pass a pretraining pipeline runs on top of doc-level "
         "dedup (overlapping windows and boilerplate create repeated "
         "chunks that doc-level fingerprints cannot see). Same "
         "fingerprint groupBy as ext_dedup_exact over the "
         "chunk_documents lineage; canonical key packs (doc, chunk) "
         "into one BIGINT so min() is a deterministic winner")
def ext_chunk_dedup(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        chunk_documents,
        fingerprint,
    )
    chunks = chunk_documents(t(spark, sf_dir, "documents"))
    return (chunks
            .select(fingerprint("chunk_text").alias("fingerprint"),
                    (F.col("doc_id") * 1_000_000 + F.col("chunk_id"))
                    .alias("ck"))
            .groupBy("fingerprint")
            .agg(F.min("ck").alias("canonical_chunk"),
                 F.count("*").alias("n_copies")))


@register(
    "ext_label_balance",
    """WITH c AS (
         SELECT label, count(*) AS n FROM embeddings GROUP BY label),
       m AS (SELECT max(n) AS mx, min(n) AS mn,
                    CAST(sum(n) AS BIGINT) AS total FROM c)
       SELECT c.label, c.n,
              CAST(10000 * c.n // m.total AS BIGINT) AS share_bp,
              CAST(10000 * m.mx // greatest(m.mn, 1) AS BIGINT)
                  AS imbalance_bp
       FROM c, m""",
    survey="§7.5 ext (class balance report)",
    note="label distribution + imbalance factor (max/min class ratio "
         "in basis points) — the class-balance check run before "
         "sampling weights are chosen; one groupBy plus a broadcast "
         "1-row global, integer arithmetic throughout")
def ext_label_balance(spark, sf_dir):
    c = (t(spark, sf_dir, "embeddings")
         .groupBy("label").agg(F.count("*").alias("n")))
    m = F.broadcast(c.agg(F.max("n").alias("mx"), F.min("n").alias("mn"),
                          F.sum("n").alias("total")))
    return (c.crossJoin(m)
            .select("label", "n",
                    F.floor(10000 * F.col("n") / F.col("total"))
                     .cast("bigint").alias("share_bp"),
                    F.floor(10000 * F.col("mx")
                            / F.greatest(F.col("mn"), F.lit(1)))
                     .cast("bigint").alias("imbalance_bp")))


@register(
    "ext_multimodal_audio_meta",
    """SELECT doc_id AS media_id,
              CAST(CASE doc_id % 3 WHEN 0 THEN 16000 WHEN 1 THEN 44100
                        ELSE 48000 END AS BIGINT) AS sample_rate,
              CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
              CAST(16 AS BIGINT) AS bits,
              CAST((n_chars % 2000 + 1) * 1000
                   // (CASE doc_id % 3 WHEN 0 THEN 16000 WHEN 1 THEN 44100
                            ELSE 48000 END) AS BIGINT) AS duration_ms
       FROM documents""",
    survey="§7.5 multimodal (audio decode)",
    note="REAL WAV header decode, hash-checked — the audio twin of "
         "ext_multimodal_image_meta: a valid RIFF/WAVE header is "
         "synthesized per document (rate/channels/frame-count derived "
         "from doc_id/n_chars), then operators/multimodal.py:"
         "wav_metadata walks the chunk list (fmt + data, word-aligned "
         "sizes) and recovers sample_rate/channels/bits/duration_ms; "
         "the oracle recomputes the expectations arithmetically so "
         "any chunk-walk bug breaks the hash")
def ext_multimodal_audio_meta(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        build_wav_payloads,
        extract_audio_meta,
    )

    dims = (t(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("media_id"),
                    F.when(F.col("doc_id") % 3 == 0, 16000)
                     .when(F.col("doc_id") % 3 == 1, 44100)
                     .otherwise(48000).alias("rate"),
                    (F.col("doc_id") % 2 + 1).alias("channels"),
                    (F.col("n_chars") % 2000 + 1).alias("n_samples")))
    return extract_audio_meta(build_wav_payloads(dims))


@register(
    "ext_multimodal_video_meta",
    """SELECT doc_id AS media_id,
              CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                        ELSE 90000 END AS BIGINT) AS timescale,
              CAST((n_chars % 36000 + 1) * 1000
                   // (CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                            ELSE 90000 END) AS BIGINT) AS duration_ms
       FROM documents""",
    survey="§7.5 multimodal (video decode)",
    note="REAL MP4 container decode, hash-checked — completes the "
         "image/audio/video trio: a valid ftyp+moov/mvhd box layout "
         "is synthesized per document (timescale/duration from "
         "doc_id/n_chars), then operators/multimodal.py:mp4_metadata "
         "walks the box tree (v0 and v1 mvhd) and recovers "
         "(timescale, duration_ms); the oracle recomputes both "
         "arithmetically so any box-walk bug breaks the hash")
def ext_multimodal_video_meta(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        extract_video_meta,
    )

    dims = (t(spark, sf_dir, "documents")
            .select(F.col("doc_id").alias("media_id"),
                    F.when(F.col("doc_id") % 3 == 0, 600)
                     .when(F.col("doc_id") % 3 == 1, 1000)
                     .otherwise(90000).alias("ts"),
                    (F.col("n_chars") % 36000 + 1).alias("dur")))
    return extract_video_meta(dims)
