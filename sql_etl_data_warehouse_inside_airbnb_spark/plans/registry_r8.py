"""Round-8 additions: deterministic k-fold assignment, blocked fuzzy
(edit-distance) matching, running distinct-cardinality windows, URL
canonicalization, and weighted medians.

Five workloads the r1-r7 surface brackets but doesn't express:

- ``ext_kfold_assign``: cross-validation fold assignment + the
  fold-balance audit. ``ext_train_split`` tags rows train/val/test
  with a Knuth multiplicative hash; k-fold CV needs the k-way
  generalization AND proof the folds came out balanced per stratum —
  this entry emits the (fold × lang) count/volume matrix that a
  training pipeline checks before trusting a split. Uses the
  portable bounded-hash idiom (md5 prefix → int) so the SAME doc
  lands in the SAME fold on every engine, every run, every
  repartitioning.
- ``ext_fuzzy_blocked_join``: entity-resolution fuzzy matching — the
  classic record-linkage shape (Fellegi-Sunter blocking; cf. the
  dedup family's PPJoin, which matches on token-set Jaccard, not
  character edits). Re-encoded r13: radius-bounded (edit <= 2) best
  match with PassJoin segment-keyed candidates — the r8-r12 version
  joined on a fixed-cardinality block key, which the sf0.1→sf0.5
  scale measurement showed to be quadratic in data size (SCALE.md).
- ``w11_running_distinct``: running COUNT(DISTINCT) per key over
  event time — incremental cardinality (catalog breadth per
  supplier, unique-users-to-date) that a plain window cannot express
  because count_distinct is not frame-mergeable. The standard
  rewrite: first-occurrence flag (row_number = 1 over key×value)
  then a running sum — both engines agree exactly because the
  ordering key is total.
- ``ext_url_canonicalize``: the first dedup pass of every web-corpus
  pipeline — the same page under scheme/www/port/tracking-param/
  fragment/trailing-slash variation collapses to one canonical key
  that then feeds the exact/MinHash dedup family.
- ``a36_weighted_median``: the weighted quantile the percentile
  ladder cannot express — division-free (2·cum ≥ tot) over integer
  cents, exact on both engines.

All compared columns are integers or canonical strings (counts,
keys, edit distances, cents) — the canonical hash-green encodings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)


from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_r6 import (
    md5_mod,
    md5_mod_sql,
)


@register(
    "ext_kfold_assign",
    f"""WITH folds AS (
         SELECT doc_id, lang, n_chars,
                {md5_mod_sql("CAST(doc_id AS VARCHAR)", 5)} AS fold
         FROM documents)
       SELECT fold, lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM folds GROUP BY fold, lang""",
    survey="§7.5 curation ext (k-fold CV assignment + balance audit)",
    note="5-fold cross-validation assignment over documents, plus the "
         "fold-balance audit a pipeline runs before trusting a split: "
         "fold id = bounded md5 hash of the doc key mod k (the "
         "portable-hash idiom — conv(substr(md5)) in Spark, "
         "'0x'||substr cast in DuckDB — so assignment is reproducible "
         "across engines, runs, and repartitionings, where rand() "
         "splits are none of the three), then the (fold × lang) "
         "count/char-volume matrix. Complements ext_train_split "
         "(row-level 80/10/10 tags): k-fold is the EVALUATION split, "
         "and the audit output is the part that catches a skewed "
         "fold before it skews the metric. Stateless hash projection "
         "+ one map-side-combinable groupBy; at 100 TB the hash is "
         "computed in the scan stage and the audit matrix is "
         "k×|langs| rows — nothing wide ever materializes",
    tags=("llm-pipeline",))
def ext_kfold_assign(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fold = md5_mod(F.col("doc_id").cast("string"), 5)
    return (d.select(fold.alias("fold"), "lang", "n_chars")
            .groupBy("fold", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


@register(
    "ext_fuzzy_blocked_join",
    """WITH p AS (SELECT p_partkey, p_name, p_brand, p_size,
                      length(p_name) AS len
               FROM part),
       cand AS (
         SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
                CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                    AS edit_dist
         FROM p a JOIN p b
           ON a.p_brand = b.p_brand AND a.p_size = b.p_size
          AND abs(a.len - b.len) <= 1
          AND a.p_partkey <> b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 2)
       SELECT part_a, part_b, edit_dist
       FROM (SELECT cand.*,
                    row_number() OVER (PARTITION BY part_a
                                       ORDER BY edit_dist, part_b)
                        AS rn
             FROM cand)
       WHERE rn = 1""",
    survey="§7.5 dedup/ER ext (radius-bounded fuzzy match, PassJoin)",
    note="entity-resolution fuzzy matching, re-encoded r13 after the "
         "sf0.1→sf0.5 scale measurement caught the original "
         "quadratic: best in-block match by Levenshtein, now "
         "RADIUS-BOUNDED (edit_dist <= 2 — the production "
         "record-linkage contract; a 'best match' at distance 20 is "
         "not a match) with PassJoin-style candidate generation "
         "(Li/Deng/Feng, PVLDB 2011). The original joined on the "
         "composed (brand, size, length-band) key alone — a "
         "FIXED-cardinality key (6024 micro-blocks at every sf), so "
         "block sizes grow ∝ n and candidates Σb² ∝ n²: measured "
         "199k pairs at sf0.1 → 5.38M at sf0.5 (27× for 5× data; "
         "exponent 1.86 in SCALE.md). The re-encode keys the join on "
         "CONTENT: each indexed name splits into K+1 = 3 contiguous "
         "segments; by pigeonhole, ≤ K = 2 edits leave ≥ 1 segment "
         "intact, position-shifted by at most the ±K net indels "
         "before it, so (brand, size, partner-len, slot, segment) "
         "equi-keys are a COMPLETE candidate filter. The probe side "
         "enumerates ≤ 45 bounded substrings per record (3 partner "
         "lengths × 3 slots × 5 shifts); only names under K+1 = 3 "
         "chars (cannot hold 3 non-empty segments) fall back to a "
         "whole-block key — a degenerate population, empty in this "
         "schema. Candidate volume now scales "
         "with content diversity instead of block², then DISTINCT "
         "pairs, ONE Levenshtein DP each, radius filter, per-record "
         "best by (distance, key) — deterministic. The oracle "
         "computes the same output brute-force within blocks; "
         "candidate completeness is pinned against brute force in "
         "tests/test_r8.py and tests/test_r9.py. At 100 TB: shuffle "
         "∝ segment keys (content-keyed, cardinality grows with "
         "data), never block-pairs; no global sort",
    tags=("llm-pipeline",))
def ext_fuzzy_blocked_join(spark, sf_dir):
    # r13 (guide §2.4/§2.5): dedup=False — duplicate candidate rows
    # (a pair sharing several intact segments) cannot change the rn=1
    # winner (the duplicate rows are IDENTICAL after the edit_dist
    # projection), so the candidate .distinct() exchange bought
    # nothing but fewer Levenshtein DPs (98.5k -> 64k rows at sf0.1,
    # measured) at the price of shuffling every candidate WITH both
    # name payloads. Without it the leven + radius filter run
    # MAP-SIDE right after the broadcast join, and the only exchange
    # left is the tiny post-radius window shuffle.
    cand = (_fuzzy_candidate_pairs(spark, sf_dir, dedup=False)
            .select(F.col("a_key").alias("part_a"),
                    F.col("b_key").alias("part_b"),
                    F.levenshtein("a_name", "b_name").cast("long")
                    .alias("edit_dist"))
            .filter(F.col("edit_dist") <= 2))
    w = Window.partitionBy("part_a").orderBy("edit_dist", "part_b")
    return (cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _fuzzy_candidate_pairs(spark, sf_dir, dedup=True):
    """PassJoin segment-keyed candidate generation for
    ext_fuzzy_blocked_join: (a_key, a_name, b_key, b_name) pairs
    sharing a (brand, size, partner-len, slot, segment) key —
    a complete filter for (|Δlen| <= 1, edit <= 2) by pigeonhole.
    ``dedup=True`` (the tests/test_r9.py audit contract) returns
    DISTINCT pairs; the query path passes ``dedup=False`` because the
    downstream rn=1 winner is duplicate-invariant (see the entry).
    The part scan is fanned out before the segment explode: the sf
    files are single-row-group (one scan task), and the explode +
    join + Levenshtein otherwise run on one core (guide §2.5 input
    skew; no-op at scale by construction)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    p = (fan_out(t(spark, sf_dir, "part"), "p_partkey")
         .select("p_partkey", "p_name", "p_brand", "p_size")
         .withColumn("__len", F.length("p_name")))
    # index side: the 3 contiguous segments of every name (slot 2
    # takes the remainder); names under 3 chars (cannot hold 3
    # non-empty segments) get a whole-block key
    seg_expr = F.expr("""
        CASE WHEN __len >= 3 THEN
          transform(sequence(0, 2), s -> struct(
            s AS slot,
            substring(p_name,
                      CASE WHEN s = 2 THEN 2 * (__len div 3) + 1
                           ELSE s * (__len div 3) + 1 END,
                      CASE WHEN s = 2 THEN __len - 2 * (__len div 3)
                           ELSE __len div 3 END) AS seg))
        ELSE array(struct(-1 AS slot, '' AS seg))
        END""")
    build = (p.select("p_partkey", "p_name", "p_brand", "p_size",
                      "__len", F.explode(seg_expr).alias("sg"))
             .select(F.col("p_partkey").alias("b_key"),
                     F.col("p_name").alias("b_name"),
                     F.col("p_brand").alias("b_brand"),
                     F.col("p_size").alias("b_size"),
                     F.col("__len").alias("b_len"),
                     F.col("sg.slot").alias("slot"),
                     F.col("sg.seg").alias("seg")))
    # probe side: for every admissible partner length lp = len ± 1
    # and slot, every substring a <=2-edit transcript could leave
    # the partner's untouched segment at (canonical start ± 2)
    probe_expr = F.expr("""
        flatten(transform(sequence(-1, 1), dl ->
          CASE WHEN __len + dl >= 3 THEN
            filter(
              flatten(transform(sequence(0, 2), s ->
                transform(sequence(-2, 2), sh -> struct(
                  __len + dl AS blen,
                  s AS slot,
                  (CASE WHEN s = 2 THEN 2 * ((__len + dl) div 3)
                        ELSE s * ((__len + dl) div 3) END) + sh
                      AS pos,
                  CASE WHEN s = 2
                       THEN (__len + dl) - 2 * ((__len + dl) div 3)
                       ELSE (__len + dl) div 3 END AS sl)))),
              x -> x.pos >= 0 AND x.pos + x.sl <= __len)
          ELSE array(struct(__len + dl AS blen, -1 AS slot,
                            0 AS pos, 0 AS sl))
          END))""")
    probe = (p.select("p_partkey", "p_name", "p_brand", "p_size",
                      "__len", F.explode(probe_expr).alias("pr"))
             .select(F.col("p_partkey").alias("a_key"),
                     F.col("p_name").alias("a_name"),
                     "p_brand", "p_size",
                     F.col("pr.blen").alias("blen"),
                     F.col("pr.slot").alias("pslot"),
                     F.when(F.col("pr.slot") == -1, F.lit(""))
                      .otherwise(F.expr(
                          "substring(p_name, pr.pos + 1, pr.sl)"))
                     .alias("pseg")))
    cand = (probe.join(
                build,
                (F.col("p_brand") == F.col("b_brand"))
                & (F.col("p_size") == F.col("b_size"))
                & (F.col("blen") == F.col("b_len"))
                & (F.col("pslot") == F.col("slot"))
                & (F.col("pseg") == F.col("seg"))
                & (F.col("a_key") != F.col("b_key")))
            .select("a_key", "a_name", "b_key", "b_name"))
    return cand.distinct() if dedup else cand


@register(
    "w11_running_distinct",
    """WITH f AS (
         SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                CASE WHEN row_number() OVER (
                         PARTITION BY l_suppkey, l_partkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ) = 1 THEN 1 ELSE 0 END AS fst
         FROM lineitem)
       SELECT l_suppkey, l_orderkey, l_linenumber,
              CAST(sum(fst) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS distinct_parts_seen
       FROM f""",
    survey="§2.5 window ext (running count-distinct)",
    note="running DISTINCT cardinality per key over event time — "
         "distinct parts each supplier has shipped as of every line "
         "(the unique-users-to-date / catalog-breadth metric). "
         "count(DISTINCT) is not frame-mergeable, so no window frame "
         "computes it directly; the standard rewrite is exact: a "
         "first-occurrence flag (row_number = 1 over supplier×part, "
         "ordered by the TOTAL key shipdate→orderkey→linenumber, so "
         "both engines agree on which row is 'first') then a running "
         "sum of flags over the supplier partition. ONE shuffle, two "
         "sorts: left alone, Catalyst inserts an exchange per window "
         "(hash(sup,part) then hash(sup)); the explicit supplier-only "
         "repartition satisfies BOTH windows' clustering "
         "(HashPartitioning(sup) ⊆ ClusteredDistribution(sup, part)) "
         "so the second exchange — a full re-shuffle of the fact — "
         "disappears (plan pinned in tests/test_r8.py). Skew exposure "
         "is unchanged: the running-sum window needs per-supplier "
         "co-location regardless. Integer outputs hash exactly",
    tags=())
def w11_running_distinct(spark, sf_dir):
    li = (t(spark, sf_dir, "lineitem")
          .select("l_suppkey", "l_orderkey", "l_linenumber",
                  "l_shipdate", "l_partkey")
          .repartition(F.col("l_suppkey")))
    w1 = (Window.partitionBy("l_suppkey", "l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber"))
    w2 = (Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fst = F.when(F.row_number().over(w1) == 1, 1).otherwise(0)
    return (li.withColumn("__fst", fst)
            .select("l_suppkey", "l_orderkey", "l_linenumber",
                    F.sum("__fst").over(w2).cast("long")
                    .alias("distinct_parts_seen")))


@register(
    "ext_url_canonicalize",
    """WITH arms AS (
         SELECT doc_id, source, arm,
                CASE arm
                  WHEN 0 THEN 'HTTPS://WWW.' || source
                       || '.Example.COM:443/docs/' || doc_id
                       || '/?utm_source=feed&page=2&utm_medium=rss#frag'
                  WHEN 1 THEN 'https://' || source
                       || '.example.com/docs/' || doc_id || '?page=2'
                  ELSE 'http://www.' || source
                       || '.EXAMPLE.com:80/docs/' || doc_id
                       || '/?page=2&utm_campaign=x'
                END AS url
         FROM documents
         CROSS JOIN (SELECT unnest([0, 1, 2]) AS arm)),
       canon AS (
         SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)',
                                         1)),
                    '^www\\.', ''),
                  ':(80|443)$', '') AS host,
                regexp_replace(
                  regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)',
                                 1),
                  '/$', '') AS path,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_extract(url, '\\?([^#]*)', 1),
                      '(^|&)utm_[a-z]+=[^&]*', '', 'g'),
                    '&&+', '&', 'g'),
                  '^&+|&+$', '', 'g') AS query
         FROM arms)
       SELECT doc_id,
              host || path
                   || CASE WHEN query = '' THEN ''
                           ELSE '?' || query END AS canonical_url,
              CAST(count(*) AS BIGINT) AS n_variants
       FROM canon
       GROUP BY doc_id,
                host || path
                     || CASE WHEN query = '' THEN ''
                             ELSE '?' || query END""",
    survey="§7.5 curation ext (URL canonicalization for web dedup)",
    note="URL canonicalization — the FIRST dedup pass of every web "
         "corpus pipeline (CommonCrawl-style): the same page arrives "
         "as https://www.Host.com:443/p/?utm_source=..#frag, "
         "https://host.com/p?page=2, http://www.host.COM:80/..., and "
         "exact text-hash dedup misses them all. Three messy arms are "
         "synthesized per document (the f6 build-then-parse pattern, "
         "since the corpus has no URL column) and canonicalized with "
         "a declared rule: the canonical KEY drops the scheme "
         "(http/https serve the same page — the standard dedup-key "
         "choice), lowercases the host, strips www. and default "
         "ports 80/443, drops the fragment, drops utm_* tracking "
         "params (keeping real ones) and re-tidies the & separators, "
         "and strips the trailing slash. All three arms collapse to "
         "ONE canonical key per doc (n_variants = 3 — the groupBy "
         "proves the collapse; pinned in tests/test_r8.py). Pure "
         "regexp projections + one combinable groupBy; patterns "
         "avoid every known Java-vs-RE2 divergence (no lookaheads — "
         "RE2 has none — no \\s, no case-insensitive flags; DuckDB "
         "regexp_replace needs the explicit 'g' flag where Spark "
         "replaces all matches by default — the multi-param arm "
         "exercises exactly that). At 100 TB this is a stateless "
         "scan-stage map; the canonical key then feeds the "
         "exact/MinHash dedup family",
    tags=("llm-pipeline",))
def ext_url_canonicalize(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    did = F.col("doc_id").cast("string")
    arms = d.withColumn("url", F.explode(F.array(
        F.concat(F.lit("HTTPS://WWW."), F.col("source"),
                 F.lit(".Example.COM:443/docs/"), did,
                 F.lit("/?utm_source=feed&page=2&utm_medium=rss#frag")),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/docs/"), did, F.lit("?page=2")),
        F.concat(F.lit("http://www."), F.col("source"),
                 F.lit(".EXAMPLE.com:80/docs/"), did,
                 F.lit("/?page=2&utm_campaign=x")))))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]*)",
                                     1)),
            r"^www\.", ""),
        r":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1),
        r"/$", "")
    query = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract("url", r"\?([^#]*)", 1),
                r"(^|&)utm_[a-z]+=[^&]*", ""),
            r"&&+", "&"),
        r"^&+|&+$", "")
    canonical = F.concat(
        host, path,
        F.when(query == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), query)))
    return (arms.select("doc_id", canonical.alias("canonical_url"))
            .groupBy("doc_id", "canonical_url")
            .agg(F.count("*").alias("n_variants")))


@register(
    "a36_weighted_median",
    """WITH w AS (
         SELECT l_returnflag AS flag,
                CAST(CAST(l_extendedprice AS DECIMAL(19,2)) * 100
                     AS BIGINT) AS cents,
                CAST(l_quantity AS BIGINT) AS wt
         FROM lineitem),
       c AS (
         SELECT flag, cents, wt,
                sum(wt) OVER (PARTITION BY flag ORDER BY cents)
                    AS cum,
                sum(wt) OVER (PARTITION BY flag) AS tot
         FROM w)
       SELECT flag,
              CAST(min(cents) AS BIGINT) AS wmedian_cents
       FROM c WHERE 2 * cum >= tot GROUP BY flag""",
    survey="§2.4 agg ext (weighted median / weighted quantile)",
    note="quantity-weighted median price per return flag — the "
         "weighted quantile the percentile ladder (a22 "
         "percentile_disc, a20 approx sketches) cannot express: each "
         "row counts wt times, so the median of PRICES-PER-UNIT-SOLD "
         "differs from the row median whenever price and volume "
         "correlate. Exact and division-free: running weight over the "
         "value-ordered partition (the default RANGE frame includes "
         "equal-value peers, so intra-tie row order cannot matter on "
         "either engine), total by an unordered partition window, and "
         "the answer is the smallest value whose 2*cum >= tot — the "
         "lower weighted median, integer cents in, integer cents out. "
         "One shuffle on the group key serves both windows and the "
         "final groupBy (same-key exchange reuse); at 100 TB groups "
         "are value-sorted within partitions, never globally. The "
         "encoding follows ts5: prices carry exactly 2 real decimals "
         "so cents are exact int64",
    tags=())
def a36_weighted_median(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"))
    cum = F.sum("wt").over(
        Window.partitionBy("flag").orderBy("cents"))
    tot = F.sum("wt").over(Window.partitionBy("flag"))
    c = w.select("flag", "cents",
                 cum.alias("cum"), tot.alias("tot"))
    return (c.filter(2 * F.col("cum") >= F.col("tot"))
            .groupBy("flag")
            .agg(F.min("cents").alias("wmedian_cents")))


def _simhash_portable_oracle() -> str:
    """DuckDB oracle for ext_dedup_simhash_portable: the ENTIRE
    pipeline — word 3-gram shingles (the _SHINGLE_SQL mirror of
    functions/text.py:shingles), bounded-md5 shingle hash, 32 per-bit
    ±1 majority votes, fingerprint assembly, 4×8-bit banding, band
    equi-join, Hamming filter — reproduced in SQL, so the SimHash family gains a hash-checked member (the
    xxhash64 production twin is rows-only by necessity)."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32))
    fp = " + ".join(f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END"
                    for i in range(32))
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_ext import (
        _SHINGLE_SQL,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry_ext import (
        _PLANT_SQL,
    )
    return f"""WITH {_PLANT_SQL},
       sh AS (
         SELECT doc_id, unnest({_SHINGLE_SQL}) AS s
         FROM corpus),
       th AS (SELECT doc_id,
                     CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)
                         AS h
              FROM sh),
       votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
       fp AS (SELECT doc_id, ({fp}) AS simhash FROM votes),
       bands AS (SELECT doc_id, simhash, b.band_id,
                        (simhash >> (8 * b.band_id)) & 255 AS band_val
                 FROM fp,
                      (SELECT unnest([0, 1, 2, 3]) AS band_id) b),
       pairs AS (SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b,
                        CAST(bit_count(xor(a.simhash, b.simhash))
                             AS BIGINT) AS hamming
                 FROM bands a JOIN bands b
                   ON a.band_id = b.band_id
                  AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id)
       SELECT key_a, key_b, hamming FROM pairs WHERE hamming <= 3"""


@register(
    "ext_dedup_simhash_portable",
    _simhash_portable_oracle(),
    survey="§7.5 dedup ext (SimHash, oracle-checkable portable form)",
    note="near-dup pairs by a PORTABLE 32-bit SimHash "
         "(operators/dedup.py:simhash_portable_pairs): distinct word "
         "3-gram SHINGLES hash through the bounded-md5 idiom "
         "(identical in Spark and ANSI SQL), per-bit ±1 majority "
         "votes fold into a fingerprint in ONE pass over the shingle "
         "array (the simhash64 fold shape — no explode on the Spark "
         "side), 4×8-bit banding guarantees Hamming ≤ 3 pairs share "
         "a band (pigeonhole), and the band equi-join + exact "
         "bit_count re-check never goes all-pairs. Shingles, not "
         "tokens: single-token SimHash degenerates on a templated "
         "corpus (shared vocabulary pulled 1.57M of 12.5M possible "
         "pairs within Hamming 3 when measured); 3-grams carry word "
         "ORDER, the thing a near-dup preserves. The point of the "
         "entry: the 64-bit production twin (ext_dedup_simhash) "
         "hashes with xxhash64 and can only be rows-only verified; "
         "this twin reproduces the ENTIRE pipeline in the DuckDB "
         "oracle, hash-checking shingle→hash→vote→band→join→filter "
         "cross-engine and semantically anchoring the family. At "
         "100 TB run the 64-bit form with 16-bit bands — band width "
         "scales with log N to hold bucket sizes constant. Runs on "
         "the dedup family's planted corpus (10%% sample + ' mutation'"
         " twins keyed +10000000, the ext_dedup_minhash known-answer "
         "workload) so true near-dups exist BY CONSTRUCTION and the "
         "planted pairs' surfacing is test-asserted",
    tags=("llm-pipeline",))
def ext_dedup_simhash_portable(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        simhash_portable_pairs,
    )
    docs = (t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0))
    mutated = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mutation")).alias("text"))
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    return simhash_portable_pairs(corpus, "doc_id", "text",
                                  max_hamming=3)


@register(
    "stream_distinct_users",
    """SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
       FROM events GROUP BY event_type""",
    survey="§7.5 streaming ext (stateful running distinct cardinality)",
    note="batch meaning of the custom stateful running-unique-users "
         "operator (streaming/stateful_distinct.py, "
         "applyInPandasWithState): the stream keeps the SET of seen "
         "user ids per event_type as explicit columnar state and "
         "emits the updated cardinality each micro-batch — exactly-"
         "once across batches because the set, not the count, is the "
         "state (w11_running_distinct's first-occurrence-flag rewrite "
         "needs a total order a stream doesn't have). stream==batch "
         "equivalence — including a user re-appearing in a later "
         "micro-batch and per-key monotone emissions — is pinned in "
         "tests/test_streaming_stateful2.py. At 100 TB state "
         "partitions by key and grows with TRUE cardinality; for "
         "open-ended audiences swap the exact set for an HLL register "
         "(a33's merge algebra) with the operator shape unchanged",
    tags=("llm-pipeline",))
def stream_distinct_users(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.stateful_distinct import (
        distinct_users_batch,
    )
    return distinct_users_batch(t(spark, sf_dir, "events"))


@register(
    "e9_peak_concurrency",
    """WITH g AS (
         SELECT user_id, ts, event_id,
                epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    AS gap_us
         FROM events),
       s AS (
         SELECT user_id, ts,
                SUM(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_idx
         FROM g),
       sess AS (
         SELECT user_id, session_idx,
                CAST(min(ts) AS DATE) AS day,
                CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
                CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
         FROM s GROUP BY user_id, session_idx),
       deltas AS (
         SELECT day, start_us AS t, 1 AS d, user_id, session_idx
         FROM sess
         UNION ALL
         SELECT day, end_us, -1, user_id, session_idx FROM sess),
       r AS (
         SELECT day, d,
                sum(d) OVER (PARTITION BY day
                             ORDER BY t, d DESC, user_id, session_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS run
         FROM deltas)
       SELECT day,
              CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_sessions,
              CAST(max(run) AS BIGINT) AS peak_concurrent
       FROM r GROUP BY day""",
    survey="§7.5 event analytics ext (sweep-line max-overlap)",
    note="peak simultaneous sessions per day "
         "(operators/events.py:peak_concurrency) — the sweep-line "
         "interval aggregate no groupBy can produce, because "
         "concurrency is a property of interval OVERLAP: each "
         "e5-rule session becomes (+1 at start, -1 at end), the "
         "running delta sum IS the instantaneous concurrency, and "
         "its per-day max is the capacity-planning number. Declared "
         "conventions applied identically on both engines: sessions "
         "belong to their START day; intervals are CLOSED (+1 sorts "
         "before -1 at equal instants, so touching sessions overlap "
         "and single-event sessions register 1); the sweep order "
         "(t, d desc, user, session_idx) is total so every prefix "
         "sum agrees. Two semantic shuffles (user for the session "
         "build, day for the sweep); at 100 TB sub-split the sweep "
         "by hour and carry closing counts as prefix offsets — the "
         "standard distributed sweep-line refinement. All-integer "
         "output",
    tags=())
def e9_peak_concurrency(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
        peak_concurrency,
    )
    return peak_concurrency(t(spark, sf_dir, "events"), gap_minutes=30)
