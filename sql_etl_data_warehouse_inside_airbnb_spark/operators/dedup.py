"""Deduplication operators for training-data pipelines (SURVEY §7.5).

Generalizes the reference's dedup family (W1 latest-per-key, W2
arbitrary-winner, J4 anti-join idempotency) to content-based dedup:

- exact: hash-groupBy on a normalized fingerprint — one shuffle on the
  fingerprint, no driver-side state; at 100 TB the fingerprint groupBy
  is the canonical map-side-combinable aggregation.
- n-gram Jaccard: blocked self-join (block key caps the pair explosion)
  + set-similarity on distinct shingles.
- MinHash + LSH: pyspark.ml MinHashLSH (banded hashing → bucket join)
  — the scale path: candidate generation is a join on hash buckets, not
  an O(n²) cross product.
- SimHash: 64-bit fingerprint via per-token xxhash64 bit votes; banded
  16-bit bucket join → Hamming-distance filter. Pure column
  expressions, no UDF.
- embedding cosine: blocked pairwise cosine over array<float> columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    fingerprint,
    shingles,
)


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: canonical = min key,
    n_copies = group size."""
    return (df.select(fingerprint(text_col).alias("fingerprint"),
                      F.col(key_col))
            .groupBy("fingerprint")
            .agg(F.min(key_col).alias("canonical_" + key_col),
                 F.count("*").alias("n_copies")))


def jaccard_similarity(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter / union.cast("double"))


def ngram_jaccard_pairs(df: DataFrame, key_col: str, text_col: str,
                        block_col: str, n: int = 3,
                        threshold: float = 0.0,
                        length_bucket: int | None = None,
                        minhash_band: bool = False) -> DataFrame:
    """Near-dup candidate pairs by n-gram Jaccard within blocks.

    The composed block key bounds the join fan-out. ``block_col`` alone
    (e.g. language, ~5 values) makes each block O(N/5) and the
    self-join O(N²/25) — a scale-killer. Composing it with:

    - ``length_bucket``: floor(|shingles| / bucket) — the classic
      set-similarity length filter (near-dups have near-equal sizes);
    - ``minhash_band``: min(md5(shingle)) — a 1-hash MinHash band; two
      documents share it with probability equal to their shingle
      Jaccard, so true near-dups stay co-blocked while the band's
      cardinality grows with the corpus vocabulary (≈ distinct
      shingles), keeping block sizes O(1) as N grows.

    md5 (not xxhash64) keeps the band engine-portable, so the whole
    candidate generation stays oracle-checkable in DuckDB.
    Output: (key_a, key_b, jaccard)."""
    base = df.select(F.col(key_col), F.col(block_col),
                     shingles(text_col, n).alias("sh"))
    keys = [block_col]
    if length_bucket:
        base = base.withColumn(
            "__lb", F.floor(F.size("sh") / F.lit(length_bucket)))
        keys.append("__lb")
    if minhash_band:
        # min over empty shingle set is NULL -> null-keyed docs join
        # nothing (same semantics in DuckDB).
        base = base.withColumn(
            "__band", F.array_min(F.transform("sh", lambda s: F.md5(s))))
        keys.append("__band")
    a = base.alias("a")
    b = base.alias("b")
    sim = jaccard_similarity(F.col("a.sh"), F.col("b.sh"))
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in keys]
    cond.append(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
    return (a.join(b, on=cond)
            .select(F.col(f"a.{key_col}").alias("key_a"),
                    F.col(f"b.{key_col}").alias("key_b"),
                    F.round(sim, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_candidate_pairs(df: DataFrame, key_col: str, text_col: str,
                            num_hashes: int = 16,
                            jaccard_threshold: float = 0.5,
                            num_features: int = 1 << 18) -> DataFrame:
    """MinHash+LSH near-dup candidates via pyspark.ml: shingle →
    HashingTF (sparse binary) → MinHashLSH approxSimilarityJoin.

    Scale path: LSH banding turns all-pairs into a bucket equi-join;
    distance computation happens only within buckets. Deterministic
    given the fixed seed. Returns (key_a, key_b, jaccard_distance)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # The lazy localCheckpoint is a PLAN BARRIER, not an optimization:
    # approxSimilarityJoin's self-join rewrite evaluates the LSH hash
    # UDF on rows the size(sh) > 0 filter excludes (observed on Spark
    # 4.1.2 — a corpus containing any doc with < n tokens, e.g. an
    # empty or whitespace-only document, crashes the join with
    # "Must have at least 1 non zero entry" even though model
    # .transform() on the SAME filtered relation succeeds; surfaced
    # by tools/hostile_parity.py's hostile-text mode). The barrier
    # pins the filter below the UDF. It also stops the self-join from
    # re-tokenizing the corpus once per side — at scale the shingle
    # relation materializes once and feeds both.
    sh = (df.select(F.col(key_col), shingles(text_col).alias("sh"))
          .filter(F.size("sh") > 0)
          .localCheckpoint(eager=False))
    tf = HashingTF(inputCol="sh", outputCol="features", binary=True,
                   numFeatures=num_features)
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hashes, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - jaccard_threshold,
                                       distCol="jaccard_distance")
    return (pairs
            .filter(F.col(f"datasetA.{key_col}") < F.col(f"datasetB.{key_col}"))
            .select(F.col(f"datasetA.{key_col}").alias("key_a"),
                    F.col(f"datasetB.{key_col}").alias("key_b"),
                    F.round("jaccard_distance", 6).alias("jaccard_distance")))


def _shingle_sets(df: DataFrame, key_col: str, text_col: str,
                  n: int) -> DataFrame:
    """(key, sh) — per-doc distinct shingle sets, empty docs dropped
    (no shingles → nothing to sign, nothing to verify)."""
    return (df.select(F.col(key_col), shingles(text_col, n).alias("sh"))
            .filter(F.size("sh") > 0))


def _minhash_bands(sh: DataFrame, key_col: str, num_hashes: int,
                   band_rows: int) -> DataFrame:
    """(key, band_idx, band_key) from a :func:`_shingle_sets`
    relation — the seeded-md5 MinHash family banded b × r (shared by
    the batch self-join and the incremental ingest path, so an index
    built by one is joinable by the other BY CONSTRUCTION)."""

    def sig(i: int) -> Column:
        return F.array_min(F.transform(
            F.col("sh"), lambda g: F.md5(F.concat(F.lit(f"mh{i}:"), g))))

    signed = sh.select(key_col,
                       *[sig(i).alias(f"__s{i}") for i in range(num_hashes)])
    n_bands = num_hashes // band_rows
    band_keys = [
        F.md5(F.concat_ws("|", *[F.col(f"__s{b * band_rows + r}")
                                 for r in range(band_rows)]))
        for b in range(n_bands)]
    return signed.select(
        key_col,
        F.posexplode(F.array(*band_keys)).alias("band_idx", "band_key"))


def minhash_banded_pairs(df: DataFrame, key_col: str, text_col: str,
                         n: int = 3, num_hashes: int = 8,
                         band_rows: int = 2,
                         threshold_num: int = 1,
                         threshold_den: int = 2) -> DataFrame:
    """Engine-portable banded MinHash near-dup join — the classic
    b-bands × r-rows LSH (Broder '97 / MMDS ch.3) built from column
    expressions only, no ml-lib hashes:

    - signature_i(doc) = lexicographic MIN over the doc's shingles of
      md5('mh{i}:' || shingle) — a seeded hash family whose min is a
      valid MinHash (uniform over hex strings; min of lowercase hex is
      identical cross-engine, the winnowing trick);
    - band key b = md5(sig[b*r] || '|' || ... ) — candidate pairs are
      an equi-join on (band_idx, band_key): one narrow shuffle whose
      fan-out tracks bucket sizes, never all-pairs;
    - exact Jaccard re-check with the integer-exact threshold test
      (inter*den >= num*union), so precision is exact; recall is the
      standard 1-(1-J^r)^b curve but DETERMINISTIC given the fixed
      hash family — every engine computes the identical candidate set.

    The md5 family makes the whole operator oracle-checkable
    (DuckDB: list_min(list_transform(sh, s -> md5(...)))), unlike the
    pyspark.ml MinHashLSH path (:func:`minhash_candidate_pairs`) whose
    hash coefficients are engine-internal. Output: (key_a, key_b,
    jaccard)."""
    assert num_hashes % band_rows == 0
    sh = _shingle_sets(df, key_col, text_col, n)
    banded = _minhash_bands(sh, key_col, num_hashes, band_rows)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, on=[F.col("a.band_idx") == F.col("b.band_idx"),
                          F.col("a.band_key") == F.col("b.band_key"),
                          F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
            .select(F.col(f"a.{key_col}").alias("key_a"),
                    F.col(f"b.{key_col}").alias("key_b"))
            .distinct())
    sa = sh.select(F.col(key_col).alias("key_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(key_col).alias("key_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cand.join(sa, "key_a").join(sb, "key_b")
            .filter(inter * threshold_den >= threshold_num * union)
            .select("key_a", "key_b",
                    F.round(jaccard_similarity(F.col("sh_a"),
                                               F.col("sh_b")), 6)
                     .alias("jaccard")))


def minhash_index(df: DataFrame, key_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  num_hashes: int = 8,
                  band_rows: int = 2) -> tuple[DataFrame, DataFrame]:
    """Build the persistable corpus-side state for incremental
    near-dup ingest: (bands, shingle_sets) — bands = (key, band_idx,
    band_key) for candidate generation, shingle_sets = (key, sh) for
    the exact re-check. At 100 TB both are written once (partitioned
    by band_key / bucketed by key) and only APPENDED as batches are
    accepted; the corpus text is never re-signed."""
    assert num_hashes % band_rows == 0
    sh = _shingle_sets(df, key_col, text_col, n)
    return _minhash_bands(sh, key_col, num_hashes, band_rows), sh


def minhash_ingest_pairs(batch: DataFrame, index_bands: DataFrame,
                         index_sh: DataFrame, key_col: str = "doc_id",
                         text_col: str = "text", n: int = 3,
                         num_hashes: int = 8, band_rows: int = 2,
                         threshold_num: int = 1,
                         threshold_den: int = 2) -> DataFrame:
    """Incremental MinHash dedup: near-dup pairs between a NEW ingest
    batch and an already-indexed corpus (:func:`minhash_index`), plus
    within-batch pairs — the daily-ingest workflow at 100 TB, where
    re-running :func:`minhash_banded_pairs` over corpus+batch would
    re-sign and re-shuffle the ENTIRE corpus to dedup a 0.1% delta.
    Here the corpus contributes only index lookups: batch bands
    equi-join (band_idx, band_key) against index bands ∪ batch bands,
    so the shuffled volume is ∝ |batch| + |matching index buckets|.

    Same seeded-md5 family as the batch operator, so an index built
    by either is joinable by both. Batch keys must be disjoint from
    corpus keys (the ingest contract). Within-batch pairs orient
    key_new > key_dup (each pair once); corpus partners pair with
    every matching batch doc. Output (key_new, key_dup, inter_n,
    union_n): integer-exact, threshold inter*den >= num*union
    pre-applied — key_new is always the batch side, so ``key_new
    whose partner exists`` is the drop set and the batch survivors
    are ``batch left_anti output``."""
    assert num_hashes % band_rows == 0
    sh_new = _shingle_sets(batch, key_col, text_col, n)
    bands_new = _minhash_bands(sh_new, key_col, num_hashes, band_rows)
    partners = (index_bands.select(key_col, "band_idx", "band_key",
                                   F.lit(0).alias("__src"))
                .unionByName(bands_new.select(
                    key_col, "band_idx", "band_key",
                    F.lit(1).alias("__src"))))
    a, b = bands_new.alias("a"), partners.alias("b")
    cand = (a.join(b, on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_key") == F.col("b.band_key"),
                # corpus partner: always; batch partner: orient once
                (F.col("b.__src") == 0)
                | (F.col(f"b.{key_col}") < F.col(f"a.{key_col}"))])
            .select(F.col(f"a.{key_col}").alias("key_new"),
                    F.col(f"b.{key_col}").alias("key_dup"))
            .distinct())
    sh_all = index_sh.unionByName(sh_new)
    sa = sh_new.select(F.col(key_col).alias("key_new"),
                       F.col("sh").alias("sh_a"))
    sb = sh_all.select(F.col(key_col).alias("key_dup"),
                       F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cand.join(sa, "key_new").join(sb, "key_dup")
            .select("key_new", "key_dup",
                    inter.cast("bigint").alias("inter_n"),
                    union.cast("bigint").alias("union_n"))
            .filter(F.col("inter_n") * threshold_den
                    >= threshold_num * F.col("union_n")))


def line_dedup(df: DataFrame, key_col: str, text_col: str,
               max_df: int = 5) -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal: a line
    appearing in more than ``max_df`` distinct documents (nav bars,
    cookie banners, copyright footers) is dropped from EVERY document;
    survivors are reassembled in original line order.

    This is the dedup granularity BETWEEN exact document dedup
    (fingerprint groupBy) and chunk dedup: boilerplate contaminates
    most web documents without making any two documents equal, so
    doc-level fingerprints never see it.

    Shape: one posexplode over lines, one map-side-combinable
    distinct-count per line (the cross-doc document-frequency table —
    the same DF artifact the dup-ngram and prefix filters build, at
    line granularity), one hash join back, one per-doc reassembly
    groupBy. Linear in total lines; no pairwise anything. The
    reassembly sorts each doc's surviving (pos, line) structs inside
    the aggregate — a per-group array sort, never a global order.

    Output: (key, cleaned_text, lines_kept, lines_dropped); a document
    whose every line was boilerplate survives with empty text, so the
    op never changes corpus cardinality. Idempotent over corpora of
    non-empty lines (a surviving line's DF only shrinks — property-
    tested); fully-emptied docs re-enter a second pass as ONE empty
    line, so pipelines chaining passes should drop empty lines (or
    filter lines_kept > 0) between them."""
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    dfreq = lines.groupBy("line").agg(
        F.countDistinct(key_col).alias("line_df"))
    kept = (lines.join(dfreq, "line")
            .filter(F.col("line_df") <= max_df))
    reassembled = kept.groupBy(key_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"]), "\n").alias("cleaned_text"),
        F.count("*").alias("lines_kept"))
    totals = df.select(
        F.col(key_col),
        F.size(F.split(F.col(text_col), "\n")).cast("bigint")
         .alias("lines_total"))
    return (totals.join(reassembled, key_col, "left")
            .select(key_col,
                    F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
                    F.coalesce("lines_kept", F.lit(0)).cast("bigint")
                     .alias("lines_kept"),
                    (F.col("lines_total")
                     - F.coalesce("lines_kept", F.lit(0)))
                    .cast("bigint").alias("lines_dropped")))


def simhash64(text_col: Column | str) -> Column:
    """64-bit SimHash: xxhash64 each distinct token, per-bit majority
    vote, reassemble. Pure column expressions — ONE fold over the
    token-hash array carrying a 64-wide vote vector (zip_with add),
    then one zip_with against the bit powers to reassemble. The
    one-pass shape is ~4x faster than 64 independent per-bit folds
    (each of those re-walks the token array; measured at sf0.1).
    No explode, no shuffle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_distinct(F.split(F.trim(c), r"\s+", -1))
    hashes = F.transform(toks, lambda tk: F.xxhash64(tk))

    def bits_of(h: Column) -> Column:
        # +1/-1 vote per bit; bit 63 is the sign bit (shift-free test)
        exprs = [F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
                 for i in range(63)]
        exprs.append(F.when(h < 0, 1).otherwise(-1))
        return F.array(*exprs)

    votes = F.aggregate(hashes, F.array_repeat(F.lit(0), 64),
                        lambda acc, h: F.zip_with(acc, bits_of(h),
                                                  lambda a, b: a + b))
    # bit 63's power is Long.MIN_VALUE — same two's-complement wrap the
    # shiftleft(1, 63) of the unrolled form produced
    powers = F.array(*[F.lit(1 << i) for i in range(63)]
                     + [F.lit(-(2 ** 63))])
    sim = F.aggregate(
        F.zip_with(votes, powers,
                   lambda v, p: F.when(v > 0, p)
                                 .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    # NULL text -> NULL token array propagates NULL through the fold;
    # pin it to 0, matching the unrolled form's when/otherwise(0)
    return F.coalesce(sim, F.lit(0).cast("long"))


def simhash_near_pairs(df: DataFrame, key_col: str, text_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash banding: 4 bands × 16 bits — any pair
    within Hamming distance 3 of each other shares ≥1 exact band
    (pigeonhole), so the candidate join is an equi-join on (band_id,
    band_value), never O(n²). Returns (key_a, key_b, hamming)."""
    sh = df.select(F.col(key_col), simhash64(text_col).alias("simhash"))
    bands = sh.select(
        key_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.shiftright("simhash", 16 * b)
                      .bitwiseAND(F.lit(0xFFFF)).alias("band_val"))
            for b in range(4)])).alias("band")
    ).select(key_col, "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, on=[F.col("a.band_id") == F.col("b.band_id"),
                          F.col("a.band_val") == F.col("b.band_val"),
                          F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
            .select(F.col(f"a.{key_col}").alias("key_a"),
                    F.col(f"b.{key_col}").alias("key_b"),
                    ham.alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


def ppjoin_prefix_pairs(df: DataFrame, key_col: str, text_col: str,
                        threshold_num: int = 1, threshold_den: int = 2,
                        n: int = 3) -> DataFrame:
    """EXACT Jaccard self-join via prefix filtering (AllPairs/PPJoin,
    Bayardo WWW'07 / Xiao WWW'08) — the lossless alternative to LSH:
    every pair with shingle-Jaccard >= t is returned, yet candidate
    generation is an equi-join on rare shingles, never all-pairs.

    Prefix lemma: order each doc's shingles by GLOBAL rarity (document
    frequency asc, shingle asc — deterministic); with overlap bound
    ceil(t*|X|) per doc, any qualifying pair must share a shingle in
    both docs' first |X| - ceil(t*|X|) + 1 shingles. Joining on prefix
    shingles therefore finds every qualifying pair; an exact Jaccard
    re-check drops false candidates.

    The threshold is a RATIONAL (num/den) so the prefix arithmetic is
    integer-exact cross-engine: ceil(t*|X|) == (num*|X| + den - 1) div
    den. Cost shape: one DF groupBy (map-side combinable), one per-doc
    window for the rarity rank, one equi-join on prefix shingles whose
    fan-out tracks shingle rarity (rare shingles -> tiny posting
    lists), one exact re-check join. At 100 TB the DF table is the
    same artifact the decontamination and dup-ngram ops build.
    Output: (key_a, key_b, jaccard >= num/den).

    r13: the input fans out before shingling (single-row-group scans
    otherwise run the whole shingle pass on one core — no-op at
    scale), and the per-doc size joins no second scan+shingle pass of
    the corpus: shingles are array_distinct, so |sh| == the doc's
    flat row count, a count-over-window on the clustering the rank
    window already established (guide §2.4: same-keyed operations
    share one exchange).

    r14: the corpus scan+exchange executes ONCE for all consumers
    (was 3x — the redundant size(sh)>0 filter and the
    InferFiltersFromGenerate constraint pushed per-branch predicates
    below the fan_out exchange that both re-evaluated the full
    shingle build per row AND broke AQE stage reuse; see the inline
    notes), and the prefix relation is hash-partitioned on the
    candidate join's equi-key so the rank/window pipeline feeds both
    self-join sides from one reused exchange instead of running
    twice."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    df = fan_out(df, key_col)
    gram = shingles(text_col, n)
    # r14: no size(sh) > 0 filter, and the explode runs over the
    # INLINE shingle expression (the curation._gram_list lesson).
    # The filter was semantically redundant — explode() emits
    # nothing for an empty or NULL array, so gram-less docs never
    # reach flat/ranked/prefix/cand, and the re-check arms only
    # see keys cand produced — and both the explicit filter and
    # the one InferFiltersFromGenerate derives from an
    # attribute-explode get pushed below the fan_out exchange into
    # EVERY consumer's scan branch, where alias substitution
    # re-evaluates the full tokenize+shingle build per row per
    # branch (6 extra evaluations across the 3 consumer stages at
    # r13's shape), and the slightly-different inferred predicates
    # per branch defeat AQE stage reuse, so the union+exchange ran
    # 3x. Inline explode leaves no attribute to infer on, and the
    # explicit isnotnull(key) pre-empts the constraint the
    # candidate join's key inequality would otherwise infer into
    # ONLY its own branch (NULL keys can never reach the output:
    # NULL < x is never true, and cand keys are non-null — their
    # only observable effect was contributing to the rarity ranks,
    # and the prefix lemma is lossless under ANY consistent global
    # shingle order, so the returned pair set is unchanged; the
    # DuckDB oracle replicating the pipeline agrees at all SFs).
    # Result: all consumer subtrees stay canonically identical and
    # the scan+exchange executes ONCE
    # (plans/r14/ext_dedup_ppjoin_after.txt).
    df = df.filter(F.col(key_col).isNotNull())
    sh = df.select(F.col(key_col), gram.alias("sh"))
    flat = df.select(F.col(key_col), F.explode(gram).alias("g"))
    dfreq = flat.groupBy("g").agg(F.count("*").alias("__df"))
    w = Window.partitionBy(key_col).orderBy("__df", "g")
    wn = Window.partitionBy(key_col)
    ranked = (flat.join(dfreq, "g")
              .withColumn("__rk", F.row_number().over(w))
              .withColumn("__n", F.count("*").over(wn)))
    # prefix length = n - ceil(t*n) + 1, all-integer
    plen = (F.col("__n")
            - F.floor((threshold_num * F.col("__n") + threshold_den - 1)
                      / threshold_den) + 1)
    # r14: hash-partition the prefix relation on the candidate
    # join's equi-key so BOTH self-join sides are one canonical
    # exchange subtree (the simhash_portable/pmi ReuseExchange
    # pattern) — the whole dfreq-join + double-window rank
    # pipeline above it previously ran twice, once per join side
    # (the r13 plan shows the b side duplicated under a
    # BroadcastExchange).
    prefix = (ranked.filter(F.col("__rk") <= plen)
              .select(key_col, "g", "__rk", "__n")
              .repartition(F.col("g")))
    a, b = prefix.alias("a"), prefix.alias("b")
    # AllPairs length filter rides the candidate join: J(X,Y) >= n/d
    # forces d*|X| >= n*|Y| and d*|Y| >= n*|X| (both exact integers),
    # so size-incompatible prefix collisions never reach the array
    # re-check join — on Zipf-shingled corpora this drops most of the
    # candidate mass generated by one shared mid-frequency shingle
    matched = (a.join(b, on=[F.col("a.g") == F.col("b.g"),
                             F.col(f"a.{key_col}") < F.col(f"b.{key_col}"),
                             threshold_den * F.col("a.__n")
                             >= threshold_num * F.col("b.__n"),
                             threshold_den * F.col("b.__n")
                             >= threshold_num * F.col("a.__n")])
               .select(F.col(f"a.{key_col}").alias("key_a"),
                       F.col(f"b.{key_col}").alias("key_b"),
                       F.col("a.__rk").alias("rk_a"),
                       F.col("b.__rk").alias("rk_b"),
                       F.col("a.__n").alias("n_a"),
                       F.col("b.__n").alias("n_b")))
    # positional filter (Xiao et al. PPJoin): the FIRST shared prefix
    # shingle sits at the same point of the global order on both
    # sides, so every OTHER shared shingle ranks after it in BOTH
    # docs — overlap <= 1 + min(|X|-i, |Y|-j). The pair-level dedup
    # (one row per pair, replacing .distinct()) and the bound test
    # share one groupBy; J >= n/d needs overlap*(n+d) >= n*(|X|+|Y|),
    # all integers, so the pruning is exact and lossless
    cand = (matched.groupBy("key_a", "key_b", "n_a", "n_b")
            .agg(F.min("rk_a").alias("__ia"), F.min("rk_b").alias("__jb"))
            .filter((1 + F.least(F.col("n_a") - F.col("__ia"),
                                 F.col("n_b") - F.col("__jb")))
                    * (threshold_num + threshold_den)
                    >= threshold_num * (F.col("n_a") + F.col("n_b")))
            .select("key_a", "key_b"))
    sa = sh.select(F.col(key_col).alias("key_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(key_col).alias("key_b"), F.col("sh").alias("sh_b"))
    # integer-exact threshold test: inter/union >= num/den iff
    # inter*den >= num*union — never compares rounded floats, so the
    # lossless guarantee holds for thresholds like 1/3 that have no
    # exact 6-dp representation; round() touches only the OUTPUT column
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cand.join(sa, "key_a").join(sb, "key_b")
            .filter(inter * threshold_den >= threshold_num * union)
            .select("key_a", "key_b",
                    F.round(jaccard_similarity(F.col("sh_a"),
                                               F.col("sh_b")), 6)
                     .alias("jaccard")))


def winnow_fingerprints(df: DataFrame, key_col: str, text_col: str,
                        k: int = 5, window: int = 4,
                        prefix_len: int | None = 64) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every k-gram of the text, slide a ``window``-wide window over
    the hash sequence, keep each window's minimum — the classic
    plagiarism/near-dup fingerprint that guarantees any match of
    length >= window+k-1 shares a fingerprint.

    The guarantee holds over the fingerprinted SPAN: by default only
    the first ``prefix_len`` characters are hashed (a cost bound — the
    explode is ~prefix_len rows/doc), so a passage shared only beyond
    that prefix is NOT detected. Pass ``prefix_len=None`` to
    fingerprint the full text and recover the unconditional SIGMOD'03
    guarantee at ~len(text) exploded rows per document.

    Returns the DISTINCT (key, fp) fingerprint set per document.

    Scale shape: positions explode to ~prefix_len rows per document,
    but the window-min partitions by document key, so the single
    shuffle is by ``key_col`` (or none, if upstream already
    partitioned by it); the k-gram hash itself is an md5 column
    expression, fully codegen'd. The hash is the first 8 hex chars of
    md5 — engine-portable (unlike xxhash64), which keeps the operator
    oracle-checkable.
    """
    s = (F.col(text_col) if prefix_len is None
         else F.substring(F.col(text_col), 1, prefix_len))
    grams = df.select(
        F.col(key_col),
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.length(s) - F.lit(k - 1), F.lit(1)))
        ).alias("pos"),
        s.alias("__s"))
    grams = grams.select(
        key_col, "pos",
        F.substring(F.md5(F.substring(F.col("__s"), F.col("pos"),
                                      F.lit(k))), 1, 8).alias("gram_hash"))
    w = (Window.partitionBy(key_col).orderBy("pos")
         .rowsBetween(-(window - 1), 0))
    return (grams
            .select(key_col, F.min("gram_hash").over(w).alias("fp"))
            .distinct())


def simhash_portable_pairs(df: DataFrame, key_col: str, text_col: str,
                           max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by a PORTABLE 32-bit SimHash — the
    oracle-checkable twin of :func:`simhash_near_pairs`, which hashes
    with xxhash64 (engine-specific, so its driver verdict is
    rows-only). Here each distinct word 3-gram SHINGLE hashes through
    the bounded-md5 idiom (md5 hex prefix → int, identical in Spark
    and ANSI SQL), the per-bit ±1 majority vote and fingerprint
    assembly are the same fold shape as simhash64, and banding is 4
    bands × 8 bits (pigeonhole: Hamming ≤ 3 ⇒ ≥ 1 exact shared
    band). Every step is expressible in DuckDB SQL, so the FULL
    pipeline — shingle, hash, vote, band, join, Hamming filter —
    hash-verifies cross-engine, semantically anchoring the 64-bit
    production twin.

    Shingles, not single tokens: on a templated corpus single-token
    SimHash degenerates (shared vocabulary pulls most fingerprints
    within a few bits of each other — measured 1.57M pairs over 5000
    docs at Hamming ≤ 3), while 3-gram shingles carry word ORDER, the
    thing a near-dup actually preserves. Production notes: 32 bits /
    8-bit bands suit an oracle-sized corpus; at 100 TB use the 64-bit
    form (16-bit bands) — band width scales with log N to hold bucket
    sizes constant. Docs with fewer than 3 tokens are dropped (they
    have no shingles, matching the SQL side where they never leave
    the shingle CTE).
    """
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        shingles,
    )

    bits, n_bands = 32, 4
    width = bits // n_bands

    def bits_of(h: Column) -> Column:
        return F.array(*[
            F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
            for i in range(bits)])

    def fp_of(toks: Column) -> Column:
        hashes = F.transform(
            toks,
            lambda tk: F.conv(F.substring(F.md5(tk), 1, 8), 16, 10)
            .cast("long"))
        votes = F.aggregate(hashes, F.array_repeat(F.lit(0), bits),
                            lambda acc, h: F.zip_with(
                                acc, bits_of(h), lambda a, b: a + b))
        powers = F.array(*[F.lit(1 << i).cast("long")
                           for i in range(bits)])
        return F.aggregate(
            F.zip_with(votes, powers,
                       lambda v, p: F.when(v > 0, p)
                       .otherwise(F.lit(0).cast("long"))),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )

    # r13: fan the one-task scan out before the md5-per-shingle
    # fingerprint fold (guide §2.5; no-op at scale), and hash-
    # partition the banded relation on the band join key: both
    # self-join sides then share ONE canonically identical exchange
    # subtree (AQE ReusedExchange — the ext_cooccurrence_pmi
    # pattern), so every fingerprint is computed once and the join
    # needs no further shuffle. A lazy localCheckpoint would also
    # deduplicate the compute but was rejected: checkpoint calls
    # queryExecution.toRdd at BUILD time, silently moving the plan
    # compile out of bench.py's timed materialize (headline entries'
    # contract is that build() is free).
    df = fan_out(df, key_col)
    sh = (df.select(F.col(key_col),
                    shingles(text_col, 3).alias("__sh"))
          .filter(F.size("__sh") > 0)
          .select(key_col, fp_of(F.col("__sh")).alias("simhash")))
    bandmask = (1 << width) - 1
    bands = sh.select(
        key_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.shiftright("simhash", width * b)
                     .bitwiseAND(F.lit(bandmask)).alias("band_val"))
            for b in range(n_bands)])).alias("band")
    ).select(key_col, "simhash", "band.band_id", "band.band_val")
    bands = bands.repartition("band_id", "band_val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) \
        .cast("long")
    return (a.join(b, on=[F.col("a.band_id") == F.col("b.band_id"),
                          F.col("a.band_val") == F.col("b.band_val"),
                          F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
            .select(F.col(f"a.{key_col}").alias("key_a"),
                    F.col(f"b.{key_col}").alias("key_b"),
                    ham.alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))
