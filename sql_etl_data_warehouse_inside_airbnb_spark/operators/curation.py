"""Corpus-curation operators: published pre-training quality rules
(Gopher, C4), corpus-LM familiarity scoring, and a Bloom-filter
decontamination prefilter.

These extend the reference's cleaning surface (SURVEY §2.8 sanitizers,
scripts/app/pretreatment.py's keep-list filtering) to the rule sets
the public LLM-data literature standardized: Rae et al. 2021 (Gopher,
appendix A1.1) and Raffel et al. 2020 (C4, §2.2). Every rule is a
column expression; every ratio threshold is rewritten as an
integer-scaled comparison (mean word length in [3,10] ⟺
3n ≤ chars ≤ 10n) so keep/drop verdicts are bit-identical across
engines and partitionings — the same no-division discipline the
relational registry uses for money aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    rolling_hash,
    shingles,  # noqa: F401  (re-exported curation surface)
)

# the Gopher stopword probe set (the paper uses a small fixed list and
# requires >= 2 hits; 'the'/'a'/... cover the synthetic corpus too)
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _tokens(text_col: Column) -> Column:
    t = F.trim(text_col)
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+", -1))


def gopher_signals(df: DataFrame, key_col: str, text_col: str,
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_len: int = 3, max_mean_len: int = 10,
                   min_stopwords: int = 2) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, A1.1) as one
    projection: word count bounds, mean word length bounds, stopword
    presence. Emits the integer signals plus the keep verdict; the
    mean-length test is the exact integer rescaling
    min*n <= sum_chars <= max*n (never a quotient).

    Stateless map over the corpus — no shuffle, no UDF; at 100 TB this
    is a free rider on whatever scan the pipeline already does."""
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks).cast("bigint")
    sum_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.length(w).cast("bigint"))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(
        stop_arr, F.lower(w)))).cast("bigint")
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (sum_chars >= min_mean_len * n_words)
            & (sum_chars <= max_mean_len * n_words)
            & (n_stop >= min_stopwords))
    return df.select(
        F.col(key_col),
        n_words.alias("n_words"),
        sum_chars.alias("sum_word_chars"),
        n_stop.alias("n_stopwords"),
        keep.alias("keep"))


def c4_sentence_filter(df: DataFrame, key_col: str, text_col: str,
                       min_sentences: int = 3) -> DataFrame:
    """C4 page-level filters (Raffel et al. 2020, §2.2) over a text
    whose sentences end in terminal punctuation: keep only sentences
    that end with . ! or ?, drop the whole document when it has a
    curly brace (code), contains 'lorem ipsum', or retains fewer than
    ``min_sentences`` sentences.

    Sentences are split on the terminal marks with lookbehind kept by
    splitting on the boundary-space after [.!?]; a trailing fragment
    with no terminal mark is counted and discarded exactly like C4's
    line rule. One projection, no shuffle."""
    t = F.trim(F.col(text_col))
    # split AFTER terminal punctuation: mark boundaries, then split
    marked = F.regexp_replace(t, r"([.!?])\s+", "$1\x00")
    sents = F.when(t == "", F.array().cast("array<string>")) \
             .otherwise(F.split(marked, "\x00", -1))
    kept = F.filter(sents, lambda s: s.rlike(r"[.!?]$"))
    n_sentences = F.size(sents).cast("bigint")
    n_kept = F.size(kept).cast("bigint")
    has_curly = t.contains("{") | t.contains("}")
    has_lorem = F.lower(t).contains("lorem ipsum")
    keep = (~has_curly) & (~has_lorem) & (n_kept >= min_sentences)
    return df.select(
        F.col(key_col),
        n_sentences.alias("n_sentences"),
        n_kept.alias("n_kept_sentences"),
        has_curly.alias("has_curly"),
        has_lorem.alias("has_lorem"),
        keep.alias("keep"))


def char_trigrams(text_col: Column | str) -> Column:
    """All character trigrams (with repeats) of the lowercased,
    whitespace-collapsed text, as an array column.

    Perf: the normalized string is BOUND ONCE per row by routing it
    through a single-element ``transform`` whose lambda variable holds
    it — referencing the regexp_replace expression directly inside the
    per-position lambda re-normalizes the text once per trigram
    position (no subexpression elimination in lambda bodies), which is
    O(len²) per document: measured 28 s -> 1.9 s for the corpus-LM
    scoring pass at sf0.1. The same trap and fix as
    functions/text.py:shingles."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm0 = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))

    def grams(norm: Column) -> Column:
        n = F.length(norm)
        return F.when(n < 3, F.array().cast("array<string>")) \
                .otherwise(F.transform(F.sequence(F.lit(1), n - 2),
                                       lambda i: F.substring(norm, i, 3)
                                       .cast("string")))

    return F.element_at(F.transform(F.array(norm0), grams), 1)


def trigram_familiarity(df: DataFrame, key_col: str, text_col: str,
                        cache: bool = True) -> DataFrame:
    """Corpus-LM familiarity: train character-trigram counts on the
    corpus itself, then score each document by how familiar its
    trigrams are — the integer-exact core of CCNet's LM-perplexity
    quality signal. Emits per-doc total trigram occurrences, the SUM
    of global occurrence counts over the doc's trigrams, and the
    rarest-trigram count; the float score -avg log p derives from
    these client-side (log/division are exactly the ops the
    cross-engine hash can't absorb, so they stay OUT of the compared
    columns).

    Shape: ONE explode → per-(doc, trigram) count groupBy, persisted;
    the model (at 100 TB: a few GB of trigram counts — broadcast) and
    the per-doc scores both derive from that relation, so the corpus
    text is exploded exactly once. The persisted relation is the
    doc-level count table (distinct trigrams per doc), far smaller
    than the raw exploded stream — it compresses every repeat — and
    spills to disk if it doesn't fit. Linear, no pairwise step.
    (Round-3 shape exploded the corpus on both sides of the
    self-referential join; VERDICT.md r3 item 5.)

    The persisted relation is function-local and never unpersisted —
    the session's block manager LRU-evicts it, and Spark's
    ContextCleaner releases it once the returned plan is garbage
    collected. A long-lived session scoring MANY distinct corpora
    that needs deterministic release can pass ``cache=False`` to
    trade the second explode for zero pinned storage."""
    from pyspark import StorageLevel

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )

    # r13: single-row-group scans otherwise run the whole trigram
    # explode on one core (guide §2.5 input skew; no-op at scale)
    df = fan_out(df, key_col)
    tri_counts = (df.select(F.col(key_col),
                            F.explode(char_trigrams(text_col)).alias("tg"))
                  .groupBy(key_col, "tg")
                  .agg(F.count("*").alias("cnt")))
    if cache:
        tri_counts = tri_counts.persist(StorageLevel.MEMORY_AND_DISK)
    model = tri_counts.groupBy("tg").agg(F.sum("cnt").alias("tg_count"))
    return (tri_counts.join(F.broadcast(model), "tg")
            .groupBy(key_col)
            .agg(F.sum("cnt").alias("n_trigrams"),
                 F.sum(F.col("cnt") * F.col("tg_count"))
                  .alias("familiarity_sum"),
                 F.min("tg_count").alias("rarest_count")))


def bloom_decontaminate(df: DataFrame, bench_df: DataFrame,
                        key_col: str, text_col: str,
                        bench_text_col: str | None = None,
                        n: int = 5, m_bits: int = 1 << 20,
                        n_hashes: int = 3) -> DataFrame:
    """Bloom-filter decontamination PREFILTER: flag every document
    sharing an n-gram shingle with the benchmark set, testing
    membership against an m-bit Bloom bitmap instead of joining the
    shingle table — no false NEGATIVES (every truly contaminated doc
    is flagged; guaranteed by Bloom semantics, asserted against the
    exact join in tests), tunable false-positive rate.

    This is the 100 TB shape of ext_decontaminate: the exact semi
    join must ship/broadcast the full benchmark shingle SET, while
    the bitmap is m/8 bytes (128 KiB at the default m=2^20, a few MB
    for real eval suites) — small enough to ride the closure to every
    executor and keep the corpus pass a pure stateless map. Survivors
    of the prefilter (a tiny fraction) re-check against the exact
    join; the composition never loses a contaminated doc.

    SIZE m FOR THE BENCHMARK SET or the filter saturates into
    flag-everything: with E distinct benchmark shingles the fill
    ratio is ~k*E/m and the per-DOC false-positive rate is
    1-(1-(kE/m)^k)^s over s shingles — k=3, E=14k, m=2^16 measured
    96% of the corpus flagged, m=2^20 under 1%. Rule of thumb:
    m >= 20*k*E bits keeps the per-shingle FPR below ~1e-3.

    Mechanics, all column expressions: k=``n_hashes`` positions per
    shingle via seeded xxhash64 pmod m; the bitmap is built as a
    (word_index -> 64-bit mask) map aggregated with bit_or, collected
    once (it is ≤ m/64 rows BY CONSTRUCTION — the one acceptable
    driver-side collect shape), and broadcast as a literal-sized
    1-row cross join. Membership tests AND each hash's bit against
    the map word. Engine-specific hashing (xxhash64) -> rows-only
    for the driver; the no-false-negative property is the testable
    contract."""
    btc = bench_text_col or text_col

    def positions(g: Column, i: int) -> Column:
        return F.pmod(F.xxhash64(g, F.lit(i)), F.lit(m_bits))

    # shiftleft() takes only literal shift amounts — bit masks for a
    # COLUMN position come from a 64-entry powers-of-two lookup (bit
    # 63 wraps to Long.MIN_VALUE, same two's-complement as 1L<<63)
    pow2 = F.array(*[F.lit((1 << i) if i < 63 else -(1 << 63))
                     .cast("bigint") for i in range(64)])

    def bit_mask(p: Column) -> Column:
        return F.element_at(pow2, (p % 64).cast("int") + 1)

    bench_sh = (bench_df.select(F.explode(shingles(btc, n)).alias("g"))
                .distinct())
    pos = bench_sh.select(F.explode(F.array(
        *[positions(F.col("g"), i) for i in range(n_hashes)]))
        .alias("p"))
    bitmap_rows = (pos.withColumn("w", (F.col("p") / 64).cast("bigint"))
                   .withColumn("b", bit_mask(F.col("p")))
                   .groupBy("w").agg(F.bit_or("b").alias("mask")))
    bitmap = bitmap_rows.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("mask"))
        .alias("__bloom"))

    def maybe_member(g: Column) -> Column:
        tests = []
        for i in range(n_hashes):
            p = positions(g, i)
            w = (p / 64).cast("bigint")
            b = bit_mask(p)
            tests.append(
                F.coalesce(F.element_at(F.col("__bloom"), w), F.lit(0))
                .bitwiseAND(b) != 0)
        out = tests[0]
        for t in tests[1:]:
            out = out & t
        return out

    docs_sh = df.select(F.col(key_col), shingles(text_col, n).alias("sh"))
    return (docs_sh.join(F.broadcast(bitmap))
            .select(F.col(key_col),
                    F.exists("sh", maybe_member).alias("maybe_contaminated"))
            .filter(F.col("maybe_contaminated"))
            .select(F.col(key_col).alias("flagged_doc_id")))


# fasttext-style hashed-linear scorer constants: feature space and a
# deterministic weight formula standing in for trained weights (at
# deployment the weights arrive as a broadcast map keyed by bucket;
# the FORMULA keeps the op oracle-checkable without shipping a model)
HASH_BUCKETS = 4096
WEIGHT_MULT = 2_654_435_761  # Knuth multiplicative-hash constant
WEIGHT_MOD = 1001            # weights span [-500, 500]


def hashed_linear_score(df: DataFrame, key_col: str,
                        text_col: str) -> DataFrame:
    """Hashed bag-of-words linear classifier scoring — the fasttext
    shape every large-corpus quality filter uses (CCNet §3.3, C4's
    badwords pass): token → hash bucket → weight, document score =
    Σ weights, keep/drop at a threshold.

    Tokens hash by the same base-31 Rabin-Karp fold the fingerprint
    ladder uses (functions/text.py:rolling_hash), mod ``HASH_BUCKETS``;
    the bucket's weight is ``((bucket * WEIGHT_MULT) % WEIGHT_MOD) -
    (WEIGHT_MOD div 2)`` — all int64-exact, so scores compare
    bit-identically across engines. Everything is one nested
    transform/aggregate column expression inside whole-stage codegen:
    no UDF, no shuffle beyond the caller's, and at 100 TB the scorer
    is a stateless map over the corpus (real weights ride the closure
    or a broadcast join on bucket id, same plan either way).

    Returns (key, n_tokens, score, verdict) with verdict
    'keep' when score >= 0 else 'drop'.
    """
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    toks = tokens(text_col)   # explicit whitespace class: Java \s and
    # RE2 \s disagree on \x0B, so oracle-paired tokenizers share
    # search.py's [ \t\n\x0B\f\r]+ on BOTH sides

    def weight(tok: Column) -> Column:
        # same base-31 mod-1e9+7 fold as the fingerprint ladder —
        # reused from functions/text.py so the hash family has ONE
        # definition (prefix_len=None: tokens hash in full)
        bucket = rolling_hash(tok, prefix_len=None) % HASH_BUCKETS
        return (bucket * WEIGHT_MULT) % WEIGHT_MOD - (WEIGHT_MOD // 2)

    score = F.aggregate(toks, F.lit(0).cast("bigint"),
                        lambda acc, tok: acc + weight(tok))
    return df.select(
        F.col(key_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("score"),
        F.when(score >= 0, "keep").otherwise("drop").alias("verdict"))


def mixture_sample(df: DataFrame, rates: DataFrame, group_col: str,
                   key_col: str, rate_col: str = "rate_bp",
                   on_missing: str = "error") -> DataFrame:
    """Deterministic source-mixture sampling: keep each row of group g
    with probability ``rates[g]`` (in basis points, 0..10000), decided
    by a multiplicative hash of the row key — the data-mixing step of
    a training pipeline (choose corpus proportions, e.g. 3x down-weight
    web crawl vs books).

    Hash-gated, not rand(): the same row always gets the same verdict
    regardless of partitioning, retries, or cluster size (the
    cap_reviews xxhash lesson, plans/pipeline.py:220), and the oracle
    can replay it. ``rates`` is a tiny dim — broadcast join, so the
    pass over the corpus stays shuffle-free at any scale.

    The key folds through ``pmod(key, 100003)`` (prime) BEFORE the
    Knuth multiply: the raw product overflows int64 for keys past
    ~3.5e9 — Spark would wrap silently while DuckDB errors, and a
    100 TB corpus has keys that large. pmod, not ``%``: Spark's ``%``
    keeps the dividend's sign, so a negative key would drive the gate
    negative and pass EVERY rate including 0. The fold keeps the
    product under 2^48 and the gate in [0, 10000) for any bigint key.

    A group present in ``df`` but absent from ``rates`` has no
    declared proportion — that is a configuration error, and an inner
    join would silently drop the whole source from the mix. The
    default ``on_missing='error'`` eagerly checks the distinct group
    set against ``rates`` and raises, naming the orphans — note this
    costs one extra one-column distinct pass over ``df`` per call
    (map-side-combinable, but a full scan at corpus scale: callers
    that validated rates upstream should pass ``'drop'``);
    ``on_missing='drop'`` opts into the silent-drop semantics,
    ``on_missing='keep'`` passes unrated groups through unsampled.

    Returns the kept rows of ``df`` (all original columns).
    """
    if on_missing not in ("error", "drop", "keep"):
        raise ValueError(f"on_missing must be error|drop|keep, "
                         f"got {on_missing!r}")
    if on_missing == "error":
        orphans = [r[0] for r in
                   (df.select(group_col).distinct()
                    .join(F.broadcast(rates.select(group_col)),
                          group_col, "left_anti")
                    .collect())]
        if orphans:
            raise ValueError(
                f"mixture_sample: no rate declared for group(s) "
                f"{sorted(map(str, orphans))[:10]} — add them to "
                f"rates or pass on_missing='drop'/'keep'")
    gate = (F.pmod(F.col(key_col).cast("bigint"), F.lit(100_003))
            * WEIGHT_MULT) % 10_000
    keep_pred = gate < F.col(rate_col)
    if on_missing == "keep":
        # ONLY the left join's unmatched rows ride the NULL escape; a
        # NULL rate VALUE in the dim under error/drop mode must keep
        # its old keep-nothing semantics, not silently become 100%
        keep_pred = F.col(rate_col).isNull() | keep_pred
    how = "left" if on_missing == "keep" else "inner"
    return (df.join(F.broadcast(rates), group_col, how)
            .filter(keep_pred)
            .drop(rate_col))


def tfidf_top_terms(df: DataFrame, key_col: str, text_col: str,
                    k: int = 3, cache: bool = True) -> DataFrame:
    """Top-k characteristic terms per document, ranked by
    (tf DESC, df ASC, term ASC) — term frequency first, document
    frequency as the rarity tiebreak. This is TF-IDF's SELECTION
    semantics with the float score (tf·log(N/df)) kept out of the
    output: the integer (tf, df) pair orders candidates the same way
    for fixed tf, every emitted column is int64/string-exact, and the
    float score derives client-side where cross-engine log/division
    rounding can't corrupt a comparison.

    Shape: one explode → (doc, term) tf groupBy, PERSISTED — the df
    side and the join side both read the tf relation, and without the
    persist Spark's physical plan would explode the corpus twice (the
    trigram_familiarity lesson, measured 4.2 s → 1.1 s there); df
    joins back on term; one per-doc window keeps k rows. At 100 TB
    the tf relation partitions by (doc, term) hash, df is
    vocabulary-sized (words, not shingles — it broadcasts), and the
    top-k window partitions by doc — no global sort anywhere.

    The persist follows the corpus-scoring lifetime contract shared
    with ``trigram_familiarity`` and ``dsir_components``: the relation
    is function-local, LRU-evicted by the block manager, and released
    by the ContextCleaner with the plan; a long-lived session scoring
    MANY distinct corpora can pass ``cache=False`` to trade the second
    explode for zero pinned storage.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )

    # r13: fan the one-task scan out before the tokenize explode
    # (guide §2.5; no-op at scale)
    df = fan_out(df, key_col)
    toks = tokens(text_col)   # the one portable whitespace class
    tf = (df.select(F.col(key_col), F.explode(toks).alias("term"))
          .groupBy(key_col, "term")
          .agg(F.count("*").alias("tf")))
    if cache:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (Window.partitionBy(key_col)
         .orderBy(F.col("tf").desc(), F.col("df").asc(),
                  F.col("term").asc()))
    return (tf.join(F.broadcast(dfreq), "term")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(key_col), "term", "tf", "df",
                    F.col("rank").cast("bigint").alias("rank")))


def dsir_components(df: DataFrame, key_col: str, text_col: str,
                    target: Column, n_buckets: int = HASH_BUCKETS,
                    cache: bool = True) -> DataFrame:
    """DSIR importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by how much more likely its hashed bag of
    tokens is under the TARGET distribution than under the rest of
    the corpus — the principled replacement for a hand-tuned quality
    threshold when "quality" means "looks like this target set".

    Mechanics, all relational: tokens hash into ``n_buckets`` by the
    repo's one rolling-hash family; per-(doc, bucket) counts are
    computed once and persisted (the trigram_familiarity shape); the
    target/source bucket-count model derives from that relation with
    one more groupBy and broadcasts back onto it (≤ n_buckets rows —
    at any corpus size the model is bounded by the hash space, which
    is what makes DSIR tractable at web scale); per-doc aggregates
    close the score. Linear, no pairwise step, explode runs once.

    Returns (key, is_target, n_tokens, sum_ct, sum_cs, log_weight):
    the integer components are exact (mergeable — the a34 component
    convention, and what the oracle compares; log/division stay out
    of compared columns), and ``log_weight`` = Σ_tokens
    log((ct[h]+1)/(cs[h]+1)) is the client-facing importance
    log-weight — equal to the paper's log p_target/p_source up to
    the corpus-constant normalizer log((Cs+B)/(Ct+B)) per token,
    which shifts every document equally and cancels in resampling.
    Docs with no tokens have no bag to weigh and drop out (same on
    both engines).
    """
    from pyspark import StorageLevel

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )

    # r13: fan the one-task scan out before tokenize+hash (guide
    # §2.5; no-op at scale)
    df = fan_out(df, key_col)
    h = rolling_hash(F.col("__term"), prefix_len=None) % n_buckets
    per = (df.select(F.col(key_col), target.alias("is_target"),
                     F.explode(tokens(text_col)).alias("__term"))
           .select(key_col, "is_target", h.alias("h"))
           .groupBy(key_col, "is_target", "h")
           .agg(F.count("*").alias("cnt")))
    if cache:
        per = per.persist(StorageLevel.MEMORY_AND_DISK)
    model = per.groupBy("h").agg(
        F.coalesce(F.sum(F.when(F.col("is_target"), F.col("cnt"))),
                   F.lit(0)).cast("bigint").alias("ct"),
        F.coalesce(F.sum(F.when(~F.col("is_target"), F.col("cnt"))),
                   F.lit(0)).cast("bigint").alias("cs"))
    ratio = F.log(F.col("ct") + F.lit(1.0)) - F.log(F.col("cs") + F.lit(1.0))
    return (per.join(F.broadcast(model), "h")
            .groupBy(key_col, "is_target")
            .agg(F.sum("cnt").cast("bigint").alias("n_tokens"),
                 F.sum(F.col("cnt") * F.col("ct")).cast("bigint")
                 .alias("sum_ct"),
                 F.sum(F.col("cnt") * F.col("cs")).cast("bigint")
                 .alias("sum_cs"),
                 F.round(F.sum(F.col("cnt") * ratio), 6)
                 .alias("log_weight")))


def train_quality_classifier(df: DataFrame, text_col: str,
                             label_col: str, n_features: int = 1024,
                             seed: int = 42):
    """Train the fasttext-shape quality classifier whose SCORING half
    is :func:`hashed_linear_score` — hashed bag-of-words features into
    a logistic regression (CCNet trains exactly this against a
    reference corpus; the fixed-weight scorer above is the
    weights-already-given case). Returns the fitted pyspark.ml
    PipelineModel.

    Distributed shape: tokenization and feature hashing are stateless
    maps; LBFGS iterations are one treeAggregate (gradient) per step
    over the cached feature relation — the same rounds-of-aggregate
    posture as PageRank/BPE, so this is a MAINTENANCE job (train
    offline, broadcast the weights to the scorer on the serving
    path), never a per-query fit. At 100 TB the standard practice is
    exactly fasttext's: fit on a sampled labeled slice, score the
    full corpus with the frozen model."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    base = df.withColumn("__toks", tokens(text_col))
    tf = HashingTF(inputCol="__toks", outputCol="__features",
                   numFeatures=n_features)
    lr = LogisticRegression(featuresCol="__features",
                            labelCol=label_col, maxIter=30,
                            regParam=0.01)
    model = Pipeline(stages=[tf, lr]).fit(base)
    # Drop the training summary from the fitted LR stage (r14): the
    # summary pins the TRAINING DataFrame and the SparkSession, and
    # `LogisticRegressionModel.trainingSummary` is a Scala TRAIT field
    # whose @transient does not reach the implementing class, so
    # scoring-side task closures that capture the model can try to
    # java-serialize session internals — observed as
    # `NotSerializableException: ObservationManager` whenever the
    # session's expression-canonicalization state makes the serializer
    # walk that path (order-dependent: scoring after an erase_keys
    # call failed, scoring in a fresh session passed). Nothing here
    # reads the summary; the eval split computes its own metrics. The
    # scala Option.empty goes through py4j because private[ml]
    # setSummary is public in bytecode.
    lr_model = model.stages[-1]
    if getattr(lr_model, "hasSummary", False):
        jvm = df.sparkSession._jvm
        lr_model._java_obj.setSummary(jvm.scala.Option.empty())
    return model


def score_quality_classifier(model, df: DataFrame, key_col: str,
                             text_col: str) -> DataFrame:
    """Score a corpus with a trained quality classifier: returns
    (key, prediction) — a stateless map (hash + dot product) once the
    model broadcast ships, the serving half of the train/score
    split."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    base = df.withColumn("__toks", tokens(text_col))
    return (model.transform(base)
            .select(F.col(key_col),
                    F.col("prediction").cast("bigint")
                    .alias("prediction")))


def _gram_list(n: int):
    """The DISTINCT word n-gram array over a bound ``__toks`` column —
    the shared expression under :func:`doc_ngrams` and
    :func:`doc_gram_counts`. Deliberately an EXPRESSION, not a
    projected column: materializing it as its own Project and
    exploding the resulting attribute lets InferFiltersFromGenerate
    push an inferred ``size(grams) > 0 AND isnotnull(grams)`` filter
    below the Project, where alias substitution re-evaluates the whole
    tokenize+gram build per row a second time (measured 6x slower in
    r13); explode-over-the-inline-expression leaves no attribute to
    infer on."""
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("__toks") - n),
        lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))))


def _bound_toks(df: DataFrame, key_col: str, text_col: str,
                n: int) -> DataFrame:
    """(key, __toks) for docs with at least ``n`` tokens. Token array
    bound once (the shingles lesson); engine-portable whitespace class
    via search.tokens."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )
    return (df.select(F.col(key_col), tokens(text_col).alias("__toks"))
            .filter(F.size("__toks") >= n))


def doc_ngrams(df: DataFrame, key_col: str, text_col: str,
               n: int = 3) -> DataFrame:
    """(key, gram): each document's DISTINCT word n-grams, one row per
    gram — the shared input relation of the novelty scorer and its
    incremental ingest twin."""
    return (_bound_toks(df, key_col, text_col, n)
            .select(key_col, F.explode(_gram_list(n)).alias("gram")))


def doc_gram_counts(df: DataFrame, key_col: str, text_col: str,
                    n: int = 3) -> DataFrame:
    """(key, n_grams): per-document DISTINCT n-gram count, computed
    map-side as the SIZE of the gram array — zero shuffles, where
    ``doc_ngrams(...).groupBy(key).count()`` would explode every gram
    only to count it back through an exchange (r13: the novelty
    scorers' n_grams column is exactly this count)."""
    return (_bound_toks(df, key_col, text_col, n)
            .select(key_col, F.size(_gram_list(n)).cast("bigint")
                    .alias("n_grams")))


def novelty_index(df: DataFrame, key_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """The persistable first-seen relation (gram, first_key) —
    corpus-side state for incremental novelty scoring, the exact
    analogue of dedup.minhash_index: built once over the corpus,
    APPENDED (never rebuilt) as ingest batches are accepted. At
    100 TB it is written bucketed by gram so batch probes co-locate."""
    return (doc_ngrams(df, key_col, text_col, n)
            .groupBy("gram").agg(F.min(key_col).alias("first_key")))


def novelty_ingest(batch: DataFrame, index: DataFrame,
                   key_col: str = "doc_id", text_col: str = "text",
                   n: int = 3, check_order: bool = True
                   ) -> tuple[DataFrame, DataFrame]:
    """Incremental novelty scoring: per NEW-batch document, how many
    of its distinct n-grams the indexed corpus has never seen —
    without re-scanning the corpus (re-running the full scorer over
    corpus+batch re-shuffles the ENTIRE gram relation to score a tiny
    delta; here the corpus contributes only index probes on the
    batch's grams, the minhash_ingest_pairs argument).

    Batch keys must sort AFTER every indexed key (the ingest
    contract: ingest order is the novelty order). Within the batch,
    a gram shared by two batch docs is novel only for the smallest
    key — replaying a corpus through any batch split therefore
    reproduces the full scorer exactly (asserted in tests).

    The contract is ENFORCED, not just documented (r6 advisor item):
    two scalar aggregates — max(first_key) over the index vs min(key)
    over the batch — run before scoring, and an out-of-order ingest
    raises instead of silently mis-attributing novelty and breaking
    the replay-equals-full-scorer property. Cost is one min and one
    max (at 100 TB the index max is a partition-stats read, and a
    caller that genuinely can't afford it passes
    ``check_order=False`` with the contract on its own head).

    Returns (scores, index_delta): scores = (key, n_grams, n_novel);
    index_delta = the (gram, first_key) rows this batch adds —
    append them to the index before the next batch."""
    if check_order:
        idx_max = index.agg(F.max("first_key")).first()[0]
        batch_min = batch.agg(F.min(key_col)).first()[0]
        if (idx_max is not None and batch_min is not None
                and not batch_min > idx_max):
            raise ValueError(
                f"novelty_ingest: out-of-order ingest — batch min "
                f"{key_col}={batch_min!r} does not sort after the "
                f"index's max first_key={idx_max!r}. Novelty "
                "attribution is only correct when batches arrive in "
                "key order (replay == full scorer); re-batch, or pass "
                "check_order=False to accept the misattribution.")
    # r13 restructure (guide §2.4 "remove shuffles outright"): the old
    # plan joined the FULL batch-gram relation back to (batch_first,
    # index) to count per doc — re-shuffling every gram row twice. But
    # both outputs are derivable without that join: n_grams is the
    # map-side SIZE of the doc's distinct-gram array (doc_gram_counts,
    # zero shuffles), and each gram contributes at most one novel unit,
    # attributed to its __batch_first doc — so n_novel is a groupBy
    # over the (already gram-partitioned) batch_first relation after
    # the index anti-join, ≤ one row per batch doc. Shuffled bytes
    # drop from 2×|batch grams| to |batch grams| + |batch docs|.
    g = doc_ngrams(batch, key_col, text_col, n)
    batch_first = (g.groupBy("gram")
                   .agg(F.min(key_col).alias("__batch_first")))
    fresh = batch_first.join(index.select("gram"), "gram", "left_anti")
    novel = (fresh.groupBy("__batch_first")
             .agg(F.count("*").alias("__n_novel")))
    per_doc = doc_gram_counts(batch, key_col, text_col, n)
    scores = (per_doc.join(
        novel, per_doc[key_col] == novel["__batch_first"], "left")
        .select(key_col, F.col("n_grams"),
                F.coalesce("__n_novel", F.lit(0)).cast("bigint")
                .alias("n_novel")))
    delta = fresh.select("gram", F.col("__batch_first").alias("first_key"))
    return scores, delta


# Portable-Bloom hash family: (rh * A_i + B_i) mod P mod m, with the
# base-31 rolling hash as the input. A_i are the Knuth / xxPrime32 /
# murmur3-c2 multiplicative constants — all < 4.3e9, so with
# rh < P ≈ 1e9 the product stays under 2^63 (no overflow on either
# engine); B_i decorrelate the three functions.
BLOOM_PORTABLE_A = (2_654_435_761, 2_246_822_519, 3_266_489_917)
BLOOM_PORTABLE_B = (1, 7, 13)


def bloom_decontaminate_portable(df: DataFrame, bench_df: DataFrame,
                                 key_col: str, text_col: str,
                                 bench_text_col: str | None = None,
                                 n: int = 5,
                                 m_bits: int = 1 << 20) -> DataFrame:
    """ORACLE-CHECKABLE twin of :func:`bloom_decontaminate` (the r10
    conversion sweep reaching the sketch family): the same
    m-bit / k=3 Bloom prefilter, but every hash is ENGINE-PORTABLE
    arithmetic — the base-31 rolling hash of the shingle
    (functions/text.py:rolling_hash, already oracle-anchored) pushed
    through three multiply-add-mod functions — so the built bitmap,
    every membership test, and the flagged set are bit-identical
    across engines and the entry can be value-hash-checked (the
    xxhash64 original is inherently rows-only).

    Same contract as the original: no false NEGATIVES by Bloom
    construction (flagged ⊇ exactly-contaminated, asserted in
    tests); false positives re-check downstream. Masks use 32-bit
    words (w = p div 32, bit = 2^(p mod 32)): bit 63 of a 64-bit
    word is sign-territory on both engines and DuckDB's BIGINT shift
    overflows there — 32-bit words keep every mask a small positive
    int64 with zero two's-complement caveats.

    Scale shape mirrors the original: the bitmap is m/8 bytes built
    from the benchmark shingles (one explode + bit_or groupBy),
    broadcast; the corpus pass is explode + three position rows per
    shingle + one broadcast word join — linear, no pairwise step.
    The only added cost vs xxhash64 is the per-shingle codepoint
    fold, the price of portability."""
    btc = bench_text_col or text_col
    mod = F.lit(1_000_000_007)
    pow2 = F.array(*[F.lit(1 << i).cast("bigint") for i in range(32)])

    def positions(rh: Column) -> Column:
        return F.array(*[
            ((rh * F.lit(a) + F.lit(b)) % mod) % F.lit(m_bits)
            for a, b in zip(BLOOM_PORTABLE_A, BLOOM_PORTABLE_B)])

    def bit_mask(p: Column) -> Column:
        return F.element_at(pow2, (p % 32).cast("int") + 1)

    bench_sh = (bench_df.select(F.explode(shingles(btc, n)).alias("sh"))
                .distinct()
                .select(rolling_hash(F.col("sh"), prefix_len=None)
                        .alias("__rh")))
    bpos = bench_sh.select(
        F.explode(positions(F.col("__rh"))).alias("p"))
    bitmap = (bpos.select(F.expr("p div 32").alias("w"),
                          bit_mask(F.col("p")).alias("b"))
              .groupBy("w")
              .agg(F.bit_or("b").cast("bigint").alias("mask")))

    corpus = (df.select(F.col(key_col),
                        F.explode(shingles(text_col, n)).alias("sh"))
              .select(key_col, "sh",
                      rolling_hash(F.col("sh"), prefix_len=None)
                      .alias("__rh")))
    probes = corpus.select(
        key_col, "sh", F.explode(positions(F.col("__rh"))).alias("p"))
    hits = (probes
            .join(F.broadcast(bitmap), F.expr("p div 32") == F.col("w"))
            .filter(F.col("mask").bitwiseAND(bit_mask(F.col("p")))
                    != 0)
            .groupBy(key_col, "sh")
            .agg(F.count(F.lit(1)).alias("__nset")))
    return (hits.filter(F.col("__nset") == len(BLOOM_PORTABLE_A))
            .select(F.col(key_col).alias("flagged_doc_id"))
            .distinct())
