"""Text analysis for training-data pipelines (SURVEY §7.5 extensions;
generalizes the reference's langdetect UDF, scripts/app/
language_detection.py, and comment profiling, scripts/debug/
analyze_comment_length.py).

Everything has two implementations where it matters:

- a pure Column expression (JVM, whole-stage codegen) — the hot path;
- an Arrow-batched pandas UDF with IDENTICAL semantics — the surface
  demo for pluggable Python models (the reference's langdetect is the
  only genuinely-Python op it has; U4).

The language-ID heuristic is deliberately SQL-expressible (marker-token
counting) so the DuckDB oracle can verify BOTH implementations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# marker tokens per language, priority order breaks score ties.
# Counting is substring-occurrence (split-based), identical in Spark
# split / python str.count / DuckDB string_split.
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", (" the ", " a ")),
    ("es", (" la ", " el ")),
    ("de", (" der ", " und ")),
    ("fr", (" le ", " les ")),
]


def _pad(col: Column) -> Column:
    return F.concat(F.lit(" "), F.trim(col), F.lit(" "))


def _count_occurrences(col: Column, marker: str) -> Column:
    # split() with a no-metachar pattern == literal split; -1 keeps
    # trailing empties so counts match python/DuckDB exactly
    return F.size(F.split(col, marker, -1)) - F.lit(1)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(F.trim(c) == "", F.lit(0))
             .otherwise(F.size(F.split(F.trim(c), r"\s+", -1)))
             .cast("bigint"))


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = _pad(F.col(col) if isinstance(col, str) else col)
    out = {}
    for lang, markers in LANG_MARKERS:
        score = None
        for m in markers:
            cnt = _count_occurrences(c, m)
            score = cnt if score is None else score + cnt
        out[lang] = score
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax over marker scores, ties broken by LANG_MARKERS order,
    all-zero → 'und'. Column-expression implementation."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(
        iter(scores.values()))
    expr = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        expr = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


def _heuristic_detect(s: str | None) -> str:
    """Python twin of :func:`lang_id`: marker-token argmax, strict >
    == first-wins tie order, all-zero → 'und'. THE single definition —
    both pandas UDFs call it, so the fixture-pinned equivalence with
    the JVM expression can't silently fork."""
    if s is None:
        return "und"
    padded = " " + s.strip() + " "
    best_lang, best_score = "und", 0
    for lang, markers in LANG_MARKERS:
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


@F.pandas_udf(StringType())
def lang_id_udf(texts):
    """Arrow-batched pandas UDF with semantics identical to lang_id()
    — the pluggable-Python-model surface (U4). A real model (langdetect,
    fasttext, …) drops in here without touching the plan."""
    import pandas as pd

    return pd.Series([_heuristic_detect(s) for s in texts])


try:  # public optional dependency — the reference's actual detector
    import langdetect as _langdetect  # noqa: F401
    HAVE_LANGDETECT = True
except ImportError:
    HAVE_LANGDETECT = False


@F.pandas_udf(StringType())
def lang_detect_udf(texts):
    """Library-backed language detection — full U4 parity with the
    reference's langdetect UDF (scripts/app/language_detection.py:41-154
    wraps `langdetect.detect` per comment row; here it runs
    Arrow-batched). Uses the public ``langdetect`` package when
    installed (DetectorFactory.seed pinned for determinism, detection
    failures -> 'und' like the reference's try/except -> 'unknown'),
    and falls back to the marker-token heuristic otherwise — the UDF
    signature, plan shape, and null handling are identical either way,
    so installing the library never changes the query plan."""
    import pandas as pd

    if HAVE_LANGDETECT:
        from langdetect import DetectorFactory, detect
        from langdetect.lang_detect_exception import LangDetectException

        DetectorFactory.seed = 0

        def _detect(s):
            if s is None or not s.strip():
                return "und"
            try:
                return detect(s)
            except LangDetectException:
                return "und"
    else:
        _detect = _heuristic_detect

    return pd.Series([_detect(s) for s in texts])


def quality_features(col: Column | str) -> list[Column]:
    """Doc-quality features: token count, char count, mean token length,
    stopword ratio — the length/punct/stopword profile family."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    n_chars = F.length(F.trim(c)).cast("bigint")
    n_nospace = F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("bigint")
    stop_hits = _count_occurrences(_pad(c), " the ") + _count_occurrences(
        _pad(c), " a ")
    return [
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_nospace / F.greatest(n_tok, F.lit(1)), 6)
         .alias("mean_token_len"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6)
         .alias("stopword_ratio"),
    ]


def quality_score(col: Column | str) -> Column:
    """Composite quality milli-score in [0,1000]: rewards length up to
    100 tokens (500 pts) and moderate mean token length (200 pts),
    penalizes stopword stuffing (300 pts).

    Deliberately integer-valued: a float score rounded to N decimals is
    a cross-engine trap — ratios of small integers land exactly on
    rounding half-boundaries, where Spark (exact BigDecimal HALF_UP)
    and DuckDB (scale-multiply) can disagree by 1 ulp. Integer floors
    of small-rational terms are bit-deterministic everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    tok_safe = F.greatest(n_tok, F.lit(1))
    n_nospace = F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("bigint")
    stop = (_count_occurrences(_pad(c), " the ")
            + _count_occurrences(_pad(c), " a ")).cast("bigint")
    term_len = 5 * F.least(n_tok, F.lit(100))
    term_stop = F.lit(300) - F.least(F.floor(300 * stop / tok_safe),
                                     F.lit(300).cast("bigint"))
    term_mean = F.least(F.floor(25 * n_nospace / tok_safe),
                        F.lit(200).cast("bigint"))
    return (term_len + term_stop + term_mean).cast("bigint")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-collapsed, lowercased text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles as an array column (MinHash /
    Jaccard input). Empty array when fewer than n tokens.

    Perf: the tokenization is BOUND ONCE per row by routing it through
    a single-element ``transform`` whose lambda variable holds the
    token array. Referencing the ``split`` expression directly inside
    the gram lambda re-evaluates it per gram position (lambda bodies
    get no subexpression elimination), which is O(tokens²) per
    document — profiled at sf0.1 that was 3.3 s/pass vs ~0.1 s bound,
    and the shingle table is the input to every dedup/decontamination
    operator."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+", -1)

    def grams(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(t) - F.lit(n - 1))
        gram = F.transform(
            idx, lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]))
        return F.when(F.size(t) < n, F.array().cast("array<string>")) \
                .otherwise(F.array_distinct(gram))

    return F.element_at(F.transform(F.array(toks), grams), 1)


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 1_000_000_007


def rolling_hash(col: Column | str,
                 prefix_len: int | None = 64) -> Column:
    """Rabin-Karp polynomial rolling hash of the first ``prefix_len``
    characters (``None`` = the whole string): fold
    (acc * 31 + codepoint) % (1e9+7) left-to-right.
    BIGINT, 0 for empty text.

    Pure column expression — ``transform(sequence(...))`` builds the
    codepoint list and ``aggregate`` folds it, all inside whole-stage
    codegen (no UDF). The same fold is expressible in DuckDB as
    ``list_reduce`` (no-init reduce == init-0 fold because
    0*B + x1 = x1), which is what makes the fingerprint
    oracle-checkable across engines. This is the hash-ladder
    counterpart of :func:`fingerprint` (md5): cheap, incremental by
    construction, and the building block a streaming/chunked
    fingerprinter would extend window-by-window.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c if prefix_len is None else F.substring(c, 1, prefix_len)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(F.substring(s, i, F.lit(1))))
    return F.aggregate(
        codes, F.lit(0).cast("bigint"),
        lambda acc, x: (acc * ROLLING_HASH_BASE + x) % ROLLING_HASH_MOD)


# PII patterns — lookahead-free so the same regex runs on Java regex
# (Spark) and RE2 (DuckDB). Redaction order matters: emails first
# (their digits would otherwise feed the phone pattern).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def redact_pii(col: Column | str) -> Column:
    """Scrub emails then phone-number-shaped digit runs to
    ``<EMAIL>``/``<PHONE>`` placeholders — the minimum-viable PII pass
    a training-data pipeline runs before anything leaves the raw zone.
    Pure regexp_replace chain: JVM-side, codegen'd, engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


def distinct_token_bp(col: Column | str) -> Column:
    """Intra-document repetition signal: distinct-token share in
    integer basis points (10000 = every token unique; low values =
    boilerplate/repetition — the Gopher-style repetition filter).
    Integer floor arithmetic, so exact across engines."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+", -1)
    n = token_count(c)
    return (F.when(n == 0, F.lit(10000))
            .otherwise(F.floor(10000 * F.size(F.array_distinct(toks))
                               / n))
            .cast("bigint"))


def chunk_documents(df, key_col: str = "doc_id", text_col: str = "text",
                    chunk_size: int = 64, overlap: int = 16):
    """Split each document into overlapping token-window chunks — the
    context-window prep step (1→N row transform). Chunk i covers
    tokens [i*step, i*step + chunk_size) with step = chunk_size -
    overlap; every document yields at least one chunk.

    Shape: explode over a per-row ``sequence`` of chunk ids + ``slice``
    of the pre-split token array — single scan, no shuffle, no UDF;
    chunk count arithmetic is integer (``div``), so the fan-out is
    engine-portable and oracle-checkable. Output:
    (key, chunk_id, n_chunk_tokens, chunk_text)."""
    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("chunk_size must exceed overlap")
    # NULL text behaves like empty text (one empty chunk, 0 tokens) —
    # without the coalesce the NULL propagates to n_chunk_tokens while
    # concat_ws still emits '', an inconsistent row
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(c), r"\s+", -1)
    n = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(toks))
    base = df.select(F.col(key_col), toks.alias("__toks"),
                     n.cast("bigint").alias("__n"))
    n_chunks = F.greatest(
        F.expr(f"(__n - {overlap} + {step - 1}) div {step}"), F.lit(1))
    chunks = base.select(
        key_col, "__toks", "__n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"))
    piece = F.slice(F.col("__toks"), F.col("chunk_id") * step + 1,
                    chunk_size)
    # empty text still splits to [''] — report 0 tokens, not 1
    return chunks.select(
        F.col(key_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.when(F.col("__n") == 0, F.lit(0)).otherwise(F.size(piece))
         .cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"))


# GPT-2-style pre-tokenizer, lookahead-free so the same pattern runs on
# Java regex (Spark) and RE2 (DuckDB): contraction suffixes, optional
# leading-space letter runs, digit runs, punctuation runs, whitespace
BPE_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
               r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (the unit a byte-pair encoder would split further). BIGINT;
    0 for empty/NULL-trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.when(F.coalesce(F.trim(c), F.lit("")) == "", F.lit(0))
             .otherwise(F.regexp_count(c, F.lit(BPE_PATTERN)))
             .cast("bigint"))
