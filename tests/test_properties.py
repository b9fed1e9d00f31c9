"""Property-based tests (hypothesis) for the messy-string sanitizers.

Each property compares the engine's vectorized Column expression
against an INDEPENDENT Python model of the reference's semantics
(T-SQL REPLACE/TRY_CAST ladder, pandas str sanitizers) over generated
inputs — the fixed unit tests pin the known edge cases, these hunt the
unknown ones. Inputs are drawn from the messy-money/boolean alphabet
the reference actually faces (digits, $ , . - CR, t/f letters), not
exotic numeric notations the domain never produces.

Each example is one Spark job over a batch of strings, so examples are
capped low; the batch dimension (up to 40 strings/example) carries the
search width.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, InvalidOperation

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    TRUTHY_LOADER,
    TRUTHY_SQL,
    clean_money,
    norm_bool,
    parse_host_location,
    parse_host_location_udf,
    sanitize_numstr,
    truncate_str,
)

MONEY_ALPHABET = "0123456789$,.-\r tf"
SETTINGS = settings(max_examples=20, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])

money_strings = st.lists(
    st.one_of(st.none(),
              st.text(alphabet=MONEY_ALPHABET, max_size=14)),
    min_size=1, max_size=40)


def _run(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], schema="s string")
    return [r.out for r in df.select(expr.alias("out")).collect()]


def _model_clean_money(s):
    if s is None:
        return None
    cleaned = s.strip().replace("$", "").replace(",", "").replace("\r", "")
    if cleaned == "":
        return None
    try:
        d = Decimal(cleaned)
    except InvalidOperation:
        return None
    q = d.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    # DECIMAL(10,2): 8 integer digits max; overflow -> NULL (try_cast)
    if abs(q) >= Decimal("100000000"):
        return None
    return q


@given(money_strings)
@SETTINGS
def test_clean_money_matches_reference_model(spark, values):
    got = _run(spark, values, clean_money("s"))
    want = [_model_clean_money(v) for v in values]
    assert got == want


def _model_sanitize_numstr(s):
    if s is None:
        return None
    t = s.strip()
    import re
    t = re.sub(r"\.0+$", "", t)
    return t if t != "" else None


@given(money_strings)
@SETTINGS
def test_sanitize_numstr_matches_model(spark, values):
    got = _run(spark, values, sanitize_numstr("s"))
    want = [_model_sanitize_numstr(v) for v in values]
    assert got == want


bool_strings = st.lists(
    st.one_of(st.none(),
              st.text(alphabet="tfynoYESTRUE01 ", max_size=8)),
    min_size=1, max_size=40)


@given(bool_strings, st.sampled_from([TRUTHY_SQL, TRUTHY_LOADER]),
       st.sampled_from([False, None]))
@SETTINGS
def test_norm_bool_matches_ladder_model(spark, values, truthy, null_as):
    got = _run(spark, values, norm_bool("s", truthy=truthy, null_as=null_as))
    want = [(null_as if v is None else v.strip().lower() in truthy)
            for v in values]
    assert got == want


@given(st.lists(st.one_of(st.none(), st.text(max_size=30)),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=12))
@SETTINGS
def test_truncate_str_is_python_slice(spark, values, n):
    # surrogate halves break Arrow/JVM round-trips; the domain is text
    values = [v for v in values
              if v is None or not any('\ud800' <= ch <= '\udfff' for ch in v)]
    if not values:
        values = ["x"]
    got = _run(spark, values, truncate_str("s", n))
    want = [None if v is None else v[:n] for v in values]
    assert got == want


location_strings = st.lists(
    st.one_of(st.none(),
              st.text(alphabet="abcDEF ,", max_size=24)),
    min_size=1, max_size=40)


@given(location_strings)
@SETTINGS
def test_host_location_expr_equals_pandas_udf(spark, values):
    # the JVM column expression and the Arrow pandas-UDF variant are
    # two implementations of data_cleaner.py:48-65 — they must agree
    # on every input, not just the 97.4% "City, Country" happy path
    df = spark.createDataFrame([(v,) for v in values], schema="s string")
    city, country = parse_host_location("s")
    via_expr = df.select(city, country).collect()
    via_udf = (df.select(parse_host_location_udf("s").alias("p"))
               .select(F.col("p.city").alias("host_city"),
                       F.col("p.country").alias("host_country"))
               .collect())
    assert [tuple(r) for r in via_expr] == [tuple(r) for r in via_udf]


@pytest.fixture(scope="module", autouse=True)
def _quiet(spark):
    spark.sparkContext.setLogLevel("ERROR")
    yield


rh_texts = st.lists(
    st.text(alphabet=st.characters(max_codepoint=0xFFFF,
                                   blacklist_categories=("Cs",)),
            max_size=80),
    min_size=1, max_size=20)


@given(rh_texts)
@SETTINGS
def test_rolling_hash_matches_python_fold(spark, values):
    # functions.text.rolling_hash is a declarative aggregate() fold;
    # pin it to the plain-python Rabin-Karp reference on arbitrary BMP
    # text (astral chars excluded: JVM strings are UTF-16, so a
    # 1-char substring there is a code UNIT, not a codepoint)
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        rolling_hash,
    )

    def py_rh(s, prefix=64):
        acc = 0
        for ch in s[:prefix]:
            acc = (acc * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
        return acc

    df = spark.createDataFrame([(v,) for v in values], schema="s string")
    got = [r.h for r in df.select(rolling_hash("s").alias("h")).collect()]
    assert got == [py_rh(v) for v in values]


winnow_parts = st.tuples(
    st.text(alphabet="abcdefgh ", max_size=20),
    st.text(alphabet="ABCDEFGH ", min_size=8, max_size=20),
    st.text(alphabet="stuvwxyz ", max_size=20))


@given(winnow_parts)
@SETTINGS
def test_winnow_guarantee_on_random_texts(spark, parts):
    # winnowing guarantee (SIGMOD'03): two texts sharing ANY run of
    # >= window+k-1 = 8 chars share at least one fingerprint,
    # wherever the run lands in either text (within the hashed
    # prefix). Doc 1 = prefix+shared, doc 2 = shared+suffix, with
    # disjoint alphabets so only the planted run is shared.
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        winnow_fingerprints,
    )
    prefix, shared, suffix = parts
    df = spark.createDataFrame(
        [(1, prefix + shared), (2, shared + suffix)],
        ["doc_id", "text"])
    rows = winnow_fingerprints(df, "doc_id", "text",
                               k=5, window=4, prefix_len=64).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2]


@given(st.lists(st.tuples(st.sampled_from(["png", "jpeg", "gif"]),
                          st.integers(1, 65535), st.integers(1, 65535)),
                min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_image_header_roundtrip_property(cases):
    # pure-Python kernel property (no Spark): every builder output
    # decodes back exactly; corrupting the first byte never decodes
    # to a wrong answer (None or a different format is fine, a wrong
    # width/height is not possible since parsing is header-exact)
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        gif_bytes,
        image_dimensions,
        jpeg_bytes,
        png_bytes,
    )
    builders = {"png": png_bytes, "jpeg": jpeg_bytes, "gif": gif_bytes}
    for fmt, w, h in cases:
        payload = builders[fmt](w, h)
        assert image_dimensions(payload) == (fmt, w, h)
        corrupted = bytes([payload[0] ^ 0xFF]) + payload[1:]
        got = image_dimensions(corrupted)
        assert got is None or got[0] != fmt


@given(st.integers(0, 400), st.sampled_from([(64, 16), (32, 8), (16, 0)]))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_documents_tiling_property(spark, n_tokens, shape):
    # for any doc length and (chunk_size, overlap): chunk ids are dense
    # from 0, consecutive chunks start exactly step tokens apart, the
    # union of chunks covers all tokens, and every chunk is non-empty
    # except the single chunk of an empty doc
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        chunk_documents,
    )
    chunk_size, overlap = shape
    step = chunk_size - overlap
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, chunk_size=chunk_size,
                                  overlap=overlap).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    if n_tokens == 0:
        assert len(rows) == 1 and rows[0].n_chunk_tokens == 0
        return
    covered = set()
    for r in rows:
        toks = r.chunk_text.split()
        assert toks[0] == f"w{r.chunk_id * step}"
        assert len(toks) == r.n_chunk_tokens <= chunk_size
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(n_tokens)}
    # no chunk beyond the one holding the last token
    assert (len(rows) - 1) * step < n_tokens


@given(docs=st.lists(
    st.lists(st.sampled_from(["boiler", "common", "alpha", "beta",
                              "gamma"]),
             min_size=1, max_size=5),
    min_size=1, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_idempotent_and_conservative(spark, docs):
    # for any corpus of NON-EMPTY lines: (1) line_dedup never changes
    # corpus cardinality, (2) kept+dropped == total lines per doc,
    # (3) the op is IDEMPOTENT on surviving docs — a surviving line's
    # document frequency can only shrink when lines are deleted, so a
    # second pass removes nothing. (The non-empty-line restriction is
    # load-bearing: a fully-boilerplate doc re-enters pass 2 as one
    # EMPTY line, which can push ''-line DF over the threshold and
    # strip empty lines from other docs — the documented reason a real
    # pipeline drops empty lines before/after this op.)
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        line_dedup,
    )
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = line_dedup(df, "doc_id", "text", max_df=2)
    got = {r.doc_id: r for r in once.collect()}
    assert set(got) == {i for i, _ in rows}
    for i, lines in enumerate(docs):
        assert got[i].lines_kept + got[i].lines_dropped == len(lines)
    survivors = once.filter(F.col("lines_kept") > 0)
    twice = line_dedup(
        survivors.select("doc_id", F.col("cleaned_text").alias("text")),
        "doc_id", "text", max_df=2)
    for r in twice.collect():
        assert r.cleaned_text == got[r.doc_id].cleaned_text
        assert r.lines_dropped == 0


# -------------------------- curation-rule properties (round 3)

_WORDS = ["the", "a", "spark", "table", "row", "data", "merge", "x",
          "lorem", "ipsum", "{", "}", "value.", "ok!", "why?"]

doc_batches = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30)
    .map(" ".join),
    min_size=1, max_size=25)


def _gopher_model(s, min_words, max_words):
    toks = s.strip().split() if s.strip() else []
    n = len(toks)
    chars = sum(len(w) for w in toks)
    stops = sum(1 for w in toks
                if w.lower() in ("the", "a", "of", "and", "to", "in"))
    keep = (min_words <= n <= max_words and 3 * n <= chars <= 10 * n
            and stops >= 2)
    return (n, chars, stops, keep)


@SETTINGS
@given(doc_batches)
def test_gopher_signals_match_python_model(spark, texts):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        gopher_signals,
    )
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_words"], r["sum_word_chars"],
                         r["n_stopwords"], bool(r["keep"]))
           for r in gopher_signals(df, "doc_id", "text",
                                   min_words=2, max_words=20).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _gopher_model(s, 2, 20), (i, s)


def _c4_model(s, min_sentences=3):
    t = s.strip()
    import re
    segments = re.split(r"(?<=[.!?])\s+", t) if t else []
    kept = [x for x in segments if re.search(r"[.!?]$", x)]
    has_curly = "{" in t or "}" in t
    has_lorem = "lorem ipsum" in t.lower()
    keep = (not has_curly and not has_lorem
            and len(kept) >= min_sentences)
    return (len(segments), len(kept), has_curly, has_lorem, keep)


@SETTINGS
@given(doc_batches)
def test_c4_filter_matches_python_model(spark, texts):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        c4_sentence_filter,
    )
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_sentences"], r["n_kept_sentences"],
                         bool(r["has_curly"]), bool(r["has_lorem"]),
                         bool(r["keep"]))
           for r in c4_sentence_filter(df, "doc_id", "text").collect()}
    for i, s in enumerate(texts):
        assert got[i] == _c4_model(s), (i, repr(s))


# ------------------------------------------- round-4 event/spatial ops

@given(events=st.lists(
    st.tuples(st.integers(0, 3),            # user
              st.integers(0, 10_000),       # offset seconds
              st.integers(0, 999_999)),     # microsecond part
    min_size=1, max_size=60))
@SETTINGS
def test_sessionize_matches_python_model(spark, events):
    """Gap sessionization == an independent Python fold over the same
    (ts, id)-ordered stream: same session count per user, same
    per-session event counts and integer-microsecond durations."""
    from datetime import datetime, timedelta

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
        sessionize,
    )

    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=sec, microseconds=us), u, "e", 0.0)
            for i, (u, sec, us) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    gap_us = 30 * 60 * 1_000_000

    model = {}
    per_user = {}
    for eid, ts, u, _, _ in rows:
        per_user.setdefault(u, []).append((ts, eid))
    for u, evs in per_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, _ in evs:
            t_us = int(round(ts.timestamp() * 1_000_000))
            if prev is None or t_us - prev >= gap_us:
                idx += 1
                model[(u, idx)] = [0, t_us, t_us]
            rec = model[(u, idx)]
            rec[0] += 1
            rec[2] = t_us
            prev = t_us
    got = {(r.user_id, r.session_idx): (r.n_events, r.duration_us)
           for r in sessionize(df).collect()}
    want = {k: (n, last - first) for k, (n, first, last) in model.items()}
    assert got == want


@given(pts=st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                    min_size=1, max_size=50),
       radius=st.integers(1, 12))
@SETTINGS
def test_grid_join_property_equals_brute(spark, pts, radius):
    """For ANY point set and radius, grid blocking emits exactly the
    brute-force pair set, each pair once (self-join of one cloud)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.spatial import (
        grid_distance_join,
    )

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    want = {(a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
            for a, xa, ya in rows for b, xb, yb in rows
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius}
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    out = [(r.left_id, r.right_id, r.dist_sq)
           for r in grid_distance_join(df, df, radius).collect()]
    assert len(out) == len(set(out))
    assert set(out) == want
