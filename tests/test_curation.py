"""Unit tests for operators/curation.py on constructed corpora, plus
the Bloom-decontamination containment contract on the real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    bloom_decontaminate,
    c4_sentence_filter,
    gopher_signals,
    trigram_familiarity,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
    REGISTRY,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def test_gopher_signals_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on a mat today fine"),     # 8 words, 2 stops
         (2, "x " * 40),                             # 40 1-char words
         (3, "the quick brown fox jumps over a fence near the "
             "old barn today " + "word " * 20)],     # long enough, stops
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           gopher_signals(df, "doc_id", "text", min_words=5,
                          max_words=50).collect()}
    r1 = out[1]
    assert r1["n_words"] == 8 and r1["n_stopwords"] == 2
    assert r1["sum_word_chars"] == len("thecatsatonamattodayfine")
    assert bool(r1["keep"])  # mean len 24/8=3 hits the lower bound
    r2 = out[2]
    assert r2["n_words"] == 40 and r2["n_stopwords"] == 0
    assert not r2["keep"]    # mean word length 1 < 3 AND no stopwords
    assert bool(out[3]["keep"])


def test_c4_filter_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "Good one. Also fine! Really? unterminated tail"),
         (2, "code here { x } . ok. two. three."),
         (3, "Lorem Ipsum dolor sit. amet. more. text."),
         (4, "only. two."),
         (5, "no terminal at all")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           c4_sentence_filter(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1["n_sentences"] == 4 and r1["n_kept_sentences"] == 3
    assert bool(r1["keep"])
    assert out[2]["has_curly"] and not out[2]["keep"]
    assert out[3]["has_lorem"] and not out[3]["keep"]
    # 2 kept < 3 minimum
    assert out[4]["n_kept_sentences"] == 2 and not out[4]["keep"]
    # unterminated text = one parsed fragment, zero kept
    r5 = out[5]
    assert r5["n_sentences"] == 1 and r5["n_kept_sentences"] == 0
    assert not r5["keep"]


def test_trigram_familiarity_hand_checked(spark):
    # norm texts: 'aaab' -> trigrams aaa,aab ; 'aaac' -> aaa,aac
    df = spark.createDataFrame(
        [(1, "aaab"), (2, "aaac")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           trigram_familiarity(df, "doc_id", "text").collect()}
    # counts: aaa=2, aab=1, aac=1
    assert out[1]["n_trigrams"] == 2
    assert out[1]["familiarity_sum"] == 2 + 1
    assert out[1]["rarest_count"] == 1
    assert out[2]["familiarity_sum"] == 2 + 1


def test_trigram_counts_repeats(spark):
    # repeats inside one doc count every occurrence: 'aaaa' -> aaa x2
    df = spark.createDataFrame([(1, "aaaa")], ["doc_id", "text"])
    row = trigram_familiarity(df, "doc_id", "text").collect()[0]
    assert row["n_trigrams"] == 2 and row["familiarity_sum"] == 4


def test_bloom_contains_every_exact_contamination(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    flagged = {r[0] for r in
               bloom_decontaminate(docs, bench, "doc_id", "text", n=5)
               .collect()}
    exact = {r[0] for r in
             REGISTRY["ext_decontaminate"].build(spark, sf_dir).collect()}
    assert exact <= flagged, exact - flagged  # NO false negatives, ever
    # false positives exist but stay a small re-check set
    n_docs = docs.count()
    assert len(flagged - exact) <= max(5, n_docs // 10)


def test_bloom_tiny_filter_degrades_to_superset_only(spark):
    # pathological m: everything collides -> still a correct superset
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w"),
         (3, "a b c d e f g h")], ["doc_id", "text"])
    bench = df.filter(F.col("doc_id") == 1)
    flagged = {r[0] for r in
               bloom_decontaminate(df, bench, "doc_id", "text", n=5,
                                   m_bits=64).collect()}
    assert {1, 3} <= flagged


def test_quantized_topk_recall_vs_fp32(spark, sf_dir):
    # int8 scoring is an approximation: most of its top-5 must sit in
    # the exact fp32 top-10 (the two-stage design re-ranks the short
    # list in fp32, so ranking noise inside the list is expected)
    q5 = [r["vec_id"] for r in
          REGISTRY["ext_ann_quantized_topk"].build(spark, sf_dir).collect()]
    brute = [r["vec_id"] for r in
             REGISTRY["ext_ann_brute_topk"].build(spark, sf_dir).collect()]
    assert len(q5) == 5
    assert len(set(q5) & set(brute[:10])) >= 4
    assert len(set(q5) & set(brute[:5])) >= 2


def test_oracle_sql_handles_empty_docs_like_operators():
    """The driver may regenerate testdata with empty/whitespace docs;
    the C4 and Gopher ORACLES must then still agree with the
    operators. DuckDB-only check: evaluate the registered oracle SQL
    over a fixture corpus containing both degenerate shapes and
    compare with the independent Python models (which the operators
    are property-tested against)."""
    import duckdb

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    con = duckdb.connect()
    con.execute("""CREATE TABLE documents AS SELECT * FROM (VALUES
        (1, '', 'en', 's', 0),
        (17, '   ', 'en', 's', 3),
        (3, 'one two three four five six seven eight nine ten '
            || 'eleven twelve thirteen', 'en', 's', 80))
        AS t(doc_id, text, lang, source, n_chars)""")

    gq = {r[0]: r for r in
          con.execute(REGISTRY["ext_gopher_quality"].oracle).fetchall()}
    # empty and whitespace-only docs: zero tokens, zero chars, no keep
    assert gq[1][1:] == (0, 0, 0, False)
    assert gq[17][1:] == (0, 0, 0, False)
    assert gq[3][1] == 13  # 13 words

    c4 = {r[0]: r for r in
          con.execute(REGISTRY["ext_c4_filters"].oracle).fetchall()}
    # doc 1: empty, no injection -> no sentences at all (doc 0 would
    # trigger BOTH injections: 0 mod anything == 0)
    assert c4[1][1:] == (0, 0, False, False, False)
    # doc 17: whitespace body but the '{ code }.' injection IS a
    # terminated sentence
    assert c4[17][1:] == (1, 1, True, False, False)
    # doc 3: 13 tokens -> 2 sentences; terminal iff (3+i)%3 != 0 ->
    # i=0 unterminated, i=1 terminated; the unterminated first
    # sentence glues into the terminated second -> 1 parsed, 1 kept
    assert c4[3][1:] == (1, 1, False, False, False)


def test_dsir_components_match_python_model(spark):
    """dsir_components vs an independent pure-Python DSIR model on a
    constructed corpus: exact integer components AND the float
    log-weight (within fp tolerance)."""
    import math

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
        HASH_BUCKETS,
        dsir_components,
    )

    rows = [(1, "alpha beta beta gamma", True),
            (2, "alpha alpha delta", True),
            (3, "beta beta beta epsilon", False),
            (4, "gamma delta delta zeta zeta", False),
            (5, "   ", False)]           # no tokens -> drops out
    df = spark.createDataFrame(rows, ["doc_id", "text", "tgt"])
    out = {r["doc_id"]: r for r in
           dsir_components(df, "doc_id", "text",
                           target=F.col("tgt")).collect()}
    assert set(out) == {1, 2, 3, 4}

    def bucket(tok: str) -> int:
        acc = 0
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % 1000000007
        return acc % HASH_BUCKETS

    ct: dict = {}
    cs: dict = {}
    docs = {}
    for doc_id, text, tgt in rows:
        toks = [w for w in text.lower().strip().split() if w]
        hs = [bucket(w) for w in toks]
        docs[doc_id] = (tgt, hs)
        for h in hs:
            d = ct if tgt else cs
            d[h] = d.get(h, 0) + 1
    for doc_id, (tgt, hs) in docs.items():
        if not hs:
            assert doc_id not in out
            continue
        r = out[doc_id]
        assert r["is_target"] == tgt
        assert r["n_tokens"] == len(hs)
        assert r["sum_ct"] == sum(ct.get(h, 0) for h in hs)
        assert r["sum_cs"] == sum(cs.get(h, 0) for h in hs)
        want = sum(math.log(ct.get(h, 0) + 1) - math.log(cs.get(h, 0) + 1)
                   for h in hs)
        assert abs(r["log_weight"] - round(want, 6)) < 1e-5
    # the target docs should out-weigh the source docs they don't share
    assert out[1]["log_weight"] > out[4]["log_weight"]
