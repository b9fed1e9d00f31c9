"""bpe_train (operators/tokenizer.py) vs an independent pure-Python
BPE implementation: identical merge tables (order, symbols, counts)
on constructed corpora, plus the stopping criterion and determinism.
"""

from __future__ import annotations

import pytest

from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
    END_OF_WORD,
    bpe_train,
    merges_df,
)


def _python_bpe(texts, n_merges, min_pair_count=2):
    """Reference BPE (Sennrich et al.): dict-of-tuples vocab, greedy
    left-to-right merge, (count DESC, left ASC, right ASC) tiebreak."""
    vocab: dict = {}
    for t in texts:
        for w in t.lower().strip().split():
            syms = tuple(list(w) + [END_OF_WORD])
            vocab[syms] = vocab.get(syms, 0) + 1
    merges = []
    for rank in range(n_merges):
        pairs: dict = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (a, b), pc = min(pairs.items(),
                         key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if pc < min_pair_count:
            break
        merges.append((rank, a, b, a + b, pc))
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


CORPORA = [
    ["low low low low low lower lower newest newest newest newest "
     "newest newest widest widest widest"],
    ["aaa aaa aa a aaaa"],                      # overlap-greedy edge
    ["ab ab ab abc abc bc", "ba ba cab"],       # competing pairs
    ["x"],                                      # single char + </w> only
    # unicode: CJK + astral emoji + combining accent — Spark's
    # split('') is codepoint-aware (probed: an emoji is ONE symbol,
    # never a surrogate pair), matching Python's list(word)
    ["\u4f60\u597d \u4f60\u597d \U0001F600\U0001F600 "
     "caf\u00e9 caf\u00e9 cafe\u0301"],
]


@pytest.mark.parametrize("texts", CORPORA)
def test_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    got, _ = bpe_train(df, "text", n_merges=8)
    want = _python_bpe(texts, 8)
    assert got == want


def test_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["id", "text"])
    # every adjacent pair occurs once -> nothing reaches the floor
    got, _ = bpe_train(df, "text", n_merges=5, min_pair_count=2)
    assert got == []


def test_deterministic_and_df_artifact(spark):
    texts = CORPORA[2]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    a, _ = bpe_train(df, "text", n_merges=6)
    b, _ = bpe_train(df, "text", n_merges=6)
    assert a == b
    mdf = merges_df(spark, a)
    assert mdf.columns == ["rank", "left", "right", "merged",
                           "pair_count"]
    assert mdf.count() == len(a)


def test_encode_counts_match_python_encoder(spark):
    texts = CORPORA[0]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "text"])
    merges, _ = bpe_train(df, "text", n_merges=6)

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_encode_counts,
    )
    got = {r["id"]: r for r in
           bpe_encode_counts(df, "id", "text", merges).collect()}

    def encode(word):
        syms = list(word) + [END_OF_WORD]
        for _r, a, b, _m, _pc in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for i, t in enumerate(texts):
        words = [w for w in t.lower().strip().split() if w]
        want_tokens = sum(len(encode(w)) for w in words)
        assert got[i]["n_words"] == len(words)
        assert got[i]["n_bpe_tokens"] == want_tokens
    # merges compress: fewer tokens than raw chars+markers
    raw = sum(len(w) + 1 for t in texts
              for w in t.lower().strip().split() if w)
    assert got[0]["n_bpe_tokens"] < raw


def test_encode_empty_doc_drops_out(spark):
    df = spark.createDataFrame([(1, "ab ab"), (2, "   ")], ["id", "text"])
    merges, _ = bpe_train(df, "text", n_merges=2)
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_encode_counts,
    )
    out = {r["id"] for r in
           bpe_encode_counts(df, "id", "text", merges).collect()}
    assert out == {1}


def test_portable_twin_equals_driver_looped_trainer(spark, sf_dir):
    """ext_bpe_train_portable's contract (r11): the bounded-round
    zero-collect twin produces EXACTLY the driver-looped trainer's
    merge table for the same round count (no early stop engaged:
    min_pair_count=1)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train_portable_merges,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    merges, _ = bpe_train(docs, "text", n_merges=6, min_pair_count=1)
    got = [(r.merge_rank, r.l_sym, r.r_sym, r.merged, r.pair_count)
           for r in bpe_train_portable_merges(docs, "text", n_merges=6)
           .orderBy("merge_rank").collect()]
    assert got == [(rank + 1, l, r, m, pc)
                   for rank, l, r, m, pc in merges]


def test_portable_twin_wrapped_replace_is_greedy(spark):
    """The wrapped-symbol replace must equal the greedy fold on the
    adversarial overlap cases: runs of the same symbol ('a a a a' →
    'aa aa', not 'aa a a') and a merge whose result could complete a
    new occurrence."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train_portable_merges,
    )

    # 'aaaaaa' → symbols a×6,</w>: round-1 (a,a) has FIVE adjacent
    # occurrences but greedy left-to-right merges only three
    # non-overlapping ones → [aa,aa,aa,</w>]; round 2 then sees
    # (aa,aa)×2 vs (aa,</w>)×1 — the 2-count winner certifies the
    # replace really produced the greedy rewrite, not 'aa a a...'
    df = spark.createDataFrame([("aaaaaa",)], ["text"])
    rows = {(r.merge_rank, r.l_sym, r.r_sym, r.pair_count)
            for r in bpe_train_portable_merges(df, "text", n_merges=2)
            .collect()}
    assert (1, "a", "a", 5) in rows
    assert (2, "aa", "aa", 2) in rows


def test_portable_twin_zero_rounds_is_empty(spark):
    """n_merges=0 returns an empty typed merge table — the same
    degenerate-input grace as bpe_train's ([], vocab) (post-round
    review: it used to IndexError)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train_portable_merges,
    )

    df = spark.createDataFrame([("ab ab",)], ["text"])
    out = bpe_train_portable_merges(df, "text", n_merges=0)
    assert out.count() == 0
    assert out.columns == ["merge_rank", "l_sym", "r_sym", "merged",
                           "pair_count"]
