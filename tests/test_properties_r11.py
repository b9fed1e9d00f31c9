"""Property tests for the round-11 portable twin: randomized corpora
compared against an independent pure-Python BPE trainer (the
test_properties_r10.py discipline). The corpus-level pins in
tests/test_tokenizer.py anchor the registry entry on the driver
testdata; these catch what a fixed corpus cannot — tie-heavy pair
counts, single-character words, repeated-symbol runs where greedy
left-to-right differs from replace-all-pairs, and pair exhaustion
mid-unroll."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])

END = "</w>"

# small alphabet forces merge collisions, repeated chars force the
# greedy-overlap rule, 1-char words force the pair-exhaustion branch
word_strategy = st.text(alphabet="abc", min_size=1, max_size=6)
corpus_strategy = st.lists(
    st.lists(word_strategy, min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=6)


def _python_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    """Independent sequential BPE trainer (greedy left-to-right
    apply, count DESC / left ASC / right ASC argmax) — written
    against the paper, not against the Spark code."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] += 1
    syms = {w: list(w) + [END] for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += vocab[w]
        if not pairs:
            break
        (l, r), pc = min(pairs.items(),
                         key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, pc))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


@SETTINGS
@given(corpus_strategy, st.integers(min_value=1, max_value=3))
def test_bpe_portable_twin_matches_python_trainer(spark, texts,
                                                  n_merges):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train_portable_merges,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [(r.merge_rank, r.l_sym, r.r_sym, r.merged, r.pair_count)
           for r in bpe_train_portable_merges(df, "text",
                                              n_merges=n_merges)
           .orderBy("merge_rank").collect()]
    assert got == _python_bpe(texts, n_merges)
