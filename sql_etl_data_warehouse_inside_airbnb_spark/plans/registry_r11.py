"""Round-11 additions: the BPE-training portable twin — the last
iterative family without a hash-green anchor (r10 verdict stretch
item 5).

``ext_bpe_train_portable`` unrolls a FIXED number of merge rounds
into static relational algebra on BOTH engines: per round, a
pair-count aggregate over the word-frequency vocab, a 1-row argmax
with the total-order tiebreak (count DESC, left ASC, right ASC), and
a cross-join string ``replace`` that applies the winning pair to
every word. The driver-looped :func:`operators.tokenizer.bpe_train`
collect()s the argmax row and inlines it; the twin keeps it as a
1-row relation, so the loop becomes g6_pagerank_portable-style
unrollable CTEs — zero driver traffic, every value int64/string.
"""

from __future__ import annotations

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)

_BPE_ROUNDS = 6

# Wrapped-symbol encoding shared with the Spark side (see
# operators/tokenizer.py:bpe_train_portable_merges): every symbol is
# ' ' + sym + TAB, so merge application is one replace() whose
# occurrences can never share boundary characters. Tokens are
# whitespace-split (the engine-portable class), so no symbol can
# contain either wrapper character.


def _bpe_portable_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """DuckDB oracle: the unrolled bounded-round BPE trainer. Every
    CTE is MATERIALIZED (the k-core oracle lesson: DuckDB inlines
    plain CTEs, and v{i} / b{i} are each referenced twice, so the
    chain would otherwise re-execute its whole prefix per
    reference)."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""p{i} AS MATERIALIZED (
         SELECT syms[g.i] AS l, syms[g.i + 1] AS r,
                CAST(sum(cnt) AS BIGINT) AS pc
         FROM (SELECT string_split(substr(s, 2, length(s) - 2),
                                   chr(9) || ' ') AS syms, cnt
               FROM v{i - 1}) t,
              LATERAL unnest(generate_series(1, len(syms) - 1)) AS g(i)
         GROUP BY 1, 2),
       b{i} AS MATERIALIZED (
         SELECT l, r, pc FROM p{i} ORDER BY pc DESC, l, r LIMIT 1),
       v{i} AS MATERIALIZED (
         SELECT replace(v.s,
                        ' ' || b.l || chr(9) || ' ' || b.r || chr(9),
                        ' ' || b.l || b.r || chr(9)) AS s, v.cnt
         FROM v{i - 1} v CROSS JOIN b{i} b)""")
    steps_sql = ",\n       ".join(steps)
    finals = "\n       UNION ALL\n       ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, l AS l_sym, "
        f"r AS r_sym, l || r AS merged, pc AS pair_count FROM b{i}"
        for i in range(1, rounds + 1))
    return f"""WITH words AS MATERIALIZED (
         SELECT w, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT tt.term AS w
               FROM documents,
                    UNNEST(string_split_regex(lower(trim(text)),
                           '[ \\t\\n\\x0b\\f\\r]+')) AS tt(term)
               WHERE tt.term <> '') GROUP BY w),
       v0 AS MATERIALIZED (
         SELECT ' ' || array_to_string(
                  list_concat(
                    list_transform(range(1, length(w) + 1),
                      i -> substr(w, CAST(i AS INTEGER), 1)),
                    ['</w>']),
                  chr(9) || ' ') || chr(9) AS s,
                cnt
         FROM words),
       {steps_sql}
       {finals}"""


@register(
    "ext_bpe_train_portable",
    _bpe_portable_oracle(),
    survey="§7.5 tokenizer ext (BPE train, bounded-round "
           "hash-checkable twin)",
    note="the oracle-paired twin of ext_bpe_train_merges (rows-only "
         "since r4: its merges are driver-looped collect()ed "
         "scalars). operators/tokenizer.py:bpe_train_portable_merges "
         "fixes the round count (6, no early stop) and keeps each "
         "round's argmax pair AS A 1-ROW RELATION: pair counts are "
         "one map-side-combinable aggregate over the |vocab| rows "
         "(never corpus rows — the word-frequency trick), the winner "
         "is a 1-row TakeOrdered with the total-order tiebreak "
         "(count DESC, left, right — deterministic on any engine), "
         "and the merge applies via ONE broadcast-1-row string "
         "replace over the wrapped-symbol encoding (' sym\\t' per "
         "symbol: occurrences are self-delimited, so leftmost "
         "non-overlapping replace-all IS greedy left-to-right BPE). "
         "All int64/string — bit-identical across engines; equality "
         "with the driver-looped bpe_train for the same rounds "
         "pinned in tests/test_tokenizer.py. Rounds are "
         "eager-localCheckpointed in build() (g6/g8 lineage "
         "discipline) -> benched under MAINTENANCE. Zero driver "
         "traffic — strictly stronger than bpe_train's one-row-per-"
         "round collect at 100 TB (no driver round trips on the "
         "critical path)",
    tags=("llm-pipeline",))
def ext_bpe_train_portable(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.tokenizer import (
        bpe_train_portable_merges,
    )

    # Deliberately NOT session-cached (r11 advisor note, considered):
    # unlike the ANN twins' _PORTABLE_GRID_INDEX/_MMR_PORTABLE
    # probes — offline INDEX artifacts reused by a query path — this
    # entry IS the training job, and bench.py's MAINTENANCE suite
    # times repeated build() calls to price exactly that (min-of-2
    # re-trainings). A per-(applicationId, sf_dir) cache would make
    # every measured pass after the first time a cached DataFrame
    # (~0.1 s) instead of the 1.5 s training it reports, breaking
    # round-over-round bench comparability. Sweep cost stands
    # documented: ~1.5 s per build() in registry-wide sweeps
    # (test_plan_audit builds each plan once).
    docs = t(spark, sf_dir, "documents").select("text")
    return bpe_train_portable_merges(docs, "text",
                                     n_merges=_BPE_ROUNDS)
