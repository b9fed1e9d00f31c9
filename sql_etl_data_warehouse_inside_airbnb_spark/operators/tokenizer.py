"""Distributed BPE tokenizer training (SURVEY §7.5 ext).

Byte-pair encoding (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", arXiv:1508.07909) is the tokenizer-
training step of every LLM data pipeline. The reference has no
tokenizer surface at all; this is the Spark-first formulation of the
standard algorithm:

* the corpus collapses to a WORD-FREQUENCY vocabulary first (the
  classical trick: merges depend only on (word, count), so every
  subsequent round runs over |distinct words| rows, not corpus rows —
  at 100 TB the vocab is millions of rows where the corpus is
  trillions);
* each round counts adjacent symbol pairs weighted by word count (one
  explode + one map-side-combinable groupBy over the vocab), takes the
  single most frequent pair with a total-order tiebreak
  (count DESC, left ASC, right ASC — deterministic on any engine or
  partitioning), and rewrites the symbol arrays with a pure column-
  expression greedy merge fold (no UDF);
* every round localCheckpoint()s the vocab — the connected-components
  lineage discipline; per-round driver traffic is ONE row (the chosen
  pair), the CC fixpoint-probe pattern.

The merge fold is exactly greedy left-to-right BPE: fold symbols into
an accumulator, replacing the accumulator's last element ``a`` with
``a+b`` when the current symbol is ``b``. A just-merged ``a+b`` can
never re-merge as ``a`` (``b`` is non-empty), which is precisely the
skip-ahead rule of the sequential algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, cnt) frequency vocabulary, words split on the
    engine-portable whitespace class, lowercased."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        fan_out,
    )
    # r13: fan the one-task single-row-group scan out before the
    # tokenize explode (guide §2.5; no-op at scale). Keyless columns
    # may exist, so spread on the text itself — deterministic.
    return (fan_out(df, text_col)
            .select(F.explode(tokens(text_col)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("cnt")))


def _initial_symbols(word: Column) -> Column:
    """word → [c1, c2, ..., cn, '</w>'] (character symbols plus the
    end-of-word marker, per the paper)."""
    chars = F.filter(F.split(word, ""), lambda c: F.length(c) > 0)
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) → left+right,
    as a pure aggregate fold (see module docstring for why the fold is
    exactly the sequential greedy rule)."""
    merged = left + right
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: -1 on the empty initial accumulator is
            # NULL (→ no merge), where element_at raises under ANSI
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(merged))))
        .otherwise(F.concat(acc, F.array(x))))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 16,
              min_pair_count: int = 2):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, vocab)``: ``merges`` is the ordered merge table
    [(rank, left, right, merged, pair_count)] as a list of tuples (the
    model artifact — ship it to the encoder), ``vocab`` the final
    symbolized word-frequency DataFrame.

    Stops early when no pair reaches ``min_pair_count`` (merging a
    pair seen once memorizes a single word — the paper's stopping
    criterion in spirit). Deterministic: integer counts with a
    total-order pair tiebreak, no floats anywhere.
    """
    vocab = (word_vocab(df, text_col)
             .select(_initial_symbols(F.col("w")).alias("syms"),
                     F.col("cnt"))
             .localCheckpoint(eager=True))
    merges: list[tuple] = []
    for rank in range(n_merges):
        n = F.size("syms")
        pairs = (vocab
                 .filter(n >= 2)
                 .select("cnt", F.explode(F.arrays_zip(
                     F.slice("syms", F.lit(1), n - 1).alias("l"),
                     F.slice("syms", F.lit(2), n - 1).alias("r")))
                     .alias("p"))
                 .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                 .agg(F.sum("cnt").alias("pc"))
                 .orderBy(F.desc("pc"), "l", "r")
                 .limit(1).collect())
        if not pairs or pairs[0]["pc"] < min_pair_count:
            break
        left, right, pc = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["pc"])
        merges.append((rank, left, right, left + right, pc))
        # r14: LAZY checkpoint (the g6/g9 playbook) — the next round's
        # pair-count collect() scans every vocab partition and is the
        # materializing job, so each round schedules ONE job instead
        # of two (rewrite-checkpoint + collect), and the FINAL round's
        # rewrite never runs at all for callers that only consume
        # ``merges`` (the ext_bpe_train_merges entry discards vocab —
        # the same dead-rewrite skip the portable twin documents),
        # while callers that do read ``vocab`` still materialize it
        # lazily and correctly. Consumers are sequential (collect,
        # then the next rewrite), so there is no sibling-stage race.
        vocab = (vocab.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"),
            F.col("cnt"))
            .localCheckpoint(eager=False))
    return merges, vocab


def bpe_train_portable_merges(df: DataFrame, text_col: str,
                              n_merges: int = 6) -> DataFrame:
    """Bounded-round BPE training with ZERO driver traffic — the
    hash-checkable twin of :func:`bpe_train` (the g6_pagerank_portable
    playbook applied to the last untwinned iterative family).

    :func:`bpe_train` is driver-looped because each round's chosen
    pair is collect()ed and inlined into the next round's plan. The
    twin removes the collect by keeping the chosen pair AS A RELATION:
    each of the FIXED ``n_merges`` rounds is (1) a pair-count
    aggregate over the vocab, (2) a 1-row argmax
    (count DESC, left ASC, right ASC — the same total-order tiebreak),
    and (3) a broadcast cross join applying the winner to every word
    via one string ``replace`` — so the whole loop unrolls into static
    relational algebra, expressible as DuckDB CTEs.

    The symbol encoding that makes replace() correct: a word's symbol
    list is one string with every symbol wrapped ``' ' + sym + '\\t'``
    (symbols are whitespace-split tokens plus ``</w>``, so they can
    never contain the wrapper characters). Merging (l, r) is then
    ``replace(s, ' l\\t r\\t', ' lr\\t')`` — each wrapped symbol is
    self-delimited, so occurrences never share boundary characters and
    leftmost non-overlapping replace-all IS the greedy left-to-right
    merge rule (a just-merged ``lr`` can complete no new occurrence:
    that would need r == lr or l == '', both impossible). Equality
    with the driver-looped trainer for the same round count is pinned
    in tests/test_tokenizer.py.

    Returns (merge_rank, l_sym, r_sym, merged, pair_count) — strings
    and int64 only, no early stop: exactly ``n_merges`` rows (fewer
    only when the vocab runs out of pairs entirely, matching the
    oracle's empty-argmax cascade).

    Scale: per round one map-side-combinable pair aggregate over
    |vocab| rows + a 1-row TakeOrdered + a broadcast-1-row rewrite;
    rounds are LAZY-localCheckpointed since r14 (one action cascade,
    and why this belongs in the MAINTENANCE bench suite — the work
    runs in build()). Driver traffic: zero rows.
    """
    vocab = (word_vocab(df, text_col)
             .select(F.concat(
                 F.lit(" "),
                 F.array_join(_initial_symbols(F.col("w")), "\t "),
                 F.lit("\t")).alias("s"),
                 F.col("cnt"))
             .localCheckpoint(eager=True))
    merge_rows = []
    for rank in range(1, n_merges + 1):
        syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), "\t ")
        n = F.size("syms")
        pairs = (vocab
                 .select("cnt", syms.alias("syms"))
                 .filter(n >= 2)
                 .select("cnt", F.explode(F.arrays_zip(
                     F.slice("syms", F.lit(1), n - 1).alias("l"),
                     F.slice("syms", F.lit(2), n - 1).alias("r")))
                     .alias("p"))
                 .groupBy(F.col("p.l").alias("l"),
                          F.col("p.r").alias("r"))
                 .agg(F.sum("cnt").alias("pc")))
        # r14: LAZY (was eager — one scheduled job per round): the
        # whole trainer now materializes as one action cascade. `best`
        # has TWO consumers (the next vocab rewrite's broadcast and
        # the output union), so the k_core_rounds first-compute race
        # applies — two stages may compute the 1-row TakeOrdered twice
        # before the cache fills (duplicate pair-agg work, never wrong
        # results); measured a consistent win locally (interleaved
        # min-of-4 2.111 -> 2.047 s, med 2.342 -> 2.152) and rounds
        # are bounded at 6.
        best = (pairs.orderBy(F.desc("pc"), "l", "r").limit(1)
                .localCheckpoint(eager=False))
        if rank < n_merges:
            # the final round's winner is returned but its vocab
            # rewrite would never be consumed — skip the wasted
            # |vocab|-row job + pinned checkpoint (post-round review)
            pat = F.concat(F.lit(" "), F.col("l"), F.lit("\t "),
                           F.col("r"), F.lit("\t"))
            rep = F.concat(F.lit(" "), F.col("l"), F.col("r"),
                           F.lit("\t"))
            vocab = (vocab.crossJoin(F.broadcast(best))
                     .select(F.replace(F.col("s"), pat, rep)
                             .alias("s"), F.col("cnt"))
                     .localCheckpoint(eager=True))
        merge_rows.append(best.select(
            F.lit(rank).cast("bigint").alias("merge_rank"),
            F.col("l").alias("l_sym"),
            F.col("r").alias("r_sym"),
            F.concat("l", "r").alias("merged"),
            F.col("pc").cast("bigint").alias("pair_count")))
    if not merge_rows:  # n_merges=0: empty table, like bpe_train's []
        return df.sparkSession.createDataFrame(
            [], "merge_rank bigint, l_sym string, r_sym string, "
                "merged string, pair_count bigint")
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def merges_df(spark, merges: list[tuple]) -> DataFrame:
    """Merge list → DataFrame (rank, left, right, merged, pair_count)
    — the model artifact as a relation."""
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
                "pair_count bigint")


def bpe_encode_counts(df: DataFrame, key_col: str, text_col: str,
                      merges: list[tuple]) -> DataFrame:
    """Apply a trained merge table to the corpus and count BPE tokens
    per document — the token-budget accounting step between tokenizer
    training and packing.

    The vocabulary trick again, in reverse: merges apply to DISTINCT
    words (the full merge cascade — one nested column-expression fold
    per merge — runs over |vocab| rows), then a plain equi-join maps
    word → token count back onto the corpus occurrences and a groupBy
    closes the per-doc totals. At 100 TB the distinct-word relation is
    millions of rows against a corpus of trillions; AQE picks a
    broadcast when the vocab fits, a shuffle join otherwise — either
    way the merge cascade itself never touches corpus-sized data.
    Docs with no tokens have nothing to encode and drop out (the DSIR
    convention).

    Returns (key, n_words, n_bpe_tokens): ``n_bpe_tokens`` is the
    symbol count after greedy application of every merge in rank
    order — asserted equal to the sequential Python encoder in
    tests/test_tokenizer.py.
    """
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.search import (
        tokens,
    )

    occ = df.select(F.col(key_col), F.explode(tokens(text_col)).alias("w"))
    syms = _initial_symbols(F.col("w"))
    for _rank, left, right, _merged, _pc in merges:
        syms = _apply_merge(syms, left, right)
    enc = occ.select("w").distinct().select(
        "w", F.size(syms).alias("n_sym"))
    return (occ.join(enc, "w")
            .groupBy(key_col)
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_sym").cast("bigint").alias("n_bpe_tokens")))
