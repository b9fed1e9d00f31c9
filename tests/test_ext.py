"""Extension operators: dedup, similarity, text, multimodal, streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
    attach_payload,
    decode_image_stub,
    extract_features,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_table


def _docs_with_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup
        (3, "THE  quick   brown fox jumps over the lazy dog", "en"),  # ws/case dup
        (4, "the quick brown fox jumps over the sleepy dog", "en"),  # near dup
        (5, "completely different text about data engines here", "en"),
        (6, "der schnelle braune fuchs und so weiter und weiter", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup_normalized(spark):
    d = exact_dedup(_docs_with_dups(spark))
    groups = {r.canonical_doc_id: r.n_copies for r in d.collect()}
    assert groups[1] == 3          # 1, 2 and whitespace/case-normalized 3
    assert groups[4] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {(r.key_a, r.key_b): r.jaccard
             for r in ngram_jaccard_pairs(
                 _docs_with_dups(spark), "doc_id", "text", "lang").collect()}
    assert pairs[(1, 2)] == 1.0                     # identical
    assert 0.4 < pairs[(1, 4)] < 1.0                # one-word change
    assert pairs[(1, 5)] == 0.0                     # unrelated
    assert (1, 6) not in pairs                      # cross-lang blocked


def test_minhash_and_simhash_agree_on_dups(spark):
    docs = _docs_with_dups(spark)
    mh = {(r.key_a, r.key_b)
          for r in minhash_candidate_pairs(docs, "doc_id", "text",
                                           jaccard_threshold=0.4).collect()}
    assert (1, 2) in mh and (1, 4) in mh and (1, 5) not in mh
    sh = {(r.key_a, r.key_b)
          for r in simhash_near_pairs(docs, "doc_id", "text",
                                      max_hamming=10).collect()}
    assert (1, 2) in sh                             # identical text: hamming 0


def test_brute_force_topk_exact(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    top = brute_force_topk(emb.filter(F.col("vec_id") != 0), query, k=5)
    rows = top.collect()
    assert len(rows) == 5
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_topk_subset_of_brute(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    cand = emb.filter(F.col("vec_id") != 0)
    brute = {r.vec_id: r.cosine
             for r in brute_force_topk(cand, query, k=500).collect()}
    approx = lsh_topk(cand, query, k=10).collect()
    # every LSH result carries the EXACT cosine (re-rank is exact)
    for r in approx:
        assert r.cosine == brute[r.vec_id]


def test_lsh_multiprobe_recall_floor(spark, sf_dir):
    """Multi-probe (Hamming-1 buckets, the default) must deliver
    usable recall AND strictly beat single-probe, measured against
    exact brute force over 5 query points. Floors sit well under the
    measured values (0.54 multi / 0.18 single at this sf) so hash-seed
    jitter across testdata regenerations can't flake the suite."""
    emb = read_table(spark, sf_dir, "embeddings")
    qids = [r[0] for r in emb.select("vec_id").limit(5).collect()]
    tot = hit_multi = hit_single = 0
    for qid in qids:
        q = emb.filter(F.col("vec_id") == qid)
        cand = emb.filter(F.col("vec_id") != qid)
        exact = {r.vec_id for r in brute_force_topk(cand, q, k=10).collect()}
        multi = {r.vec_id for r in lsh_topk(cand, q, k=10).collect()}
        single = {r.vec_id
                  for r in lsh_topk(cand, q, k=10,
                                    hamming_probes=0).collect()}
        tot += 10
        hit_multi += len(exact & multi)
        hit_single += len(exact & single)
    assert hit_multi / tot >= 0.4, hit_multi / tot
    assert hit_multi > hit_single, (hit_multi, hit_single)


def test_multimodal_stub_and_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], ["doc_id", "text"])
    media = attach_payload(docs, "doc_id", "text")
    feats = extract_features(media, fake=True).collect()
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == len(b"hello world")
    assert len(by_id[1].features) == 8
    assert abs(sum(by_id[1].features) - 1.0) < 1e-3
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx", fake=False)


def test_structured_streaming_matches_batch(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.streaming.windows import (
        run_stream_to_memory,
        stream_events,
        tumbling_agg,
        with_watermark,
    )

    stream = with_watermark(stream_events(spark, sf_dir), delay="1 day")
    run_stream_to_memory(tumbling_agg(stream), "t_stream")
    got = {(str(r.window_start), r.event_type): (r.n_events,
                                                 round(r.sum_value, 4))
           for r in spark.sql("SELECT * FROM t_stream").collect()}
    batch = tumbling_agg(read_table(spark, sf_dir, "events"))
    want = {(str(r.window_start), r.event_type): (r.n_events,
                                                  round(r.sum_value, 4))
            for r in batch.collect()}
    assert got == want and len(want) > 0


def test_minhash_registry_recalls_planted_pairs(spark, sf_dir):
    """The registry's minhash query plants one-token-mutated copies of
    the sampled docs; LSH at threshold 0.3 must recall every planted
    pair (high-Jaccard pairs survive banding with 16 hash tables)."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    docs = read_table(spark, sf_dir, "documents")
    n_sampled = docs.filter((F.col("doc_id") % 10 == 0)
                            & (F.length(F.trim("text")) > 0)).count()
    pairs = REGISTRY["ext_dedup_minhash"].build(spark, sf_dir).collect()
    assert len(pairs) == n_sampled
    assert all(r.key_b == r.key_a + 10_000_000 for r in pairs)


def test_line_dedup_drops_boilerplate_keeps_content(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        line_dedup,
    )
    rows = [(i, f"BANNER\nbody text {i}" + ("\nfooter" if i < 2 else ""))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           line_dedup(df, "doc_id", "text", max_df=5).collect()}
    assert len(out) == 10                       # cardinality preserved
    for i in range(10):
        r = out[i]
        assert "BANNER" not in r.cleaned_text   # df=10 > 5: dropped
        assert f"body text {i}" in r.cleaned_text
        # footer appears in only 2 docs: kept, in original order
        if i < 2:
            assert r.cleaned_text == f"body text {i}\nfooter"
            assert (r.lines_kept, r.lines_dropped) == (2, 1)
        else:
            assert (r.lines_kept, r.lines_dropped) == (1, 1)
    # all-boilerplate doc survives with empty text
    allb = spark.createDataFrame(
        [(i, "BANNER") for i in range(7)], "doc_id bigint, text string")
    got = line_dedup(allb, "doc_id", "text", max_df=5).collect()
    assert len(got) == 7
    assert all(r.cleaned_text == "" and r.lines_kept == 0 for r in got)


def test_minhash_banded_recalls_planted_pairs(spark, sf_dir):
    """The portable seeded-md5 banded MinHash must find the planted
    one-token mutations too: at J ≈ 0.94 (one appended token on a
    ~50-gram doc) the 4x2 banding collision probability is ~1-5e-5,
    and with the FIXED hash family the outcome is deterministic —
    on this fixture every planted pair survives."""
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    docs = read_table(spark, sf_dir, "documents")
    n_sampled = docs.filter((F.col("doc_id") % 10 == 0)
                            & (F.length(F.trim("text")) > 0)).count()
    rows = REGISTRY["ext_dedup_minhash_banded"].build(spark, sf_dir).collect()
    planted = {(r.key_a, r.key_b) for r in rows
               if r.key_b == r.key_a + 10_000_000}
    assert len(planted) == n_sampled
    assert all(r.jaccard >= 0.5 for r in rows)


def test_ivf_full_probe_equals_brute(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        ivf_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    brute = [(r.vec_id, r.cosine) for r in
             brute_force_topk(emb, q, k=10).collect()]
    full_probe = [(r.vec_id, r.cosine) for r in
                  ivf_topk(emb, q, k=10, n_clusters=8, n_probe=8,
                           allow_inline_fit=True).collect()]
    assert full_probe == brute
    # partial probe returns k candidates drawn from the brute ordering
    part = [(r.vec_id, r.cosine) for r in
            ivf_topk(emb, q, k=10, n_clusters=8, n_probe=2,
                     allow_inline_fit=True).collect()]
    assert len(part) == 10
    assert part[0][1] <= brute[0][1] + 1e-9
    # serving-path guard: a missing quantizer must raise, not silently
    # rebuild the index per query
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fit_ivf_quantizer"):
        ivf_topk(emb, q, k=10)


def test_ivf_default_probe_recall_floor(spark, sf_dir):
    """n_probe=4 of 16 clusters must still find most true neighbors
    (measured 0.58 recall@10 on this corpus; floor well below so
    KMeans seed jitter can't flake). One offline fit serves all
    probes — the production shape."""
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        fit_ivf_quantizer,
        ivf_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    model = fit_ivf_quantizer(emb)
    tot = hit = 0
    for qid in [r[0] for r in emb.select("vec_id").limit(5).collect()]:
        q = emb.filter(F.col("vec_id") == qid)
        cand = emb.filter(F.col("vec_id") != qid)
        exact = {r.vec_id for r in brute_force_topk(cand, q, k=10).collect()}
        got = {r.vec_id for r in ivf_topk(cand, q, k=10,
                                          model=model).collect()}
        tot += 10
        hit += len(exact & got)
    assert hit / tot >= 0.4, hit / tot


def test_frame_sample_and_resize(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        frame_sample,
        resize_stub,
    )
    docs = _docs_with_dups(spark)
    media = attach_payload(docs, "doc_id", "text", kind="video")
    frames = frame_sample(media, frame_size=8, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # doc 1's text is 43 bytes -> 6 frames of 8 bytes -> indexes 0,2,4
    assert [r.frame_index for r in sorted(by_id[1],
                                          key=lambda r: r.frame_index)] \
        == [0, 2, 4]
    assert all(len(r.frame_bytes) <= 8 for r in frames)
    # frame content is the payload slice
    f0 = [r for r in by_id[1] if r.frame_index == 0][0]
    assert f0.frame_bytes == b"the quic"

    assert len(resize_stub(b"abc", 4, 4, fake=True)) == 16
    with pytest.raises(NotImplementedError):
        resize_stub(b"abc", 4, 4)


def test_winnow_pairs_planted_recall(spark, sf_dir):
    # every planted 5-char-overwrite mutant must pair with its
    # original (winnowing guarantee: untouched runs >= w+k-1 chars
    # keep shared fingerprints) — non-vacuity check for
    # ext_dedup_winnow_pairs
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    pairs = REGISTRY["ext_dedup_winnow_pairs"].build(spark, sf_dir)
    planted = (pairs
               .filter(F.col("key_b") == F.col("key_a") + 10_000_000)
               .count())
    n_base = (read_table(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 10 == 0).count())
    assert planted == n_base


def test_approx_percentile_tracks_exact(spark, sf_dir):
    # a24's contract (r12 tolerance-anchored form): its inline exact
    # percentiles must EQUAL the hash-green a22 sibling's output, and
    # within_tol — computed Spark-side from the real GK-sketch
    # approx_percentile values — must hold on every group. The sketch
    # accuracy itself is re-asserted directly at the 1%-relative level
    # on p50 (tighter than the contract's 5%) so a sketch regression
    # can't hide behind the tolerance.
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    got = {r.o_orderstatus: r for r in
           REGISTRY["a24_approx_percentile"].build(spark, sf_dir)
           .collect()}
    exact = {r.o_orderstatus: r for r in
             REGISTRY["a22_percentile_disc"].build(spark, sf_dir)
             .collect()}
    assert set(got) == set(exact)
    for k in exact:
        assert got[k].p50 == float(exact[k].p50), k
        assert got[k].within_tol == 1, (k, got[k])
    direct = {r.o_orderstatus: r.a50 for r in
              read_table(spark, sf_dir, "orders")
              .groupBy("o_orderstatus")
              .agg(F.percentile_approx("o_totalprice", 0.50, 10000)
                    .cast("double").alias("a50"))
              .collect()}
    for k in exact:
        assert abs(direct[k] - float(exact[k].p50)) \
            / float(exact[k].p50) < 0.01, k


def test_image_header_decode_roundtrip():
    # real header parsing: every builder's output must decode back to
    # its exact (format, width, height); junk payloads must yield None
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        gif_bytes,
        image_dimensions,
        jpeg_bytes,
        png_bytes,
    )
    cases = [(png_bytes, "png"), (jpeg_bytes, "jpeg"), (gif_bytes, "gif")]
    for build, fmt in cases:
        for w, h in [(1, 1), (640, 480), (65535, 1), (1023, 799)]:
            assert image_dimensions(build(w, h)) == (fmt, w, h), (fmt, w, h)
    assert image_dimensions(None) is None
    assert image_dimensions(b"") is None
    assert image_dimensions(b"not an image at all") is None
    # a JPEG with APPn segments before SOF0 (real-camera shape)
    jpg = jpeg_bytes(321, 123)
    with_app0 = (jpg[:2]
                 + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
                 + jpg[2:])
    assert image_dimensions(with_app0) == ("jpeg", 321, 123)
    # 0xFF fill bytes before a marker are spec-valid (ITU T.81 B.1.1.3)
    with_fill = jpg[:2] + b"\xff\xff\xff" + jpg[2:]
    assert image_dimensions(with_fill) == ("jpeg", 321, 123)


def test_extract_image_meta_spark_roundtrip(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        build_image_payloads,
        extract_image_meta,
    )
    dims = spark.createDataFrame(
        [(0, 100, 50), (1, 2, 3), (2, 999, 777), (3, 64, 64)],
        ["media_id", "width", "height"])
    out = {r.media_id: r for r in
           extract_image_meta(build_image_payloads(dims)).collect()}
    expect = {0: "png", 1: "jpeg", 2: "gif", 3: "png"}
    for mid, w, h in [(0, 100, 50), (1, 2, 3), (2, 999, 777), (3, 64, 64)]:
        r = out[mid]
        assert (r.format, r.width, r.height) == (expect[mid], w, h), r


def test_lang_detect_udf_fallback_matches_heuristic(spark, sf_dir):
    # without langdetect installed the library UDF must be semantically
    # identical to the JVM lang_id() expression (fixture-pinned U4)
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        HAVE_LANGDETECT,
        lang_detect_udf,
        lang_id,
    )
    docs = read_table(spark, sf_dir, "documents")
    both = docs.select(
        F.length(F.trim("text")).alias("n_chars"),
        lang_id(F.col("text")).alias("jvm"),
        lang_detect_udf(F.col("text")).alias("py"))
    if HAVE_LANGDETECT:
        # library path: total coverage (no nulls/errors), and on docs
        # where BOTH detectors should be confident — long text, the
        # heuristic found markers — the two must mostly agree (the
        # reference's langdetect UDF and our marker heuristic are
        # interchangeable on clear-cut text; disagreement is expected
        # only on short/ambiguous docs)
        assert both.filter(F.col("py").isNull()).count() == 0
        confident = both.filter((F.col("n_chars") > 200)
                                & (F.col("jvm") != "und"))
        n = confident.count()
        if n:
            agree = confident.filter(F.col("jvm") == F.col("py")).count()
            assert agree / n >= 0.8, (agree, n)
    else:
        assert both.filter(F.col("jvm") != F.col("py")).count() == 0


def test_simhash_null_text_is_zero(spark):
    # NULL text must fingerprint to 0 (the pre-optimization semantics),
    # not NULL — a NULL band value would silently drop the doc from
    # the banded pair join
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        simhash64,
    )
    df = spark.createDataFrame([(1, None), (2, "some text here")],
                               ["doc_id", "text"])
    rows = {r.doc_id: r.s for r in
            df.select("doc_id", simhash64("text").alias("s")).collect()}
    assert rows[1] == 0
    assert rows[2] != 0


def test_batch_topk_lsh_bounded_by_exact(spark, sf_dir):
    # the LSH-bucketed batch variant re-ranks only within buckets, so
    # it is NOT necessarily a subset of the exact top-k; what must
    # hold: same schema, dense per-query ranks, and no LSH candidate
    # scoring above the exact top-1
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        batch_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = batch_topk(emb, queries, k=5, exclude_self=True).collect()
    lsh = batch_topk(emb, queries, k=5, n_planes=4,
                     exclude_self=True).collect()
    by_query = {}
    for r in lsh:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(lsh) > 0
    for qid, rows in by_query.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)), (qid, ranks)
    # no LSH candidate can score above the true (exact) top-1
    exact_best = {r.query_id: r.cosine for r in exact if r.rank == 1}
    for r in lsh:
        assert r.cosine <= exact_best[r.query_id] + 1e-9


def test_batch_topk_agrees_with_single_query_brute(spark, sf_dir):
    # the batched exact path must produce the same (key, cosine) list
    # as the single-query brute_force_topk for each query in the batch
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        batch_topk,
        brute_force_topk,
    )
    emb = read_table(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    batch = batch_topk(emb, queries, k=5, exclude_self=True).collect()
    by_query = {}
    for r in sorted(batch, key=lambda r: r.rank):
        by_query.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    for qid in [r.query_id for r in queries.collect()]:
        single = brute_force_topk(
            emb.filter(F.col("vec_id") != qid),
            emb.filter(F.col("vec_id") == qid), k=5).collect()
        expected = [(r.vec_id, r.cosine) for r in single]
        assert by_query[qid] == expected, qid


def test_ppjoin_is_lossless_vs_brute_force(spark, sf_dir):
    # prefix filtering must be LOSSLESS: pairs(ppjoin) == pairs from
    # the all-pairs exact Jaccard at the same threshold
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        shingles,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        jaccard_similarity,
        ppjoin_prefix_pairs,
    )
    docs = (read_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 5 == 0).select("doc_id", "text"))
    mutated = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          F.concat("text", F.lit(" zz")).alias("text"))
    corpus = docs.unionByName(mutated)
    pp = {(r.key_a, r.key_b): r.jaccard
          for r in ppjoin_prefix_pairs(corpus, "doc_id", "text").collect()}
    sh = (corpus.select("doc_id", shingles("text").alias("sh"))
          .filter(F.size("sh") > 0))
    a, b = sh.alias("a"), sh.alias("b")
    sim = F.round(jaccard_similarity(F.col("a.sh"), F.col("b.sh")), 6)
    brute = {(r.key_a, r.key_b): r.jaccard for r in
             (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("key_a"),
                      F.col("b.doc_id").alias("key_b"),
                      sim.alias("jaccard"))
              .filter(F.col("jaccard") * 2 >= 1)).collect()}
    assert pp == brute and len(brute) > 0


def test_ppjoin_lossless_at_non_representable_threshold(spark, sf_dir):
    """t = 1/3 has no exact 6dp float form — the rational-threshold
    integer arithmetic (prefix length, length filter, positional
    filter, final inter*den >= num*union test) must stay lossless
    there too, not just at the benign default 1/2."""
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        shingles,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        ppjoin_prefix_pairs,
    )
    docs = (read_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 7 == 0).select("doc_id", "text"))
    mutated = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          F.concat("text", F.lit(" qq rr ss tt"))
                          .alias("text"))
    corpus = docs.unionByName(mutated)
    pp = {(r.key_a, r.key_b)
          for r in ppjoin_prefix_pairs(corpus, "doc_id", "text",
                                       threshold_num=1,
                                       threshold_den=3).collect()}
    sh = (corpus.select("doc_id", shingles("text").alias("sh"))
          .filter(F.size("sh") > 0))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size("a.sh") + F.size("b.sh") - inter
    brute = {(r.key_a, r.key_b) for r in
             (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("key_a"),
                      F.col("b.doc_id").alias("key_b"),
                      inter.alias("i"), union.alias("u"))
              .filter(F.col("i") * 3 >= F.col("u"))).collect()}
    assert pp == brute and len(brute) > 0


def test_wav_header_roundtrip():
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        wav_bytes,
        wav_metadata,
    )
    for rate, ch, bits, n in [(16000, 1, 16, 16000), (44100, 2, 16, 22050),
                              (48000, 2, 24, 1), (8000, 1, 8, 0)]:
        meta = wav_metadata(wav_bytes(rate, ch, bits, n))
        assert meta == (rate, ch, bits, n * 1000 // rate), meta
    assert wav_metadata(None) is None
    assert wav_metadata(b"RIFFxxxxNOPE") is None
    assert wav_metadata(b"not audio") is None
    # an extra chunk before fmt must not break the walk
    import struct
    w = wav_bytes(16000, 1, 16, 100)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = w[:12] + extra + w[12:]
    assert wav_metadata(patched) == (16000, 1, 16, 6)


def test_mp4_header_roundtrip():
    import struct

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.multimodal import (
        mp4_bytes,
        mp4_metadata,
    )
    for ts, dur in [(600, 600), (1000, 123456), (90000, 1), (600, 0)]:
        assert mp4_metadata(mp4_bytes(ts, dur)) == (ts, dur * 1000 // ts)
    assert mp4_metadata(None) is None
    assert mp4_metadata(b"not a video file") is None
    # a free box before moov must not break the walk
    m = mp4_bytes(1000, 5000)
    free = struct.pack(">I", 12) + b"free" + b"zzzz"
    patched = m[:16] + free + m[16:]
    assert mp4_metadata(patched) == (1000, 5000)
    # ISO 14496-12 §4.2 size escapes (real-world large files):
    # size==1 → 64-bit largesize follows the type
    moov = m[16:]                       # the moov box of mp4_bytes
    inner = moov[8:]                    # its mvhd child
    large_moov = (struct.pack(">I", 1) + b"moov"
                  + struct.pack(">Q", 16 + len(inner)) + inner)
    assert mp4_metadata(m[:16] + large_moov) == (1000, 5000)
    # size==0 → box extends to end of the enclosing container
    zero_moov = struct.pack(">I", 0) + b"moov" + inner
    assert mp4_metadata(m[:16] + zero_moov) == (1000, 5000)
    # truncated largesize header is corrupt, not a crash
    assert mp4_metadata(m[:16] + struct.pack(">I", 1) + b"moov") is None


def test_lsh_hamming_radius_honored(spark, sf_dir):
    """hamming_probes is a real Hamming RADIUS (ADVICE r3): radius-2
    probes C(n,1)+C(n,2) extra buckets, so its candidate set must
    contain radius-1's; an unsatisfiable radius raises instead of
    silently clamping."""
    import pytest as _pytest

    from sql_etl_data_warehouse_inside_airbnb_spark.operators.similarity import (
        _probe_masks,
    )

    assert _probe_masks(4, 0) == []
    assert sorted(_probe_masks(4, 1)) == [1, 2, 4, 8]
    r2 = _probe_masks(4, 2)
    assert len(r2) == 4 + 6 and len(set(r2)) == len(r2)
    assert set(_probe_masks(4, 1)) <= set(r2)
    with _pytest.raises(ValueError, match="exceeds n_planes"):
        _probe_masks(4, 5)
    with _pytest.raises(ValueError, match=">= 0"):
        _probe_masks(4, -1)

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    cand = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in brute_force_topk(cand, q, k=10).collect()}
    r1 = {r.vec_id for r in lsh_topk(cand, q, k=10,
                                     hamming_probes=1).collect()}
    r2 = {r.vec_id for r in lsh_topk(cand, q, k=10,
                                     hamming_probes=2).collect()}
    # wider radius can only widen the candidate pool: recall@10 of the
    # radius-2 result is >= radius-1's against the same exact answer
    assert len(exact & r2) >= len(exact & r1)
    with _pytest.raises(ValueError, match="exceeds n_planes"):
        lsh_topk(cand, q, k=10, hamming_probes=9).collect()
