"""Tests for the training-data pipeline operators (dedup / similarity /
text analysis / multimodal plumbing)."""

from pyspark.sql import functions as F

from rassengine_spark.llmops import dedup as DD
from rassengine_spark.llmops import multimodal as MM
from rassengine_spark.llmops import similarity as SIM
from rassengine_spark.llmops import text_analysis as TA


def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en"),  # exact dup of 1
        (3, "quick brown fox jumps over the lazy dog again and again", "en"),      # near dup of 1
        (4, "completely different words about spark shuffles and parquet files", "en"),
        (5, "el zorro marron salta sobre el perro perezoso", "es"),
    ]
    return spark.createDataFrame(rows, "id int, text string, lang string")


def test_exact_dedup(spark):
    d = docs(spark)
    groups = DD.exact_dup_groups(d, "text", "id").collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2 and groups[0]["keeper_id"] == 1
    kept = DD.exact_dedup(d, "text", "id")
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 4, 5]


def test_minhash_lsh_finds_near_dups(spark):
    pairs = DD.minhash_lsh_pairs(docs(spark), "text", "id",
                                 shingle_n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0            # exact dup -> jaccard 1
    assert (1, 3) in got and got[(1, 3)] > 0.5
    assert all(4 not in p and 5 not in p for p in got)


def test_simhash_near_for_near_dups(spark):
    fp = {r["id"]: r["simhash"]
          for r in DD.simhash_fingerprints(docs(spark), "text", "id").collect()}
    assert fp[1] == fp[2]                # identical text -> identical simhash
    ham = bin(fp[1] ^ fp[3]).count("1")
    assert ham <= 4                      # near dup -> small hamming
    far = bin(fp[1] ^ fp[4]).count("1")
    assert far > ham                     # unrelated text is farther


def test_ngram_jaccard_blocks(spark):
    pairs = DD.ngram_jaccard_pairs(docs(spark), "text", "id", "lang",
                                   n=2, threshold=0.3).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in keys and (1, 3) in keys
    # doc 5 is in another block -> never compared
    assert all(5 not in k for k in keys)


def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0], 1),
        (4, [0.95, 0.05, 0.0], 1),
    ]
    return spark.createDataFrame(rows, "vec_id int, v array<double>, label int")


def test_brute_force_topk(spark):
    e = vecs(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "v")
    out = SIM.brute_force_topk(e.filter(F.col("vec_id") > 0), q,
                               "v", "vec_id", "qid", k=2).collect()
    assert [(r["id"], r["rank"]) for r in out] == [(4, 1), (1, 2)]


def test_lsh_bucket_recall_on_close_vectors(spark):
    e = vecs(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "v")
    out = SIM.lsh_bucketed_topk(e.filter(F.col("vec_id") > 0), q, "v",
                                "vec_id", "qid", k=2, bits=2, dim=3).collect()
    ids = [r["id"] for r in out]
    assert 4 in ids or 1 in ids          # close vectors share the bucket
    assert 3 not in ids                  # opposite vector lands elsewhere


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every cell makes IVF exhaustive — must equal brute force."""
    e = vecs(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "v")
    c = e.filter(F.col("vec_id") > 0)
    ivf = SIM.ivf_topk(c, q, "v", "vec_id", "qid", k=2,
                       n_cells=2, n_probe=2).collect()
    bf = SIM.brute_force_topk(c, q, "v", "vec_id", "qid", k=2).collect()
    assert [(r["id"], r["rank"]) for r in ivf] == \
           [(r["id"], r["rank"]) for r in bf]


def test_ivf_plan_builds_fast_at_large_n_cells(spark):
    """Scale guard: centroid assignment must be O(1) plan nodes in n_cells
    (one matrix literal + a transform), not one expression subtree per
    centroid — at a realistic 4k-64k cells the latter dies in plan
    construction/analysis long before any data moves. 2048 cells x 16 dims
    must build AND analyze in seconds."""
    import time
    e = vecs(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "v")
    c = e.filter(F.col("vec_id") > 0)
    cents = [[float((i * 7 + j) % 5 - 2) for j in range(3)]
             for i in range(2048)]
    t0 = time.perf_counter()
    plan = SIM.ivf_topk(c, q, "v", "vec_id", "qid", k=2,
                        n_probe=2, centroids=cents)
    plan.schema               # forces full analysis of the plan
    assert time.perf_counter() - t0 < 30


def test_ivf_probe_prunes_far_cells(spark):
    """With 1 probe the opposite-direction vector's cell is never scored."""
    e = vecs(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "v")
    c = e.filter(F.col("vec_id") > 0)
    cents = [[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]]   # explicit quantizer
    out = SIM.ivf_topk(c, q, "v", "vec_id", "qid", k=3,
                       n_probe=1, centroids=cents).collect()
    ids = [r["id"] for r in out]
    assert set(ids) == {1, 2, 4}         # cell 0 members only
    assert 3 not in ids                  # cell 1 pruned


def test_int8_quantization_roundtrip_bound(spark):
    from rassengine_spark.functions.vector import (dequantize, quantize_int8,
                                                   quantize_scale)
    df = (spark.createDataFrame(
            [(0, [0.5, -1.5, 3.0]), (1, [0.0, 0.0, 0.0])],
            "id int, v array<double>")
          .withColumn("qs", quantize_scale(F.col("v"))))
    df = df.withColumn("q8", quantize_int8(F.col("v"), F.col("qs"))) \
           .withColumn("back", dequantize(F.col("q8"), F.col("qs")))
    rows = {r["id"]: r for r in df.collect()}
    # all quantized values in [-127, 127]; max|x| maps to exactly +-127
    assert all(-127 <= q <= 127 for q in rows[0]["q8"])
    assert rows[0]["q8"][2] == 127
    # reconstruction error bounded by scale/2 per element
    for orig, back in zip([0.5, -1.5, 3.0], rows[0]["back"]):
        assert abs(orig - back) <= rows[0]["qs"] / 2 + 1e-12
    # zero vector: scale 1.0, stays exactly zero
    assert rows[1]["qs"] == 1.0 and rows[1]["back"] == [0.0, 0.0, 0.0]


def test_quantized_topk_matches_bruteforce_ranking(spark):
    v = vecs(spark)
    queries = v.filter(F.col("vec_id") == 0) \
               .select(F.col("vec_id").alias("qid"), F.col("v"))
    corpus = v.filter(F.col("vec_id") > 0)
    exact = SIM.brute_force_topk(corpus, queries, "v", "vec_id", "qid", k=3)
    quant = SIM.quantized_topk(corpus, queries, "v", "vec_id", "qid", k=3)
    # well-separated vectors: int8 preserves the exact ranking
    assert [r["id"] for r in exact.orderBy("rank").collect()] == \
           [r["id"] for r in quant.orderBy("rank").collect()]
    rec = SIM.recall_at_k(quant, exact).collect()
    assert len(rec) == 1 and rec[0]["recall"] == 1.0


def test_recall_at_k_counts_misses(spark):
    exact = spark.createDataFrame(
        [(0, i) for i in range(5)], "query_id int, id int")
    approx = spark.createDataFrame(           # missing id=4, has stray id=9
        [(0, 0), (0, 1), (0, 2), (0, 3), (0, 9)], "query_id int, id int")
    r = SIM.recall_at_k(approx, exact).collect()[0]
    assert (r["n_exact"], r["n_matched"], r["recall"]) == (5, 4, 0.8)


def test_embedding_near_pairs(spark):
    out = DD.embedding_near_pairs_topn(vecs(spark), "v", "vec_id", "label",
                                       top_n=2).collect()
    assert (out[0]["id_a"], out[0]["id_b"]) == (0, 1)  # most similar in block


def test_scale_safe_defaults_round5(spark):
    # VERDICT r4 #2: the 100 TB-safe forms are the API defaults. The
    # posting cap defaults ON for n-gram Jaccard; the gram-matrix ops
    # default to md5-IVF cell refinement that SELF-DISABLES below
    # max_block rows (small frames stay exact) and only ever removes
    # cross-cell pairs when it engages.
    import inspect
    assert inspect.signature(DD.ngram_jaccard_pairs) \
                  .parameters["max_postings"].default == 20
    v = vecs(spark)
    key = lambda rows: [(r.id_a, r.id_b, r.cos) for r in rows]   # noqa: E731
    exact = DD.embedding_near_pairs_topn(v, "v", "vec_id", "label",
                                         top_n=10, max_block=None).collect()
    default = DD.embedding_near_pairs_topn(v, "v", "vec_id", "label",
                                           top_n=10).collect()
    assert key(default) == key(exact)        # n=5 << 4096: self-disabled
    celled = DD.embedding_near_pairs_topn(v, "v", "vec_id", "label",
                                          top_n=10, max_block=2).collect()
    assert set(key(celled)) <= set(key(exact))
    # semantic_prune: same self-disable contract, block col preserved
    p_exact = {r.id: (r.kept, r.blk) for r in
               DD.semantic_prune(v, "v", "vec_id", "label", threshold=0.8,
                                 max_block=None).collect()}
    p_default = {r.id: (r.kept, r.blk) for r in
                 DD.semantic_prune(v, "v", "vec_id", "label",
                                   threshold=0.8).collect()}
    assert p_default == p_exact


def test_semantic_prune_keep_min_id_not_transitive(spark):
    # chain: 0~1 and 1~2 similar, 0!~2 — the rule drops any row with a
    # similar SMALLER id regardless of that row's own fate: 1 drops
    # (dup of 0) and 2 ALSO drops (dup of dropped 1) — the conservative
    # superset of greedy pruning the docstring spells out. Orthogonal 4
    # in the same block and singleton block "y" are kept.
    df = spark.createDataFrame(
        [(0, "x", [1.0, 0.0]),
         (1, "x", [0.9, 0.45]),       # cos(0,1)=.895, cos(1,2)=.893
         (2, "x", [0.45, 0.9]),       # cos(0,2)=.447
         (4, "x", [-1.0, 0.0]),       # cos vs 0/1/2 all <= 0
         (3, "y", [1.0, 0.0])],
        "vec_id long, label string, v array<double>")
    got = {r.id: r.kept for r in
           DD.semantic_prune(df, "v", "vec_id", "label",
                             threshold=0.8).collect()}
    assert got == {0: True, 1: False, 2: False, 4: True, 3: True}


def test_text_analysis_columns(spark):
    d = docs(spark)
    lang = {r["id"]: r["lang_pred"] for r in d.select(
        F.col("id"), TA.lang_id_expr(F.col("text")).alias("lang_pred")).collect()}
    assert lang[1] == "en" and lang[5] == "es"

    q = {r["id"]: r for r in TA.quality_features(d, "text", "id").collect()}
    assert q[1]["n_tokens"] == 12
    assert q[1]["quality"] == 1.0
    tc = {r["id"]: r for r in TA.token_counts(d, "text", "id").collect()}
    assert tc[1]["ws_tokens"] == 12
    fp = {r["id"]: r["fingerprint"]
          for r in TA.fingerprints(d, "text", "id").collect()}
    assert fp[1] == fp[2] and fp[1] != fp[4]


def test_multimodal_plumbing(spark):
    media = MM.to_media_table(docs(spark), "id", "text")
    feats = MM.decode_features(media).collect()
    assert len(feats) == 5
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["1"]["n_bytes"] == by_id["2"]["n_bytes"]
    # deterministic fake decode: same bytes -> same features
    assert (by_id["1"]["width"], by_id["1"]["height"]) == \
           (by_id["2"]["width"], by_id["2"]["height"])
    assert all(r["width"] >= 16 for r in feats)


def test_multimodal_resize_stub(spark):
    media = MM.to_media_table(docs(spark), "id", "text")
    out = {r["media_id"]: r
           for r in MM.resize_images(media, out_w=8, out_h=8).collect()}
    assert len(out) == 5
    for r in out.values():
        assert (r["out_w"], r["out_h"]) == (8, 8)
        assert r["n_bytes_out"] <= 64
        assert len(r["content"]) == r["n_bytes_out"]


def test_multimodal_frame_sample(spark):
    import hashlib
    media = MM.to_media_table(docs(spark), "id", "text", media_type="video")
    sizes = {r["media_id"]: r["n_bytes"] for r in media.collect()}
    frames = MM.sample_frames(media, frame_ms=40, max_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fs in by_media.items():
        n = 1 + sizes[mid] % 4
        assert sorted(f["frame_idx"] for f in fs) == list(range(n))
        for f in fs:
            assert f["ts_ms"] == f["frame_idx"] * 40
            assert f["frame_sha"] == hashlib.md5(
                f"{mid}:{f['frame_idx']}".encode()).hexdigest()
    # strided slices partition the blob: total frame bytes == blob bytes
    for mid, fs in by_media.items():
        assert sum(len(f["frame_bytes"]) for f in fs) == sizes[mid]


def test_minhash_bucket_cap_drops_boilerplate(spark):
    from rassengine_spark.llmops.dedup import minhash_lsh_pairs
    # 8 identical boilerplate docs (collide in every band bucket) + one
    # true near-dup pair of a distinct text
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    distinct = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau")
    rows = [(i, boiler) for i in range(8)]
    rows += [(100, distinct), (101, distinct + " extra")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    full = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.3)
    capped = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.3,
                               max_bucket_size=4)
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # uncapped finds all 28 boilerplate pairs + the true pair
    assert (100, 101) in full_pairs and len(full_pairs) == 29
    # cap drops the oversized boilerplate buckets, keeps the true pair
    assert capped_pairs == {(100, 101)}


def test_ngram_posting_cap_bounds_boilerplate_work(spark):
    # 6 docs sharing one boilerplate bigram everywhere + a true near-dup
    # pair with private overlap; cap = 4 drops the boilerplate postings
    boiler = "terms apply " * 5            # every bigram occurs in 6 docs
    rows = [(i, boiler + f"unique{i} filler{i}") for i in range(6)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    df = (spark.createDataFrame(rows, "id int, text string")
               .withColumn("lang", F.lit("en")))
    full = DD.ngram_jaccard_pairs(df, "text", "id", "lang",
                                  n=2, threshold=0.1)
    capped = DD.ngram_jaccard_pairs(df, "text", "id", "lang",
                                    n=2, threshold=0.1, max_postings=4)
    full_pairs = {(r.id_a, r.id_b): r.jaccard for r in full.collect()}
    capped_pairs = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    # uncapped sees every boilerplate pair and the true pair
    assert (100, 101) in full_pairs
    assert sum(1 for a, b in full_pairs if a < 100) == 15
    # capped keeps the true pair at its exact jaccard, drops boilerplate
    assert (100, 101) in capped_pairs
    assert capped_pairs[(100, 101)] == full_pairs[(100, 101)]
    assert all(a >= 100 for a, b in capped_pairs)
    # capped jaccards are lower bounds of the exact values
    assert all(capped_pairs[k] <= full_pairs[k] for k in capped_pairs)


def test_datacard_rollup_grains_and_dup_rate(spark):
    from rassengine_spark.llmops.datacard import datacard
    rows = [(1, "a b c", "en", "s1"), (2, "a b c", "en", "s2"),
            (3, "x y", "en", "s1"), (4, "p q r s", "es", "s1")]
    df = spark.createDataFrame(rows, "id int, text string, lang string, "
                                     "source string")
    out = {(r["lang"], r["source"]): r
           for r in datacard(df, "text", ["lang", "source"]).collect()}
    # finest grain: (en, s1) has 2 docs, 1 of them a global exact dup
    assert out[("en", "s1")]["n_docs"] == 2
    assert out[("en", "s1")]["n_dup_docs"] == 1
    assert out[("en", "s1")]["tot_tokens"] == 5
    # lang margin: en = 3 docs, 2 dup members, 8 tokens
    en = out[("en", None)]
    assert (en["gid"], en["n_docs"], en["n_dup_docs"],
            en["tot_tokens"]) == (1, 3, 2, 8)
    # corpus total
    tot = out[(None, None)]
    assert (tot["gid"], tot["n_docs"], tot["tot_tokens"]) == (3, 4, 12)
    assert tot["avg_tokens"] == 3.0


# ---------------------------------------------------------------- decontam
def test_decontam_overlap_fractions(spark):
    from rassengine_spark.llmops.decontam import flag_contaminated
    train = spark.createDataFrame(
        [(1, "a b c d e f g h"),           # grams of this text are "in train"
         (2, "z y x w v u t s")],
        "doc_id int, text string")
    ev = spark.createDataFrame(
        [(10, "a b c d e f g h"),          # fully contained -> frac 1.0
         (11, "a b c d q q q q"),          # 2 of 5 distinct trigrams match
         (12, "m n o p q r s t")],         # nothing matches
        "doc_id int, text string")
    got = {r.doc_id: r for r in
           flag_contaminated(ev, train, "text", "doc_id",
                             n=3, threshold=0.9).collect()}
    assert got[10].n_grams == 6 and got[10].n_matched == 6
    assert got[10].overlap_frac == 1.0 and got[10].contaminated
    assert got[11].n_grams == 5 and got[11].n_matched == 2
    assert not got[11].contaminated
    assert got[12].n_matched == 0 and not got[12].contaminated


def test_decontam_short_text_whole_shingle(spark):
    from rassengine_spark.llmops.decontam import ngram_overlap
    # texts shorter than n collapse to one whole-text shingle on both sides
    train = spark.createDataFrame([(1, "tiny doc")], "doc_id int, text string")
    ev = spark.createDataFrame([(10, "tiny doc"), (11, "other doc")],
                               "doc_id int, text string")
    got = {r.doc_id: r for r in
           ngram_overlap(ev, train, "text", "doc_id", n=8).collect()}
    assert got[10].n_grams == 1 and got[10].n_matched == 1
    assert got[11].n_grams == 1 and got[11].n_matched == 0


def test_contamination_report_rollup_grains(spark):
    """ROLLUP report: finest rows sum to the suite subtotal and the
    corpus total; pooled matched_frac divides the exact sums; macro
    avg_overlap is the half-up integer-micro mean of per-doc fractions."""
    from rassengine_spark.llmops.decontam import contamination_report
    train = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id int, text string")
    ev = spark.createDataFrame(
        [(10, "a b c d e f g h", "s0", "en"),   # frac 1.0 (6/6)
         (11, "a b c d q q q q", "s0", "de"),   # 2/5
         (12, "m n o p q r s t", "s1", "en")],  # 0/6
        "doc_id int, text string, suite string, lang string")
    rows = contamination_report(ev, train, "text", "doc_id",
                                ["suite", "lang"], n=3,
                                threshold=0.9).collect()
    by = {(r.suite, r.lang, r.gid): r for r in rows}
    assert len(rows) == 6  # 3 finest + 2 suite subtotals + 1 total
    f = by[("s0", "de", 0)]
    assert (f.n_docs, f.n_contaminated, f.tot_grams, f.tot_matched) \
        == (1, 0, 5, 2)
    assert f.matched_frac == 0.4 and f.avg_overlap == 0.4
    sub = by[("s0", None, 1)]
    assert (sub.n_docs, sub.n_contaminated, sub.tot_grams,
            sub.tot_matched) == (2, 1, 11, 8)
    assert sub.matched_frac == round(8 / 11, 6)
    # macro mean of micro units: (1000000 + 400000 + 1) // 2 -> half-up
    assert sub.avg_overlap == 0.7
    tot = by[(None, None, 3)]
    assert (tot.n_docs, tot.n_contaminated, tot.tot_grams,
            tot.tot_matched) == (3, 1, 17, 8)
    assert tot.avg_overlap == round((1.0 + 0.4 + 0.0) / 3 + 1e-12, 6)


# ---------------------------------------------------------------- repetition
def test_repetition_features_hand_computed(spark):
    from rassengine_spark.llmops.text_analysis import repetition_features
    df = spark.createDataFrame(
        [(1, "a a a b"),            # words 4, distinct 2; run 3
         (2, "x y x y x y"),        # bigrams: xy,yx,xy,yx,xy -> top 3/5
         (3, "unique words only here"),
         (4, "solo")],              # < n words -> no grams
        "doc_id int, text string")
    got = {r.id: r for r in
           repetition_features(df, "text", "doc_id", n=2).collect()}
    r1 = got[1]
    assert r1.n_words == 4 and r1.max_word_run == 3
    assert r1.dup_word_frac == 0.5
    # bigrams of doc1: "a a","a a","a b" -> top 2/3, distinct 2/3
    assert r1.top_ngram_frac == round(2 / 3, 6)
    assert r1.dup_ngram_frac == round(1 - 2 / 3, 6)
    r2 = got[2]
    assert r2.max_word_run == 1 and r2.top_ngram_frac == 0.6
    assert r2.dup_ngram_frac == round(1 - 2 / 5, 6)
    r3 = got[3]
    assert r3.dup_word_frac == 0.0 and r3.max_word_run == 1
    assert r3.top_ngram_frac == round(1 / 3, 6) and r3.dup_ngram_frac == 0.0
    r4 = got[4]
    assert r4.n_words == 1 and r4.max_word_run == 1
    assert r4.top_ngram_frac == 0.0 and r4.dup_ngram_frac == 0.0


def test_repetition_fast_matches_expression_form(spark):
    """The Arrow-batched integer-stats pass must be bit-identical to the
    explode+aggregate expression form, including null/empty/short texts."""
    from rassengine_spark.llmops.text_analysis import (
        repetition_features, repetition_features_fast)
    rows = [("1", "a a a b"), ("2", "x y x y x y"), ("3", "solo"),
            ("4", ""), ("5", None), ("6", "  tab\tsep  words\nhere  "),
            ("7", "w " * 50 + "w")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    slow = sorted(map(str, repetition_features(
        df, "text", "doc_id", n=2).collect()))
    fast = sorted(map(str, repetition_features_fast(
        df, "text", "doc_id", n=2).collect()))
    assert fast == slow


def test_decontam_fast_matches_expression_form(spark):
    """Arrow gram-hash pass == explode(word_shingles)+hash60 expression
    form, including short-text whole-shingle fallback and empty text."""
    from rassengine_spark.llmops.decontam import (ngram_overlap,
                                                  ngram_overlap_fast)
    ev = spark.createDataFrame(
        [("e1", "alpha beta gamma delta epsilon zeta"),
         ("e2", "tiny"), ("e3", ""), ("e4", "alpha beta gamma new words x")],
        "doc_id string, text string")
    tr = spark.createDataFrame(
        [("t1", "alpha beta gamma delta epsilon zeta eta theta"),
         ("t2", "tiny")],
        "doc_id string, text string")
    slow = sorted(map(str, ngram_overlap(ev, tr, "text", "doc_id",
                                         n=3).collect()))
    fast = sorted(map(str, ngram_overlap_fast(ev, tr, "text", "doc_id",
                                              n=3).collect()))
    assert fast == slow


def test_quality_fast_matches_expression_form(spark):
    rows = [(1, "The quick brown fox, it is on the mat!!!"),
            (2, ""),
            (3, None),
            (4, "x"),
            (5, "word " * 30),
            (6, "!!! ??? ;;; :::"),
            (7, "Tab\tand\nnewline   spacing a an it as on at")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    slow = {r["id"]: r for r in
            TA.quality_features(df, "text", "doc_id").collect()}
    fast = {r["id"]: r for r in
            TA.quality_features_fast(df, "text", "doc_id").collect()}
    assert set(slow) == set(fast)
    for k in slow:
        assert tuple(slow[k]) == tuple(fast[k]), (k, slow[k], fast[k])


def test_langid_fast_matches_expression_form(spark):
    rows = [(1, "the quick brown fox and the dog"),
            (2, "el zorro y el perro en la casa"),
            (3, "der hund und die katze ist da"),
            (4, "le chat et les chiens en ville"),
            (5, "xyzzy qwerty plugh"),
            (6, None),
            (7, ""),
            (8, "de la the und el le")]       # cross-language tie material
    df = spark.createDataFrame(rows, "doc_id int, text string")
    slow = {r["id"]: r["lang_pred"] for r in df.select(
        F.col("doc_id").alias("id"),
        TA.lang_id_expr(F.col("text")).alias("lang_pred")).collect()}
    fast = {r["id"]: r["lang_pred"]
            for r in TA.lang_id_fast(df, "text", "doc_id").collect()}
    assert slow == fast


def test_audio_features_pcm16_real_decode(spark):
    import math
    import struct
    sr = 16000
    # 100 Hz sine, amplitude 10000, 0.1 s -> rms ~ 10000/sqrt(2)
    n = sr // 10
    samples = [int(10000 * math.sin(2 * math.pi * 100 * i / sr))
               for i in range(n)]
    pcm = struct.pack(f"<{n}h", *samples)
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(pcm), len(pcm), "x"),
         ("a2", "audio", bytearray(b"odd"), 3, "y")],
        "media_id string, media_type string, content binary, "
        "n_bytes long, sha256 string")
    rows = {r["media_id"]: r
            for r in MM.audio_features_pcm16(media, sr).collect()}
    a1 = rows["a1"]
    assert a1["n_samples"] == n and a1["duration_ms"] == 100
    assert abs(a1["rms"] - 10000 / math.sqrt(2)) < 60
    assert a1["peak"] <= 10000
    # 100 Hz for 0.1 s -> ~20 zero crossings
    assert 18 <= a1["zero_crossings"] <= 22
    assert a1["decode_error"] is None
    assert rows["a2"]["decode_error"] == "not 16-bit PCM"
    assert rows["a2"]["rms"] is None


def _ppm(w, h, rgb):
    header = b"P6\n%d %d\n255\n" % (w, h)
    return header + bytes(rgb) * (w * h)


def test_image_features_and_resize_ppm(spark):
    blob = _ppm(8, 4, (10, 20, 30))
    media = spark.createDataFrame(
        [("i1", "image", bytearray(blob), len(blob), "x"),
         ("i2", "image", bytearray(b"JPEGnope"), 8, "y")],
        "media_id string, media_type string, content binary, "
        "n_bytes long, sha256 string")
    feats = {r["media_id"]: r
             for r in MM.image_features_ppm(media).collect()}
    assert (feats["i1"]["width"], feats["i1"]["height"]) == (8, 4)
    assert (feats["i1"]["mean_r"], feats["i1"]["mean_g"],
            feats["i1"]["mean_b"]) == (10.0, 20.0, 30.0)
    assert feats["i2"]["decode_error"] == "not P6"

    resized = {r["media_id"]: r
               for r in MM.resize_images_ppm(media, 4, 2).collect()}
    out = bytes(resized["i1"]["content"])
    assert out.startswith(b"P6\n4 2\n255\n")
    # uniform image stays uniform after nearest-neighbor resize
    assert out[len(b"P6\n4 2\n255\n"):] == bytes((10, 20, 30)) * 8
    assert resized["i2"]["content"] is None


def test_audio_features_wav_container(spark):
    import math
    import struct
    sr, n = 8000, 800
    samples = [int(9000 * math.sin(2 * math.pi * 50 * i / sr))
               for i in range(n)]
    pcm = struct.pack(f"<{n}h", *samples)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    media = spark.createDataFrame(
        [("w1", "audio", bytearray(wav), len(wav), "x"),
         ("w2", "audio", bytearray(b"RIFFxxxxNOPE"), 12, "y")],
        "media_id string, media_type string, content binary, "
        "n_bytes long, sha256 string")
    rows = {r["media_id"]: r
            for r in MM.audio_features_wav(media).collect()}
    w1 = rows["w1"]
    assert w1["n_samples"] == n
    assert w1["duration_ms"] == 100           # 800 samples @ 8 kHz
    assert abs(w1["rms"] - 9000 / math.sqrt(2)) < 60
    assert w1["decode_error"] is None
    assert rows["w2"]["decode_error"] == "not RIFF/WAVE"


def test_incremental_dedup_against_signature_store(spark, tmp_path):
    """New-batch near-dups must be found against the persisted signature
    store WITHOUT touching historical text, and the estimate must agree
    with the store-frame (non-persisted) path bit-for-bit."""
    hist = docs(spark)
    new = spark.createDataFrame(
        [(101, "quick brown fox jumps over the lazy dog again and again"),
         (102, "totally novel content that matches nothing at all here")],
        "id int, text string")
    live = DD.incremental_minhash_pairs(
        new, DD.minhash_store_frame(hist, "text", "id"), "text", "id",
        threshold=0.5).collect()
    path = str(tmp_path / "mhstore")
    DD.save_minhash_store(hist, "text", "id", path)
    stored = DD.incremental_minhash_pairs(
        new, spark.read.parquet(path), "text", "id",
        threshold=0.5).collect()
    assert sorted(map(tuple, stored)) == sorted(map(tuple, live))
    found = {(r.id_old, r.id_new) for r in stored}
    assert (1, 101) in found and (2, 101) in found   # near-dups of 1/2
    assert all(nid != 102 for _, nid in found)       # novel doc is clean


def test_pq_encode_shape_and_determinism(spark):
    from rassengine_spark.llmops import pq as PQ
    rows = [(i, [float((i * 5 + j * 3) % 13 - 6) for j in range(8)])
            for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cbs = PQ.pq_codebooks(e, "v", "vec_id", m=4, n_codes=8)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    assert all(len(c) == 2 for cb in cbs for c in cb)   # 8 dims / 4 books
    enc = {r.id: r.codes for r in
           PQ.pq_encode(e, "v", "vec_id", cbs).collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c)
               for c in enc.values())
    # identical vectors -> identical codes; second run identical
    again = {r.id: r.codes for r in
             PQ.pq_encode(e, "v", "vec_id", cbs).collect()}
    assert enc == again


def test_pq_adc_recall_vs_exact_dot(spark):
    """ADC top-k over clustered vectors must recover most of the exact
    dot-product top-k (the quality bar for a 64x-compressed tier)."""
    import hashlib

    from rassengine_spark.llmops import pq as PQ

    def h(s, lo=-1.0, hi=1.0):
        v = int(hashlib.md5(s.encode()).hexdigest()[:12], 16) / float(1 << 48)
        return lo + (hi - lo) * v

    dim, k = 16, 5
    rows = []
    for i in range(120):
        c = i % 4
        rows.append((i, [3.0 * h(f"c{c}/{j}") + 0.2 * h(f"p{i}/{j}")
                         for j in range(dim)]))
    e = spark.createDataFrame(rows, "vec_id int, v array<double>")
    qs = spark.createDataFrame(
        [(100 + c, [3.0 * h(f"c{c}/{j}") for j in range(dim)])
         for c in range(4)], "qid int, v array<double>")
    corpus = e
    approx = PQ.pq_adc_topk(corpus, qs, "v", "vec_id", "qid", k=k,
                            m=4, n_codes=16).collect()
    # PQ quantizes away the small in-cluster noise, so exact WITHIN-cluster
    # rank order is not preserved — but every retrieved neighbor must come
    # from the query's cluster (id % 4 == query cluster), and each query
    # must return a full k
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.id)
    assert set(by_q) == {100, 101, 102, 103}
    for qid, ids in by_q.items():
        assert len(ids) == k
        assert all(i % 4 == qid - 100 for i in ids), (qid, ids)


def test_ivfpq_full_probe_equals_pq_adc(spark):
    """Probing every cell makes IVF+PQ degenerate to plain PQ-ADC — same
    codebooks, same scores, bit-for-bit."""
    from rassengine_spark.llmops import pq as PQ
    rows = [(i, [float((i * 5 + j * 3) % 13 - 6) for j in range(8)])
            for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id int, v array<double>")
    qs = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), "v")
    c = e.filter(F.col("vec_id") >= 2)
    full = PQ.ivfpq_topk(c, qs, "v", "vec_id", "qid", k=3,
                         n_cells=4, n_probe=4, m=4, n_codes=8).collect()
    plain = PQ.pq_adc_topk(c, qs, "v", "vec_id", "qid", k=3,
                           m=4, n_codes=8).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, plain))


def test_ivfpq_probe_prunes_cells(spark):
    """n_probe=1 with hemisphere centroids must only return candidates
    from the query's hemisphere cell."""
    from rassengine_spark.llmops import pq as PQ
    rows = ([(i, [1.0 + 0.01 * i] + [0.05 * ((i + j) % 3) for j in range(7)])
             for i in range(1, 11)]
            + [(i, [-1.0 - 0.01 * i] + [0.05 * ((i + j) % 3)
                                        for j in range(7)])
               for i in range(11, 21)])
    c = spark.createDataFrame(rows, "vec_id int, v array<double>")
    qs = spark.createDataFrame([(100, [1.0] + [0.0] * 7)],
                               "qid int, v array<double>")
    cents = [[1.0] + [0.0] * 7, [-1.0] + [0.0] * 7]
    out = PQ.ivfpq_topk(c, qs, "v", "vec_id", "qid", k=5,
                        n_probe=1, m=4, n_codes=8,
                        centroids=cents).collect()
    assert len(out) == 5
    assert all(r.id <= 10 for r in out), [r.id for r in out]


def test_gopher_flags_rules(spark):
    long_ok = " ".join(f"word{i%7} the and for that with this from"
                       .split()[i % 8] for i in range(80))
    rows = [
        (1, long_ok),                                     # passes all rules
        (2, "short text"),                                # too few words
        (3, "\n".join("- item %d here" % i for i in range(20))),  # bullets
        (4, " ".join("a" for _ in range(60))),            # mean word len < 3
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in TA.gopher_flags(df, "text", "id").collect()}
    assert out[1].keep
    assert out[2].flag_word_count and not out[2].keep
    assert out[3].flag_bullet_lines and not out[3].keep
    assert out[4].flag_mean_word_len and not out[4].keep


def test_ivfpq_residual_refines_within_cell(spark):
    """Residual codes bound quantization error by the CELL radius: on
    clustered data the residual tier must (a) only return candidates
    from the query's hemisphere under 1 probe, and (b) place a corpus
    vector nearly identical to the query at rank 1 — raw-vector PQ at
    the same tiny codebook cannot be relied on for that."""
    from rassengine_spark.llmops import pq as PQ
    rows = ([(i, [1.0 + 0.01 * i] + [0.05 * ((i + j) % 3)
                                     for j in range(7)])
             for i in range(1, 11)]
            + [(i, [-1.0 - 0.01 * i] + [0.05 * ((i + j) % 3)
                                        for j in range(7)])
               for i in range(11, 21)])
    c = spark.createDataFrame(rows, "vec_id int, v array<double>")
    # query == vector 5's coordinates exactly
    qs = spark.createDataFrame([(100, rows[4][1])],
                               "qid int, v array<double>")
    cents = [[1.0] + [0.0] * 7, [-1.0] + [0.0] * 7]
    out = PQ.ivfpq_residual_topk(c, qs, "v", "vec_id", "qid", k=5,
                                 n_probe=1, m=4, n_codes=10,
                                 centroids=cents).collect()
    assert len(out) == 5
    assert all(r.id <= 10 for r in out), [r.id for r in out]
    assert out[0].rank == 1


def test_line_dedup_semantics(spark):
    """C4-style line dedup: repeated lines drop except the FIRST corpus
    occurrence ((id, pos) order), blank lines are exempt everywhere, and
    docs reassemble in original line order."""
    from rassengine_spark.llmops.text_analysis import line_dedup
    docs = spark.createDataFrame(
        [(1, "HEADER\nunique one\n\nHEADER"),
         (2, "HEADER\nunique two"),
         (3, "header \nALSO UNIQUE")],      # normalizes equal to HEADER
        "doc_id long, text string")
    out = {r.id: r for r in
           line_dedup(docs, "text", "doc_id").collect()}
    # doc 1 holds the first occurrence (pos 0); its SECOND header drops,
    # the blank line survives
    assert out[1].text == "HEADER\nunique one\n"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 1)
    # later docs lose their header entirely (original casing immaterial)
    assert out[2].text == "unique two"
    assert out[3].text == "ALSO UNIQUE"
    assert out[3].n_dropped == 1


def test_line_dedup_all_dropped_doc(spark):
    from rassengine_spark.llmops.text_analysis import line_dedup
    docs = spark.createDataFrame(
        [(1, "dup"), (2, "dup"), (3, "dup")], "doc_id long, text string")
    out = {r.id: r for r in
           line_dedup(docs, "text", "doc_id").collect()}
    assert out[1].text == "dup" and out[1].n_kept == 1
    assert out[2].text == "" and out[2].n_kept == 0
    assert out[3].n_dropped == 1


def test_unicode_clean_rules(spark):
    """NFC composes decomposed sequences; CRLF/CR become LF; zero-width
    and C0 controls vanish while tab/newline survive."""
    from rassengine_spark.llmops.text_analysis import unicode_clean
    docs = spark.createDataFrame(
        [(1, "Cafe\u0301 ok"),            # decomposed -> composed
         (2, "a\r\nb\rc"),               # CRLF + bare CR -> LF
         (3, "z\u200bw\ufeff!\x07\ttab")],  # zero-width/BOM/BEL out, tab in
        "doc_id long, text string")
    out = {r.id: r for r in unicode_clean(docs, "text", "doc_id").collect()}
    assert out[1].clean == "Café ok"
    assert (out[1].n_chars_before, out[1].n_chars_after) == (8, 7)
    assert out[2].clean == "a\nb\nc"
    assert out[3].clean == "zw!\ttab"


def test_line_dedup_paragraph_variant(spark):
    """sep='\\n\\n' dedups whole repeated paragraphs while lines inside
    unique paragraphs survive untouched."""
    from rassengine_spark.llmops.text_analysis import line_dedup
    boiler = "Subscribe to our newsletter!\nClick here."
    docs = spark.createDataFrame(
        [(1, boiler + "\n\nunique article one"),
         (2, boiler + "\n\nunique article two"),
         (3, "standalone piece\n\n" + boiler)],
        "doc_id long, text string")
    out = {r.id: r for r in
           line_dedup(docs, "text", "doc_id", sep="\n\n").collect()}
    assert out[1].text == boiler + "\n\nunique article one"
    assert out[2].text == "unique article two"
    assert out[3].text == "standalone piece"
    assert out[2].n_dropped == 1 and out[3].n_dropped == 1


def test_knn_graph_blocks_mutual(spark):
    """Top-k edges per row within blocks; the mutual filter drops
    one-way edges (2's nearest is 1, but 0 and 1 prefer each other)."""
    df = spark.createDataFrame(
        [(0, "x", [1.0, 0.0]),
         (1, "x", [0.95, 0.05]),
         (2, "x", [0.5, 0.8]),
         (3, "y", [1.0, 0.0])],          # other block: never an edge
        "vec_id long, label string, v array<double>")
    e = {(r.src, r.dst): r.rank
         for r in SIM.knn_graph_blocks(df, "v", "vec_id", "label",
                                       k=1).collect()}
    assert e == {(0, 1): 1, (1, 0): 1, (2, 1): 1}
    m = {(r.src, r.dst)
         for r in SIM.knn_graph_blocks(df, "v", "vec_id", "label",
                                       k=1, mutual=True).collect()}
    assert m == {(0, 1), (1, 0)}         # 2's one-way edge dropped


def test_gram_vocab_store_roundtrip_append_and_meta(spark, tmp_path):
    """Persisted vocabulary tier: store probes equal the one-shot
    overlap; append folds only NOVEL grams and never rewrites history
    files; repeated appends are no-ops; meta pins n."""
    import os

    from rassengine_spark.llmops.decontam import (append_gram_vocab,
                                                  ngram_overlap,
                                                  ngram_overlap_from_store,
                                                  save_gram_vocab)
    train = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "z y x w v u"), (3, "a b c q r s")],
        "doc_id int, text string")
    ev = spark.createDataFrame(
        [(10, "a b c d e f"), (11, "a b c n o p"), (12, "m n o p q t")],
        "doc_id int, text string")
    path = str(tmp_path / "vocab")
    save_gram_vocab(train.filter("doc_id <= 2"), "text", path, n=3)
    append_gram_vocab(train.filter("doc_id = 3"), "text", path)

    def _snap(p):
        out = {}
        for dp, _, names in os.walk(p):
            for fn in names:
                fp = os.path.join(dp, fn)
                st = os.stat(fp)
                out[fp] = (st.st_mtime_ns, st.st_size)
        return out

    before = {p: s for p, s in _snap(path).items()
              if p.endswith(".parquet")}
    stored = {(r.doc_id, r.n_grams, r.n_matched, r.overlap_frac)
              for r in ngram_overlap_from_store(spark, ev, "text",
                                                "doc_id", path).collect()}
    oneshot = {(r.doc_id, r.n_grams, r.n_matched, r.overlap_frac)
               for r in ngram_overlap(ev, train, "text", "doc_id",
                                      n=3).collect()}
    assert stored == oneshot

    # idempotent re-append: zero novel grams -> history byte-untouched
    n_rows = spark.read.parquet(os.path.join(path, "vocab")).count()
    append_gram_vocab(train, "text", path)
    after = {p: s for p, s in _snap(path).items()
             if p.endswith(".parquet") and p in before}
    assert after == before
    assert spark.read.parquet(
        os.path.join(path, "vocab")).count() == n_rows
    # vocabulary stays a set across appends
    assert (spark.read.parquet(os.path.join(path, "vocab"))
            .distinct().count() == n_rows)


def test_neardup_leakage_component_level(spark):
    """Leakage audit: an eval doc leaks when its LSH component contains a
    train doc — including TRANSITIVELY (eval ~ bridge ~ train chain);
    near-dup pairs wholly inside eval do not leak; unclustered eval docs
    report NULL root and leaked=false."""
    from rassengine_spark.llmops.decontam import flag_neardup_leakage
    t = ("the quick brown fox jumps over the lazy dog again and again "
         "and it keeps on jumping all day long")
    rows = [
        (1, t, "train"),
        (2, t + " extra", "eval"),                  # direct leak
        (3, "totally different text about spark shuffles and parquet "
            "files at scale with many executors", "eval"),  # unclustered
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi", "eval"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu", "eval"),               # eval-only cluster
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = {r.doc_id: r for r in
           flag_neardup_leakage(df, "text", "doc_id", shingle_n=3,
                                threshold=0.5).collect()}
    assert set(got) == {2, 3, 10, 11}
    assert got[2].leaked and got[2].root == 1
    assert not got[3].leaked and got[3].root is None
    assert not got[10].leaked and not got[11].leaked
    assert got[10].root == 10 and got[11].root == 10


def test_ndcg_at_k_grades_order(spark):
    """nDCG distinguishes what recall can't: perfect order = 1.0, all-k
    found but reversed < 1.0, a miss scores only its hit ranks, a query
    with zero hits scores 0.0."""
    import math

    from rassengine_spark.llmops.similarity import ndcg_at_k
    exact = spark.createDataFrame(
        [(q, i) for q in (0, 1, 2) for i in (10, 11, 12)],
        "query_id int, id int")
    approx = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),     # perfect
         (1, 12, 1), (1, 11, 2), (1, 10, 3),     # reversed: same recall
         (2, 99, 1), (2, 98, 2), (2, 97, 3)],    # nothing relevant
        "query_id int, id int, rank int")
    got = {r.query_id: r for r in ndcg_at_k(approx, exact).collect()}
    g = [round(1_000_000 / math.log2(r + 1)) for r in (1, 2, 3)]
    ideal = sum(g)
    assert got[0].ndcg == 1.0 and got[0].dcg_micro == ideal
    # reversed: same three gains in a set-sum -> DCG equals ideal too?
    # no — gains attach to the APPROX rank, and all three ranks hit, so
    # the reversed list still sums the same three gains: binary
    # relevance makes full-recall permutations tie. The discriminating
    # case is a PARTIAL hit at a low rank:
    assert got[1].ndcg == 1.0
    assert got[2].ndcg == 0.0 and got[2].dcg_micro == 0
    # partial: only one relevant item, found at rank 3 vs ideal rank 1
    exact1 = spark.createDataFrame([(7, 10)], "query_id int, id int")
    approx1 = spark.createDataFrame([(7, 98, 1), (7, 99, 2), (7, 10, 3)],
                                    "query_id int, id int, rank int")
    one = ndcg_at_k(approx1, exact1).collect()[0]
    assert one.n_exact == 1 and one.idcg_micro == g[0]
    assert one.dcg_micro == g[2]
    assert one.ndcg == round(g[2] / g[0], 6)


def test_gram_vocab_append_sizes_files_and_compacts(spark, tmp_path):
    """Small appends write one file (not `buckets` slivers); compaction
    re-buckets the slivers crash-safely without changing the set."""
    import os

    from rassengine_spark.llmops.decontam import (append_gram_vocab,
                                                  compact_gram_vocab,
                                                  ngram_overlap_from_store,
                                                  save_gram_vocab)
    train = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id int, text string")
    path = str(tmp_path / "v")
    save_gram_vocab(train, "text", path, n=3, buckets=8)
    vocab_p = os.path.join(path, "vocab")

    def n_files():
        return sum(1 for dp, _, names in os.walk(vocab_p)
                   for f in names if f.endswith(".parquet"))

    base_files = n_files()
    append_gram_vocab(spark.createDataFrame(
        [(2, "q r s t u v")], "doc_id int, text string"), "text", path)
    assert n_files() == base_files + 1      # one small file, not 8
    rows = {r.gh for r in spark.read.parquet(vocab_p).collect()}
    compact_gram_vocab(spark, path)
    assert {r.gh for r in spark.read.parquet(vocab_p).collect()} == rows
    assert not os.path.exists(vocab_p + ".__fold_bak")
    ev = spark.createDataFrame([(10, "a b c d e f")],
                               "doc_id int, text string")
    got = ngram_overlap_from_store(spark, ev, "text", "doc_id",
                                   path).collect()[0]
    assert got.n_matched == got.n_grams == 4


def test_ndcg_at_k_max_rank_guards(spark):
    """Ranks beyond max_rank must surface as NULL metrics (never a
    silent 0-gain), a bigger max_rank computes them, and n_exact beyond
    the table NULLs the ideal instead of dividing by zero."""
    import math

    from rassengine_spark.llmops.similarity import ndcg_at_k
    exact = spark.createDataFrame([(0, 10)], "query_id int, id int")
    approx = spark.createDataFrame([(0, 10, 60)],
                                   "query_id int, id int, rank int")
    guarded = ndcg_at_k(approx, exact).collect()[0]   # max_rank=50 < 60
    assert guarded.dcg_micro is None and guarded.ndcg is None
    wide = ndcg_at_k(approx, exact, max_rank=80).collect()[0]
    g60 = round(1_000_000 / math.log2(61))
    assert wide.dcg_micro == g60
    assert wide.ndcg == round(g60 / 1_000_000, 6)


def test_weighted_sample_proportional_to_weight(spark):
    """Inclusion frequency across many seeds tracks the weight ratio
    (Efraimidis-Spirakis property), and the sample is deterministic."""
    from rassengine_spark.llmops.splits import weighted_sample_take
    rows = [(i, 9.0 if i < 10 else 1.0) for i in range(110)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy_hits = light_hits = 0
    for s in range(12):
        got = weighted_sample_take(df, "w", "id", k=20,
                                   seed=f"s{s}").collect()
        ids = {r.id for r in got}
        assert len(ids) == 20
        heavy_hits += sum(1 for i in ids if i < 10)
        light_hits += sum(1 for i in ids if i >= 10)
    # 10 heavy rows at weight 9 vs 100 light at weight 1: heavy rows
    # must be sampled far above their 1/11 population share
    assert heavy_hits / 12 > 4.0
    # deterministic: same seed, same sample, ascending race keys
    a = weighted_sample_take(df, "w", "id", k=20, seed="s0").collect()
    b = weighted_sample_take(df, "w", "id", k=20, seed="s0").collect()
    assert [r.id for r in a] == [r.id for r in b]
    races = [r.race for r in a]
    assert races == sorted(races)


def test_weighted_sample_edge_cases(spark):
    import pytest as _pytest

    from rassengine_spark.llmops.splits import weighted_sample_take
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)], "id long, w double")
    got = weighted_sample_take(df, "w", "id", k=10).collect()
    assert [r.id for r in got] == [1]       # only the positive weight
    with _pytest.raises(ValueError):
        weighted_sample_take(df, "w", "id", k=0)
