"""Round-3 training-pipeline operators: hard-negative mining, cluster
profiling, C4 span dedup, length-bucketed batching."""

import math

from pyspark.sql import functions as F

from rassengine_spark.llmops.similarity import (cluster_profile,
                                                hard_negative_topk,
                                                ivf_centroids,
                                                mine_triplets)
from rassengine_spark.llmops.splits import length_bucket_batches
from rassengine_spark.llmops.text_analysis import span_dedup


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")


def test_hard_negatives_exclude_same_label(spark):
    # corpus vec 10 is IDENTICAL to the query but shares its label —
    # mining must skip it and return the closest other-label vectors
    rows = [(0, [1.0, 0.0], 7),
            (10, [1.0, 0.0], 7),       # positive (same label): excluded
            (11, [0.9, 0.1], 1),       # hardest negative
            (12, [0.0, 1.0], 1),
            (13, [-1.0, 0.0], 2)]
    df = _emb(spark, rows)
    q = df.filter("vec_id = 0").select(F.col("vec_id").alias("qid"),
                                       "embedding", "label")
    c = df.filter("vec_id >= 10")
    got = hard_negative_topk(c, q, "embedding", "vec_id", "qid", k=2) \
        .orderBy("rank").collect()
    assert [r.id for r in got] == [11, 12]
    assert got[0].score > got[1].score
    assert all(r.id != 10 for r in got)


def test_hard_negatives_null_label_drops(spark):
    rows = [(0, [1.0, 0.0], 7), (10, [1.0, 0.0], None),
            (11, [0.5, 0.5], 1)]
    df = _emb(spark, rows)
    q = df.filter("vec_id = 0").select(F.col("vec_id").alias("qid"),
                                       "embedding", "label")
    c = df.filter("vec_id >= 10")
    got = hard_negative_topk(c, q, "embedding", "vec_id", "qid", k=5)
    assert [r.id for r in got.collect()] == [11]


def test_cluster_profile_matches_manual_assignment(spark):
    rows = [(i, [float((i * 13 + j * 7) % 5) - 2.0 for j in range(4)], 0)
            for i in range(40)]
    df = _emb(spark, rows)
    cents = ivf_centroids(df, "embedding", "vec_id", 3)
    prof = {r.cell: r for r in
            cluster_profile(df, "embedding", "vec_id", n_cells=3,
                            centroids=cents).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb + 1e-9), 6)

    manual = {}
    for _, v, _lbl in rows:
        affs = sorted(((-cos(v, c), i) for i, c in enumerate(cents)))
        best_aff, best_cell = -affs[0][0], affs[0][1]
        manual.setdefault(best_cell, []).append(best_aff)
    assert set(prof) == set(manual)
    for cell, affs in manual.items():
        r = prof[cell]
        assert r.n_vecs == len(affs)
        want_avg = sum(round(a * 1e6) for a in affs) / (len(affs) * 1e6)
        assert r.avg_affinity == want_avg
        assert r.min_affinity == min(affs)
        assert r.max_affinity == max(affs)
    assert sum(r.n_vecs for r in prof.values()) == len(rows)


def test_span_dedup_drops_repeated_boilerplate(spark):
    bp = "One shared. Two shared. Three shared. "
    docs = spark.createDataFrame(
        [(1, bp + "Doc one body. It is unique. Truly unique."),
         (2, bp + "Doc two body. Also unique. Very different."),
         (3, bp)],
        "doc_id bigint, text string")
    got = {r.id: r for r in span_dedup(docs, "text", "doc_id").collect()}
    # doc 1 is the first (id, span_pos) occurrence of the boilerplate span
    assert got[1].text.startswith("One shared. Two shared. Three shared.")
    assert got[1].n_dropped == 0
    # docs 2 and 3 lose it
    assert got[2].text.startswith("Doc two body.")
    assert got[2].n_dropped == 1
    assert "shared" not in got[3].text
    assert got[3].n_dropped == 1
    # unique spans survive
    assert "Truly unique." in got[1].text
    assert "Very different." in got[2].text


def test_span_dedup_null_and_empty_text(spark):
    docs = spark.createDataFrame([(1, None), (2, "")],
                                 "doc_id bigint, text string")
    got = {r.id: r for r in span_dedup(docs, "text", "doc_id").collect()}
    # empty span is exempt from dedup; both docs keep their single span
    assert got[1].text == "" and got[2].text == ""
    assert got[1].n_dropped == 0 and got[2].n_dropped == 0


def test_length_bucket_batches_shapes_and_padding(spark):
    rows = [(i, 10 + (i % 3)) for i in range(50)]   # lengths 10..12
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens int")
    out = length_bucket_batches(df, "doc_id", "n_tokens",
                                bucket_width=4, batch_size=4, shards=2)
    got = out.collect()
    assert sum(r.n_seqs for r in got) == 50
    for r in got:
        assert 1 <= r.n_seqs <= 4
        assert r.bucket in (2, 3)                    # 10//4=2, 12//4=3
        assert r.padding == r.n_seqs * r.max_tokens - r.sum_tokens
        assert r.padding >= 0
    # deterministic under repartitioning
    again = length_bucket_batches(df.repartition(7), "doc_id", "n_tokens",
                                  bucket_width=4, batch_size=4, shards=2)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_mine_triplets_hardest_pair_and_margin(spark):
    rows = [(0, [1.0, 0.0], 7),
            (10, [0.95, 0.05], 7),     # hardest positive
            (11, [0.2, 0.8], 7),       # easier positive
            (12, [0.9, 0.1], 1),       # hardest negative
            (13, [-1.0, 0.0], 2)]
    df = _emb(spark, rows)
    q = df.filter("vec_id = 0").select(F.col("vec_id").alias("qid"),
                                       "embedding", "label")
    c = df.filter("vec_id >= 10")
    got = mine_triplets(c, q, "embedding", "vec_id", "qid").collect()
    assert len(got) == 1
    t = got[0]
    assert (t.pos_id, t.neg_id) == (10, 12)
    assert t.margin == t.pos_score - t.neg_score
    # no same-label corpus row -> no triplet for that anchor
    q2 = df.filter("vec_id = 0").select(
        F.col("vec_id").alias("qid"), "embedding",
        F.lit(99).alias("label"))
    assert mine_triplets(c, q2, "embedding", "vec_id", "qid").count() == 0


def test_top_ngrams_counts_and_short_doc_guard(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the cat mat"),
         (2, "the cat sat"),
         (3, "one"),              # shorter than n: contributes nothing
         (4, None)],
        "doc_id bigint, text string")
    from rassengine_spark.llmops.text_analysis import top_ngrams
    got = [(r.ngram, r.cnt) for r in
           top_ngrams(docs, "text", n=2, k=3).collect()]
    # "the cat" x3 tops; ties broken by ngram asc
    assert got[0] == ("the cat", 3)
    assert got[1] == ("cat sat", 2)
    assert len(got) == 3
    # n=3 exercises the chained zip expansion (two zip_with passes);
    # doc 2 has exactly one trigram, doc 3 none
    got3 = [(r.ngram, r.cnt) for r in
            top_ngrams(docs, "text", n=3, k=2).collect()]
    assert got3[0] == ("the cat sat", 2)
    assert got3[1] == ("cat sat on", 1)


def test_maxsim_topk_matches_reference(spark):
    from pyspark.sql import functions as F

    from rassengine_spark.llmops.similarity import maxsim_topk

    import math

    def cos(a, b):
        dp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dp / (na * nb + 1e-9)

    docs = [(d, [float((d * 7 + i * 3 + j) % 5 - 2) for j in range(4)])
            for d in range(6) for i in range(3)]
    qs = [(0, t, [float((t + j) % 3 - 1) for j in range(4)])
          for t in range(2)] + [(1, 9, [1.0, 0.0, -1.0, 0.5])]
    ddf = spark.createDataFrame(docs, "doc long, v array<double>")
    qdf = spark.createDataFrame(qs, "qid long, tok long, v array<double>")
    got = {(r.query_id, r.id): (r.score, r.rank)
           for r in maxsim_topk(ddf, qdf, "v", "doc", "tok", "qid",
                                k=3).collect()}

    # reference: sum over tokens of max over doc vectors of round(cos, 6)
    from collections import defaultdict
    by_doc = defaultdict(list)
    for d, v in docs:
        by_doc[d].append(v)
    by_q = defaultdict(list)
    for qid, _, v in qs:
        by_q[qid].append(v)
    want = {}
    for qid, toks in by_q.items():
        scored = sorted(
            ((sum(max(round(cos(t, v), 6) for v in vs) for t in toks), -d)
             for d, vs in by_doc.items()), reverse=True)
        for rank, (s, negd) in enumerate(scored[:3], 1):
            want[(qid, -negd)] = (round(s, 10), rank)
    assert set(got) == set(want)
    for key, (s, rank) in want.items():
        assert got[key][1] == rank
        assert abs(got[key][0] - s) < 1e-9


def test_mmr_rerank_diversifies(spark):
    from rassengine_spark.llmops.similarity import mmr_rerank

    # two near-identical high-rel candidates + one orthogonal lower-rel:
    # plain top-2 keeps the twins; MMR must swap the duplicate out
    rows = [
        (0, 1, 0.9, [1.0, 0.0, 0.0]),
        (0, 2, 0.89, [1.0, 0.001, 0.0]),   # near-dup of id 1
        (0, 3, 0.5, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "qid long, cid long, score double, v array<double>")
    got = [(r.id, r.mmr_rank)
           for r in mmr_rerank(df, "v", "cid", "qid", k=2)
           .orderBy("mmr_rank").collect()]
    assert got == [(1, 1), (3, 2)]


def test_mmr_rerank_ties_and_small_groups(spark):
    from rassengine_spark.llmops.similarity import mmr_rerank

    rows = [(0, 7, 0.5, [1.0, 0.0]), (0, 4, 0.5, [0.0, 1.0]),
            (1, 9, 0.1, [1.0, 1.0])]
    df = spark.createDataFrame(
        rows, "qid long, cid long, score double, v array<double>")
    got = {(r.query_id, r.mmr_rank): r.id
           for r in mmr_rerank(df, "v", "cid", "qid", k=5).collect()}
    assert got[(0, 1)] == 4          # rel tie -> lower id first
    assert (0, 2) in got
    assert got[(1, 1)] == 9          # group smaller than k just ends


def test_ewma_half_matches_python_reference(spark):
    """ewma_half == the adjusted-EWMA closed form with decay 1/2,
    truncated at max_lag; repartition-invariant (the ordered fold is
    explicit, not a window SUM's association order)."""
    from rassengine_spark.operators.windows import ewma_half
    rows = [("a", t, float((t * 37) % 11) + 0.25) for t in range(20)]
    rows += [("b", t, 100.0 - t) for t in range(5)]
    df = spark.createDataFrame(rows, "p string, o int, x double")

    def ref(xs, t, lag):
        lo = max(0, t - lag)
        num = sum(xs[s] * 2.0 ** (s - t) for s in range(lo, t + 1))
        den = sum(2.0 ** (s - t) for s in range(lo, t + 1))
        return round(num / den, 4)

    for lag in (50, 3):
        got = {(r.p, r.o): r.ewma
               for r in ewma_half(df, "p", "o", "x",
                                  max_lag=lag).collect()}
        xs_a = [x for _, _, x in rows[:20]]
        xs_b = [x for _, _, x in rows[20:]]
        for t in range(20):
            assert got[("a", t)] == ref(xs_a, t, lag), (lag, t)
        for t in range(5):
            assert got[("b", t)] == ref(xs_b, t, lag), (lag, t)
    rep = {(r.p, r.o): r.ewma
           for r in ewma_half(df.repartition(9), "p", "o", "x").collect()}
    assert rep == {(r.p, r.o): r.ewma
                   for r in ewma_half(df, "p", "o", "x").collect()}


def test_ewma_half_long_span_and_lag_bounds(spark):
    """A partition spanning >= 32 steps exercises shift counts past
    INT32 (the DuckDB-oracle overflow class: a plain `1 <<` is INT32 and
    throws at lag 31); max_lag outside [0, 62] must raise instead of
    silently wrapping the JVM's mod-64 shift."""
    import duckdb
    import pytest

    from rassengine_spark.operators.windows import ewma_half
    rows = [("a", t, float((t * 13) % 7) + 0.5) for t in range(40)]
    df = spark.createDataFrame(rows, "p string, o int, x double")
    got = {r.o: r.ewma for r in ewma_half(df, "p", "o", "x").collect()}
    assert len(got) == 40

    # the oracle's weight form on a 40-step span (shift count up to 39)
    con = duckdb.connect()
    oracle = con.execute("""
        WITH idx AS (SELECT * FROM (VALUES {vals}) v(t, x))
        SELECT a.t,
               round(SUM(b.x / CAST(CAST(1 AS BIGINT) << CAST(a.t - b.t AS INT) AS DOUBLE) ORDER BY b.t)
                     / SUM(1.0 / CAST(CAST(1 AS BIGINT) << CAST(a.t - b.t AS INT) AS DOUBLE) ORDER BY b.t), 4) AS ewma
        FROM idx a JOIN idx b ON b.t <= a.t AND a.t - b.t <= 50
        GROUP BY a.t
    """.format(vals=", ".join(f"({t}, {x})" for _, t, x in rows))).fetchall()
    assert {t: e for t, e in oracle} == got

    for bad in (-1, 63, 64):
        with pytest.raises(ValueError, match="max_lag"):
            ewma_half(df, "p", "o", "x", max_lag=bad)


def test_range_search_returns_all_above_threshold(spark):
    from rassengine_spark.llmops.similarity import range_search
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
         (4, [-1.0, 0.0])], "id long, v array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, v array<double>")
    got = {r.id: r.score
           for r in range_search(corpus, q, "v", "id", "qid",
                                 min_score=0.5).collect()}
    assert set(got) == {1, 2}            # 3 orthogonal, 4 opposite
    assert got[1] == 1.0 and got[2] > 0.99


def test_maxsim_topk_arrow_matches_expr(spark):
    """r09 parity pin: the numpy max-cosine pass must reproduce the
    expression form VALUE-FOR-VALUE (the NOTES convention for every
    Arrow twin of an interpreted HOF expression)."""
    from rassengine_spark.llmops.similarity import (maxsim_topk,
                                                    maxsim_topk_expr)

    docs = [(d, [float((d * 13 + i * 5 + j * j) % 17 - 8) / 3.0
                 for j in range(8)])
            for d in range(20) for i in range(4)]
    qs = [(q, q * 100 + t,
           [float((q * 7 + t * 11 + j) % 13 - 6) / 5.0 for j in range(8)])
          for q in range(3) for t in range(5)]
    ddf = spark.createDataFrame(docs, "doc long, v array<double>")
    qdf = spark.createDataFrame(qs, "qid long, tok long, v array<double>")
    a = sorted(map(tuple, maxsim_topk(
        ddf, qdf, "v", "doc", "tok", "qid", k=4).collect()))
    b = sorted(map(tuple, maxsim_topk_expr(
        ddf, qdf, "v", "doc", "tok", "qid", k=4).collect()))
    assert a == b
    # empty query batch: schema-stable empty result
    empty = maxsim_topk(ddf, qdf.filter("qid < 0"), "v", "doc", "tok",
                        "qid", k=4)
    assert empty.columns == ["query_id", "id", "score", "rank"]
    assert empty.count() == 0


def test_brute_force_topk_arrow_matches_expr(spark):
    """r09 parity pin: the numpy brute-force scorer must reproduce the
    expression form VALUE-FOR-VALUE across metrics and roundings —
    including score ties (rounded equal scores must break on id asc
    exactly as the JVM window does)."""
    from rassengine_spark.llmops.similarity import (brute_force_topk,
                                                    brute_force_topk_expr)

    # duplicate vectors force exact score ties across ids
    docs = [(d, [float((d % 4) * 3 + j) / 7.0 for j in range(6)])
            for d in range(24)]
    qs = [(q, [float((q + j * 2) % 5 - 2) / 3.0 for j in range(6)])
          for q in range(4)]
    ddf = spark.createDataFrame(docs, "vid long, v array<double>")
    qdf = spark.createDataFrame(qs, "qid long, v array<double>")
    for metric in ("cosine", "dot"):
        for rt in (6, 2, None):
            a = sorted(map(tuple, brute_force_topk(
                ddf, qdf, "v", "vid", "qid", k=5, metric=metric,
                round_to=rt).collect()))
            b = sorted(map(tuple, brute_force_topk_expr(
                ddf, qdf, "v", "vid", "qid", k=5, metric=metric,
                round_to=rt).collect()))
            assert a == b, (metric, rt)
