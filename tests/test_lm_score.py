"""Bigram LM scorer: hand-computed probabilities, in-distribution vs
gibberish separation, short-doc handling."""

import math

from rassengine_spark.llmops.lm_score import bigram_lm_score, fit_bigram_lm


def test_hand_computed_probabilities(spark):
    train = spark.createDataFrame([(1, "a b a b")], "doc_id int, text string")
    bigrams, unigrams, vocab = fit_bigram_lm(train, "text", "doc_id")
    assert vocab == 2
    bc = {(r.w1, r.w2): r.c2 for r in bigrams.collect()}
    uc = {r.w1: r.c1 for r in unigrams.collect()}
    assert bc == {("a", "b"): 2, ("b", "a"): 1}
    assert uc == {"a": 2, "b": 1}

    score_df = spark.createDataFrame(
        [(10, "a b"), (11, "b b"), (12, "a")], "doc_id int, text string")
    got = {r.id: r for r in bigram_lm_score(
        score_df, bigrams, unigrams, vocab, "text", "doc_id").collect()}
    # P(b|a) = (2+1)/(2+2) = 0.75 ; P(b|b) = (0+1)/(1+2) = 1/3
    assert got[10].n_bigrams == 1
    assert abs(got[10].avg_logp - math.log(0.75)) < 1e-6
    assert abs(got[11].avg_logp - math.log(1 / 3)) < 1e-6
    # single-word doc: no bigrams, null score
    assert got[12].n_bigrams == 0 and got[12].avg_logp is None


def test_in_distribution_scores_higher(spark):
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug")
         for i in range(5)], "doc_id int, text string")
    bigrams, unigrams, vocab = fit_bigram_lm(train, "text", "doc_id")
    score_df = spark.createDataFrame(
        [(1, "the cat sat on the rug"),
         (2, "rug dog mat zq xw cat")],          # shuffled/gibberish
        "doc_id int, text string")
    got = {r.id: r.avg_logp for r in bigram_lm_score(
        score_df, bigrams, unigrams, vocab, "text", "doc_id").collect()}
    assert got[1] > got[2]
