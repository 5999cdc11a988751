"""Learned quality classifier: trains on weak Gopher labels, separates
obvious prose from obvious junk, and scores reproducibly."""

import pytest

from rassengine_spark.llmops.mllib_quality import (score_quality,
                                                   train_quality_model,
                                                   weak_label_from_gopher)

GOOD = ("the report explains in plain sentences how the system works and "
        "why each part of it exists with enough words for the rules ") * 4
JUNK = "* a\n* b\n* c\n* d\n* e\n* f\n* g\n* h\n* i\n* j"


def _corpus(spark):
    rows = ([(i, GOOD + f" variation {i}") for i in range(30)]
            + [(100 + i, JUNK + f" {i}") for i in range(30)])
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_model_separates_prose_from_junk(spark):
    docs = _corpus(spark)
    labeled = weak_label_from_gopher(docs, "text", "doc_id")
    # weak labels must actually disagree, else there is nothing to learn
    labs = {r.id: r.label for r in labeled.collect()}
    assert 0 < sum(labs.values()) < len(labs)

    model = train_quality_model(labeled.withColumnRenamed("id", "doc_id"),
                                "text", "label")
    scores = {r.id: r.quality_score
              for r in score_quality(docs, "text", "doc_id",
                                     model).collect()}
    good = [scores[i] for i in range(30)]
    junk = [scores[100 + i] for i in range(30)]
    assert min(good) > max(junk)

    # reproducible: same data, same seed-free single-pass fit -> same
    # scores on a re-score
    again = {r.id: r.quality_score
             for r in score_quality(docs, "text", "doc_id",
                                    model).collect()}
    assert again == scores


def test_quality_holdout_eval_counts_and_floor(spark):
    from rassengine_spark.llmops.mllib_quality import quality_holdout_eval

    good = [(i, "the quick brown fox and the lazy dog discuss spark "
                "plans for a while in plain readable english prose "
                + "word " * 60, 1) for i in range(40)]
    junk = [(100 + i, "$$$ !!! ### " * 3, 0) for i in range(40)]
    df = spark.createDataFrame(good + junk, "id long, text string, label int")
    tr = df.filter("id % 2 = 0")
    ho = df.filter("id % 2 = 1")
    r = quality_holdout_eval(tr, ho, "text", floor=0.7).collect()[0]
    assert r.n_eval == 40
    assert r.n_pos == 20
    assert r.acc_ok   # perfectly separable -> clears any sane floor


def test_quality_eval_tolerates_null_text(spark):
    from rassengine_spark.llmops.mllib_quality import quality_holdout_eval

    rows = [(i, "plain useful english prose " + "word " * 40, 1)
            for i in range(20)] + [(50, None, 0), (51, None, 0)]
    df = spark.createDataFrame(rows, "id long, text string, label int")
    r = quality_holdout_eval(df.filter("id % 2 = 0"),
                             df.filter("id % 2 = 1"),
                             "text", floor=0.5).collect()[0]
    assert r.n_eval == 11   # 10 prose + 1 null-text doc, no crash
