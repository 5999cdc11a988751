"""streaming/dsir.py + llmops/dsir.py counts tier: folded gram-count
stores equal a one-shot aggregate over the union; weights served from
folded stores are bit-identical to the live two-corpus computation;
replay is a no-op; a foreign checkpoint is rejected."""

import json
import os
import random

import pytest

from rassengine_spark.llmops.dsir import (gram_bucket_counts,
                                          importance_weights,
                                          importance_weights_from_counts,
                                          merge_gram_counts,
                                          read_gram_counts)
from rassengine_spark.streaming.dsir import (read_stream_gram_counts,
                                             stream_gram_counts_maintenance)

NB = 256


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(n0, k, tag):
    words = ["alpha", "beta", "gamma", "delta", "medical", "trial",
             "dose", "web", "spam", "crawl"]
    rng = random.Random(n0)
    return [(n0 + i, " ".join(rng.choices(words, k=8)) + f" {tag}")
            for i in range(k)]


def _counts(df_rows):
    return {(r.b, r.c) for r in df_rows}


def test_fold_equals_one_shot_rebuild(spark, tmp_path):
    rows = _corpus(0, 30, "t")
    path = str(tmp_path / "c")
    # three arbitrary-size folds
    for lo, hi in ((0, 7), (7, 19), (19, 30)):
        merge_gram_counts(spark, path, _docs(spark, rows[lo:hi]),
                          "text", "doc_id", n=2, n_buckets=NB)
    folded = _counts(read_gram_counts(spark, path).collect())
    oneshot = _counts(gram_bucket_counts(_docs(spark, rows), "text",
                                         "doc_id", 2, NB).collect())
    assert folded == oneshot


def test_weights_from_folded_counts_match_live(spark, tmp_path):
    raw_rows = _corpus(100, 40, "raw web spam")
    tgt_rows = _corpus(500, 12, "medical trial dose")
    raw = _docs(spark, raw_rows)
    tgt = _docs(spark, tgt_rows)
    tpath, rpath = str(tmp_path / "t"), str(tmp_path / "r")
    for lo, hi in ((0, 5), (5, 12)):
        merge_gram_counts(spark, tpath, _docs(spark, tgt_rows[lo:hi]),
                          "text", "doc_id", n=2, n_buckets=NB)
    for lo, hi in ((0, 21), (21, 40)):
        merge_gram_counts(spark, rpath, _docs(spark, raw_rows[lo:hi]),
                          "text", "doc_id", n=2, n_buckets=NB)
    live = {(r.id, r.n_grams, r.imp_micro)
            for r in importance_weights(raw, tgt, "text", "doc_id",
                                        n=2, n_buckets=NB).collect()}
    stored = {(r.id, r.n_grams, r.imp_micro)
              for r in importance_weights_from_counts(
                  raw, "text", "doc_id",
                  read_gram_counts(spark, rpath),
                  read_gram_counts(spark, tpath),
                  n=2, n_buckets=NB).collect()}
    assert stored == live and len(live) == 40


def _write(path, rows):
    with open(path, "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_gram_counts_maintenance(spark, dirs["in"], dirs["cn"],
                                       dirs[ckpt], n_buckets=NB)
    q.awaitTermination(120)


def test_stream_counts_match_batch_replay_noop_foreign_rejected(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "cn", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    wave1 = _corpus(0, 9, "t")
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)
    wave2 = _corpus(9, 6, "t")
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)
    got = _counts(read_stream_gram_counts(spark, dirs["cn"]).collect())
    want = _counts(gram_bucket_counts(_docs(spark, wave1 + wave2),
                                      "text", "doc_id", 2, NB).collect())
    assert got == want

    # replay: same checkpoint, no new files — no new version, no double
    # count (counts are additive, so this is the load-bearing property)
    marker = json.load(open(os.path.join(dirs["cn"], "LATEST.json")))
    _run(spark, dirs)
    assert _counts(read_stream_gram_counts(
        spark, dirs["cn"]).collect()) == got
    assert json.load(open(os.path.join(
        dirs["cn"], "LATEST.json"))) == marker

    # a DIFFERENT checkpoint against the same store must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_gram_counts_maintenance(spark, dirs["in"], dirs["cn"],
                                           dirs["ckpt2"], n_buckets=NB)
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)
