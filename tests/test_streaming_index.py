"""Streaming term-index maintenance: immutable per-batch segments with
an atomic commit marker — segment-served BM25 equals a scan over the
union corpus bit-for-bit, historical segments never rewrite, replay is
a no-op, and a foreign checkpoint lineage is rejected."""

import glob
import json
import os

import pytest

from rassengine_spark.streaming.index import (bm25_topk_from_segments,
                                              stream_index_ingest)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_index_ingest(spark, dirs["in"], dirs["idx"], dirs[ckpt])
    q.awaitTermination(120)


WAVE1 = [{"doc_id": 1, "text": "spark shuffles data between stages"},
         {"doc_id": 2, "text": "the inverted index serves bm25 queries"},
         {"doc_id": 3, "text": "spark broadcast joins avoid shuffles"}]
WAVE2 = [{"doc_id": 4, "text": "bm25 ranks documents by term rarity"},
         {"doc_id": 5, "text": "segments never rewrite history"}]


def test_segment_serving_matches_union_scan(spark, tmp_path):
    from rassengine_spark.functions.bm25 import bm25_topk

    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)

    corpus = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in WAVE1 + WAVE2],
        "doc_id long, text string")
    for q in ("spark shuffles", "bm25 index", "history"):
        served = [(r.id, r.score) for r in
                  bm25_topk_from_segments(spark, dirs["idx"], q, k=5)
                  .orderBy("score", "id").collect()]
        scanned = [(r.id, r.score) for r in
                   bm25_topk(corpus, "text", "doc_id", q, k=5)
                   .orderBy("score", "id").collect()]
        assert served == scanned            # bit parity, not approx


def test_segments_are_immutable_and_replay_is_noop(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)

    seg1 = os.path.join(dirs["idx"], "segments", "s0")
    before = {p: os.path.getmtime(p)
              for p in glob.glob(seg1 + "/**/*.parquet", recursive=True)}
    assert before

    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)
    after = {p: os.path.getmtime(p)
             for p in glob.glob(seg1 + "/**/*.parquet", recursive=True)}
    assert after == before                  # history untouched by append

    # replay with the same checkpoint: availableNow re-run sees no new
    # files; marker unchanged
    marker = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    _run(spark, dirs)
    assert json.load(open(os.path.join(dirs["idx"],
                                       "LATEST.json"))) == marker

    # a DIFFERENT checkpoint lineage must be rejected, not mis-merged
    _write(os.path.join(dirs["in"], "c.json"), WAVE1)
    q = stream_index_ingest(spark, dirs["in"], dirs["idx"], dirs["ckpt2"])
    with pytest.raises(Exception, match="checkpoint lineage"):
        q.awaitTermination(120)
        q.processAllAvailable()


def test_marker_stats_are_exact_integers(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)
    m = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    toks = [len(r["text"].split()) for r in WAVE1 + WAVE2]
    assert m["n_docs"] == 5 and m["n_dl"] == 5
    assert m["sum_dl"] == sum(toks)
