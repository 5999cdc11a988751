"""Streaming term-index maintenance: immutable per-batch segments with
an atomic commit marker — segment-served BM25 equals a scan over the
LIVE corpus bit-for-bit (doc-level upsert: last writer wins), historical
segment files never rewrite, replay is a no-op, and a foreign checkpoint
lineage is rejected."""

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
# doc 1 re-ingested with NEW text: the stale copy must stop serving
WAVE3 = [{"doc_id": 1, "text": "corrected spark text replaces history"},
         {"doc_id": 6, "text": "a brand new document arrives"}]


def _assert_matches_scan(spark, idx_dir, live_rows, queries):
    from rassengine_spark.functions.bm25 import bm25_topk

    corpus = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in live_rows],
        "doc_id long, text string")
    for q in queries:
        served = [(r.id, r.score) for r in
                  bm25_topk_from_segments(spark, idx_dir, q, k=10)
                  .orderBy("score", "id").collect()]
        scanned = [(r.id, r.score) for r in
                   bm25_topk(corpus, "text", "doc_id", q, k=10)
                   .orderBy("score", "id").collect()]
        assert served == scanned            # bit parity, not approx


def test_segment_serving_matches_union_scan(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)
    _assert_matches_scan(spark, dirs["idx"], WAVE1 + WAVE2,
                         ("spark shuffles", "bm25 index", "history"))


def test_upsert_supersedes_stale_copy(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE3)
    _run(spark, dirs)
    # live corpus = WAVE1 minus the stale doc 1, plus WAVE3
    live = [r for r in WAVE1 if r["doc_id"] != 1] + WAVE3
    _assert_matches_scan(spark, dirs["idx"], live,
                         ("spark", "history", "corrected text"))
    # the stale copy must not appear even for terms ONLY it contained
    got = [r.id for r in
           bm25_topk_from_segments(spark, dirs["idx"], "stages").collect()]
    assert got == []
    # marker stats count the upserted doc exactly once
    m = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    assert m["n_docs"] == len(live)
    assert m["sum_dl"] == sum(len(r["text"].split()) for r in live)


def test_segments_are_immutable_and_replay_is_noop(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)

    seg0 = os.path.join(dirs["idx"], "postings", "seg=0")
    before = {p: os.path.getmtime(p)
              for p in glob.glob(seg0 + "/**/*.parquet", recursive=True)}
    assert before

    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)
    after = {p: os.path.getmtime(p)
             for p in glob.glob(seg0 + "/**/*.parquet", recursive=True)}
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


def test_delete_docs_then_resurrect_by_reingest(spark, tmp_path):
    from rassengine_spark.streaming.index import delete_docs_from_segments

    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)

    seg_files = sorted(glob.glob(
        os.path.join(dirs["idx"], "postings", "**", "*.parquet"),
        recursive=True))
    delete_docs_from_segments(spark, dirs["idx"], [1, 4])

    # served results == a scan of the corpus WITHOUT the deleted docs
    live = [r for r in WAVE1 + WAVE2 if r["doc_id"] not in (1, 4)]
    _assert_matches_scan(spark, dirs["idx"], live,
                         ("spark shuffles", "bm25 term rarity"))
    # terms only the deleted docs contained return nothing
    assert bm25_topk_from_segments(spark, dirs["idx"],
                                   "stages").count() == 0
    # marker stats exclude deleted docs; history files byte-untouched
    m = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    assert m["n_docs"] == len(live)
    assert seg_files == sorted(glob.glob(
        os.path.join(dirs["idx"], "postings", "**", "*.parquet"),
        recursive=True))
    # idempotent re-delete
    delete_docs_from_segments(spark, dirs["idx"], [1])
    _assert_matches_scan(spark, dirs["idx"], live, ("spark",))

    # re-ingesting doc 1 in a LATER segment resurrects it
    _write(os.path.join(dirs["in"], "c.json"),
           [{"doc_id": 1, "text": "doc one returns to the index"}])
    _run(spark, dirs)
    live2 = live + [{"doc_id": 1, "text": "doc one returns to the index"}]
    _assert_matches_scan(spark, dirs["idx"], live2, ("returns", "spark"))
    m2 = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    assert m2["n_docs"] == len(live2)


def test_uncommitted_delete_epoch_is_invisible(spark, tmp_path):
    from rassengine_spark.streaming.deletes import write_delete_epoch

    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    # simulate a crash AFTER the epoch write but BEFORE the marker
    # recommit: serving must be completely unaffected
    write_delete_epoch(spark, dirs["idx"], [1, 2, 3], at_seg=0,
                       committed=[])
    _assert_matches_scan(spark, dirs["idx"], WAVE1, ("spark", "bm25"))
    m = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    assert m["n_docs"] == len(WAVE1)
