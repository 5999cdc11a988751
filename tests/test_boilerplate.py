"""llmops/boilerplate.py + streaming/boilerplate.py: per-source
boilerplate line stats — hand-computed semantics, store folds ≡ one-shot,
crash-safe compaction, idempotent named deltas, streaming maintenance."""

import json
import os

import pytest
from pyspark.sql import functions as F

from rassengine_spark.llmops.boilerplate import (
    append_line_stats, boilerplate_from_store, boilerplate_lines_by_source,
    compact_line_stats, read_line_stats, save_line_stats)
from rassengine_spark.streaming.boilerplate import (
    stream_line_stats_maintenance)

DOCS = [
    # source A: 'header a' in all 3 docs (twice in d1 — counts once),
    # 'promo' in 2 of 3
    (1, "A", "Header A\nfoo bar\nPromo\nheader a"),
    (2, "A", "header a\nbaz\npromo"),
    (3, "A", " HEADER A \nqux"),
    # source B: 'header b' in both docs
    (4, "B", "header b\nfoo bar\nzz"),
    (5, "B", "header b\n\nzz"),
]
SCHEMA = "doc_id long, source string, text string"

EXPECTED = {
    ("A", "header a", 3, 3, 1_000_000, True),
    ("A", "promo", 2, 3, 666_666, False),
    ("B", "header b", 2, 2, 1_000_000, True),
    ("B", "zz", 2, 2, 1_000_000, True),
}


def _rows(df):
    return {(r.source, r.line, r.n_docs, r.src_docs, r.frac_ppm, r.flagged)
            for r in df.collect()}


def test_one_shot_semantics(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    out = boilerplate_lines_by_source(df, "text", "doc_id", "source",
                                      min_docs=2, min_frac_ppm=700_000)
    assert _rows(out) == EXPECTED


def test_min_len_drops_short_lines(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    out = boilerplate_lines_by_source(df, "text", "doc_id", "source",
                                      min_docs=2, min_frac_ppm=700_000,
                                      min_len=3)
    assert _rows(out) == EXPECTED - {("B", "zz", 2, 2, 1_000_000, True)}


def _fold_store(spark, path, waves, buckets=4):
    first, *rest = waves
    save_line_stats(spark.createDataFrame(first, SCHEMA), "text",
                    "doc_id", "source", path, buckets=buckets)
    for w in rest:
        append_line_stats(spark.createDataFrame(w, SCHEMA), "text",
                          "doc_id", "source", path)


def test_store_fold_equals_one_shot_and_compacts(spark, tmp_path):
    path = str(tmp_path / "stats")
    waves = [[DOCS[0], DOCS[3]], [DOCS[1], DOCS[4]], [DOCS[2]]]
    _fold_store(spark, path, waves)
    df = spark.createDataFrame(DOCS, SCHEMA)
    oneshot = _rows(boilerplate_lines_by_source(
        df, "text", "doc_id", "source", min_docs=2, min_frac_ppm=700_000))
    assert _rows(boilerplate_from_store(
        spark, path, min_docs=2, min_frac_ppm=700_000)) == oneshot

    # compaction: values unchanged, deltas folded into a new base version
    m0 = json.load(open(os.path.join(path, "manifest.json")))
    assert len(m0["deltas"]) == 2
    compact_line_stats(spark, path)
    m1 = json.load(open(os.path.join(path, "manifest.json")))
    assert m1["deltas"] == [] and m1["version"] == m0["version"] + 1
    assert not os.path.exists(
        os.path.join(path, "versions", f"v{m0['version']}"))
    assert not os.listdir(os.path.join(path, "deltas"))
    assert _rows(boilerplate_from_store(
        spark, path, min_docs=2, min_frac_ppm=700_000)) == oneshot

    # folds keep working after compaction
    extra = [(6, "A", "header a\nnew line")]
    append_line_stats(spark.createDataFrame(extra, SCHEMA), "text",
                      "doc_id", "source", path)
    full = spark.createDataFrame(DOCS + extra, SCHEMA)
    assert _rows(boilerplate_from_store(
        spark, path, min_docs=2, min_frac_ppm=700_000)) == _rows(
        boilerplate_lines_by_source(full, "text", "doc_id", "source",
                                    min_docs=2, min_frac_ppm=700_000))


def test_named_delta_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "stats")
    save_line_stats(spark.createDataFrame([DOCS[0]], SCHEMA), "text",
                    "doc_id", "source", path, buckets=2)
    w = spark.createDataFrame([DOCS[1]], SCHEMA)
    append_line_stats(w, "text", "doc_id", "source", path, delta_name="b7")
    before = {(r.source, r.norm, r.cnt)
              for r in read_line_stats(spark, path).collect()}
    append_line_stats(w, "text", "doc_id", "source", path, delta_name="b7")
    after = {(r.source, r.norm, r.cnt)
             for r in read_line_stats(spark, path).collect()}
    assert before == after
    m = json.load(open(os.path.join(path, "manifest.json")))
    assert m["deltas"] == ["b7"]


def test_uncommitted_orphan_delta_is_invisible(spark, tmp_path):
    path = str(tmp_path / "stats")
    save_line_stats(spark.createDataFrame([DOCS[0]], SCHEMA), "text",
                    "doc_id", "source", path, buckets=2)
    committed = {(r.source, r.norm, r.cnt)
                 for r in read_line_stats(spark, path).collect()}
    # simulate a fold that crashed before its manifest commit: the delta
    # parquet exists but the manifest never listed it
    (spark.createDataFrame([("A", "ghost line", 9)],
                           "source string, norm string, cnt long")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "deltas", "d99")))
    assert {(r.source, r.norm, r.cnt)
            for r in read_line_stats(spark, path).collect()} == committed


def test_empty_fold_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "stats")
    save_line_stats(spark.createDataFrame([DOCS[0]], SCHEMA), "text",
                    "doc_id", "source", path, buckets=2)
    empty = spark.createDataFrame([], SCHEMA)
    append_line_stats(empty, "text", "doc_id", "source", path)
    m = json.load(open(os.path.join(path, "manifest.json")))
    assert m["deltas"] == []


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for i, s, t in rows:
            f.write(json.dumps({"doc_id": i, "source": s, "text": t})
                    + "\n")


def _run_stream(spark, dirs, ckpt="ckpt"):
    q = stream_line_stats_maintenance(spark, dirs["in"], dirs["st"],
                                      dirs[ckpt], buckets=2)
    q.awaitTermination(120)


def test_stream_matches_one_shot_replay_noop_foreign_rejected(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "st", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write_jsonl(os.path.join(dirs["in"], "a.json"), DOCS[:2])
    _run_stream(spark, dirs)
    _write_jsonl(os.path.join(dirs["in"], "b.json"), DOCS[2:])
    _run_stream(spark, dirs)

    df = spark.createDataFrame(DOCS, SCHEMA)
    oneshot = _rows(boilerplate_lines_by_source(
        df, "text", "doc_id", "source", min_docs=2, min_frac_ppm=700_000))
    assert _rows(boilerplate_from_store(
        spark, dirs["st"], min_docs=2, min_frac_ppm=700_000)) == oneshot

    # replay with the same checkpoint and no new files: counters frozen
    marker = json.load(open(os.path.join(dirs["st"], "LATEST.json")))
    _run_stream(spark, dirs)
    assert json.load(open(os.path.join(
        dirs["st"], "LATEST.json"))) == marker
    assert _rows(boilerplate_from_store(
        spark, dirs["st"], min_docs=2, min_frac_ppm=700_000)) == oneshot

    # a different checkpoint lineage must be rejected loudly
    with pytest.raises(Exception) as ei:
        q = stream_line_stats_maintenance(spark, dirs["in"], dirs["st"],
                                          dirs["ckpt2"], buckets=2)
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)
