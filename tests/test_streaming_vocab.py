"""streaming/vocab.py: the streamed gram-vocabulary store equals a
one-shot build over the union corpus; replay appends nothing; a foreign
checkpoint is rejected; probes from the live store match the one-shot
overlap."""

import json
import os

import pytest

from rassengine_spark.llmops.decontam import (ngram_overlap,
                                              ngram_overlap_from_store)
from rassengine_spark.streaming.vocab import stream_gram_vocab_maintenance


def _write(path, rows):
    with open(path, "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_gram_vocab_maintenance(spark, dirs["in"], dirs["vo"],
                                      dirs[ckpt], n=3)
    q.awaitTermination(120)


def test_stream_vocab_matches_one_shot_replay_noop_foreign_rejected(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "vo", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    wave1 = [(1, "a b c d e f"), (2, "z y x w v u")]
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)
    wave2 = [(3, "a b c q r s")]          # shares 'a b c' with wave 1
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)

    train = spark.createDataFrame(wave1 + wave2, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(10, "a b c d e f"), (11, "a b c n o p"), (12, "m n o p q t")],
        "doc_id long, text string")
    stored = {(r.doc_id, r.n_grams, r.n_matched, r.overlap_frac)
              for r in ngram_overlap_from_store(
                  spark, ev, "text", "doc_id", dirs["vo"]).collect()}
    oneshot = {(r.doc_id, r.n_grams, r.n_matched, r.overlap_frac)
               for r in ngram_overlap(ev, train, "text", "doc_id",
                                      n=3).collect()}
    assert stored == oneshot

    # replay: same checkpoint, no new files — vocabulary stays a set,
    # marker untouched (re-appends would be no-ops anyway)
    marker = json.load(open(os.path.join(dirs["vo"], "LATEST.json")))
    n_rows = spark.read.parquet(os.path.join(dirs["vo"], "vocab")).count()
    _run(spark, dirs)
    assert spark.read.parquet(
        os.path.join(dirs["vo"], "vocab")).count() == n_rows
    assert json.load(open(os.path.join(
        dirs["vo"], "LATEST.json"))) == marker

    # a DIFFERENT checkpoint against the same store must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_gram_vocab_maintenance(spark, dirs["in"], dirs["vo"],
                                          dirs["ckpt2"], n=3)
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)
