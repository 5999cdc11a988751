"""streaming/decontam_report.py + the counters tier: folded report ==
one-shot contamination_report over the union eval set; replay is a
no-op; a foreign checkpoint is rejected."""

import json
import os

import pytest

from rassengine_spark.llmops.decontam import (contamination_report,
                                              save_gram_vocab)
from rassengine_spark.streaming.decontam_report import (
    read_stream_contamination_report,
    stream_contamination_report_maintenance)

TRAIN = [(1, "a b c d e f"), (2, "z y x w v u")]
EV = [(10, "a b c d e f", "s0", "en"),    # fully contained
      (11, "a b c q q q", "s0", "de"),    # partial
      (12, "m n o p q t", "s1", "en"),    # none
      (13, "a b c d n o", "s1", "en")]    # partial


def _write(path, rows):
    with open(path, "w") as f:
        for i, t, su, la in rows:
            f.write(json.dumps({"doc_id": i, "text": t,
                                "suite": su, "lang": la}) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_contamination_report_maintenance(
        spark, dirs["in"], dirs["rp"], dirs[ckpt], dirs["vo"])
    q.awaitTermination(120)


def _key(rows):
    return {(r.suite, r.lang, r.gid, r.n_docs, r.n_contaminated,
             r.tot_grams, r.tot_matched, r.matched_frac, r.avg_overlap)
            for r in rows}


def test_stream_report_matches_batch_replay_noop_foreign(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "rp", "vo",
                                           "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    save_gram_vocab(train, "text", dirs["vo"], n=3)

    _write(os.path.join(dirs["in"], "a.json"), EV[:2])
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), EV[2:])
    _run(spark, dirs)

    got = _key(read_stream_contamination_report(
        spark, dirs["rp"], ["suite", "lang"]).collect())
    ev_all = spark.createDataFrame(
        EV, "doc_id long, text string, suite string, lang string")
    want = _key(contamination_report(ev_all, train, "text", "doc_id",
                                     ["suite", "lang"], n=3).collect())
    assert got == want and len(got) == 6   # 3 finest + 2 suites + total

    # replay: no new version, no double-count (counters are additive)
    marker = json.load(open(os.path.join(dirs["rp"], "LATEST.json")))
    _run(spark, dirs)
    assert _key(read_stream_contamination_report(
        spark, dirs["rp"], ["suite", "lang"]).collect()) == got
    assert json.load(open(os.path.join(
        dirs["rp"], "LATEST.json"))) == marker

    # a DIFFERENT checkpoint against the same report must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_contamination_report_maintenance(
            spark, dirs["in"], dirs["rp"], dirs["ckpt2"], dirs["vo"])
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)
