"""streaming/scd2.py: versioned SCD2 folds equal a from-scratch
snapshot; replay is a no-op; a foreign checkpoint is rejected."""

import json
import os

import pytest

from rassengine_spark.pipeline.scd2 import scd2_snapshot
from rassengine_spark.streaming.scd2 import (read_stream_scd2,
                                             stream_scd2_maintenance)


def _write(path, rows):
    with open(path, "w") as f:
        for k, a, ts, seq in rows:
            f.write(json.dumps({"k": k, "a": a, "ts": ts, "seq": seq})
                    + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_scd2_maintenance(spark, dirs["in"], dirs["sc"], dirs[ckpt])
    q.awaitTermination(120)


def _snapshot(spark, dirs):
    return {(r.k, r.a, r.valid_from, r.valid_to, r.is_current)
            for r in read_stream_scd2(spark, dirs["sc"]).collect()}


def test_stream_scd2_matches_batch_replay_noop_foreign_rejected(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "sc", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    wave1 = [(1, "x", 10, 0), (2, "p", 10, 1)]
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)
    wave2 = [(1, "x", 20, 2), (1, "y", 30, 3)]   # repeat then change
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)
    got = _snapshot(spark, dirs)
    obs = spark.createDataFrame(wave1 + wave2,
                                "k long, a string, ts long, seq long")
    want = {(r.k, r.a, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_snapshot(obs, ["k"], ["a"], "ts", "seq")
            .drop("_seq").collect()}
    assert got == want
    assert (1, "x", 10, 30, False) in got and (2, "p", 10, None, True) in got

    # replay: no new version, no re-closing at stale timestamps
    marker = json.load(open(os.path.join(dirs["sc"], "LATEST.json")))
    _run(spark, dirs)
    assert _snapshot(spark, dirs) == got
    assert json.load(open(os.path.join(
        dirs["sc"], "LATEST.json"))) == marker

    # a DIFFERENT checkpoint against the same table must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_scd2_maintenance(spark, dirs["in"], dirs["sc"],
                                    dirs["ckpt2"])
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)


def test_stream_scd2_explicit_col_types(spark, tmp_path):
    """col_types maps columns to Spark DDL types for the JSON read:
    numeric keys/attrs keep their batch-tier types instead of silently
    degrading to string (ADVICE r5: only a column literally named 'k'
    used to be typed long)."""
    dirs = {k: str(tmp_path / k) for k in ("in", "sc", "ckpt")}
    os.makedirs(dirs["in"])
    with open(os.path.join(dirs["in"], "a.json"), "w") as f:
        for sid, price, ts, seq in [(7, 1.5, 10, 0), (7, 2.25, 20, 1),
                                    (8, 9.0, 10, 2)]:
            f.write(json.dumps({"store_id": sid, "price": price,
                                "ts": ts, "seq": seq}) + "\n")
    q = stream_scd2_maintenance(
        spark, dirs["in"], dirs["sc"], dirs["ckpt"],
        key_cols=["store_id"], attr_cols=["price"],
        col_types={"store_id": "long", "price": "double"})
    q.awaitTermination(120)
    tbl = read_stream_scd2(spark, dirs["sc"])
    types = dict(tbl.dtypes)
    assert types["store_id"] == "bigint" and types["price"] == "double"
    got = {(r.store_id, r.price, r.valid_from, r.valid_to, r.is_current)
           for r in tbl.collect()}
    assert got == {(7, 1.5, 10, 20, False), (7, 2.25, 20, None, True),
                   (8, 9.0, 10, None, True)}
