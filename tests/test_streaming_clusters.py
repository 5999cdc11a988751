"""streaming/clusters.py: versioned cluster folds equal a from-scratch
batch clustering; replay is a no-op; a foreign checkpoint is rejected."""

import json
import os

import pytest

from rassengine_spark.llmops.dedup import dup_clusters
from rassengine_spark.streaming.clusters import (read_stream_clusters,
                                                 stream_cluster_maintenance)


def _write(path, pairs):
    with open(path, "w") as f:
        for a, b in pairs:
            f.write(json.dumps({"id_a": a, "id_b": b}) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_cluster_maintenance(spark, dirs["in"], dirs["cl"],
                                   dirs[ckpt])
    q.awaitTermination(120)


def _snapshot(spark, dirs):
    return {(r.node, r.root, r.cluster_size)
            for r in read_stream_clusters(spark, dirs["cl"]).collect()}


def test_stream_clusters_match_batch_and_merge_across_batches(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "cl", "ckpt")}
    os.makedirs(dirs["in"])
    wave1 = [(1, 2), (10, 11), (20, 21)]
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)
    assert _snapshot(spark, dirs) == {
        (1, 1, 2), (2, 1, 2), (10, 10, 2), (11, 10, 2),
        (20, 20, 2), (21, 20, 2)}

    wave2 = [(2, 10), (30, 31)]           # bridges {1,2}+{10,11}; new pair
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)
    got = _snapshot(spark, dirs)
    want = {(r.node, r.root, r.cluster_size)
            for r in dup_clusters(
                spark.createDataFrame(wave1 + wave2,
                                      "id_a long, id_b long")).collect()}
    assert got == want
    assert (11, 1, 4) in got              # merged under min id 1


def test_replay_is_noop_and_foreign_checkpoint_rejected(spark, tmp_path):
    dirs = {k: str(tmp_path / k)
            for k in ("in", "cl", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), [(1, 2)])
    _run(spark, dirs)
    before = _snapshot(spark, dirs)
    marker = json.load(open(os.path.join(dirs["cl"], "LATEST.json")))

    # same checkpoint, no new files: no new version commits
    _run(spark, dirs)
    assert _snapshot(spark, dirs) == before
    assert json.load(open(os.path.join(
        dirs["cl"], "LATEST.json"))) == marker

    # a DIFFERENT checkpoint against the same store must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_cluster_maintenance(spark, dirs["in"], dirs["cl"],
                                       dirs["ckpt2"])
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)
