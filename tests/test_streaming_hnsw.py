"""streaming/hnsw.py: streamed shard appends serve exactly (exhaustive
mode == brute force over the union); replayed appends are idempotent
(deterministic part_id namespace + dynamic partition overwrite);
a foreign checkpoint is rejected."""

import json
import os

import pytest

from rassengine_spark.llmops.hnsw import (append_hnsw_index_at,
                                          hnsw_topk_from_store_df)
from rassengine_spark.llmops.similarity import brute_force_topk
from rassengine_spark.streaming.hnsw import (stream_hnsw_append,
                                             stream_hnsw_graphs_path)


def _vecs(n0, k, dim=8):
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) \
            / float(1 << 48) * 2 - 1
    return [(n0 + i, [h(f"{n0 + i}/{j}") for j in range(dim)])
            for i in range(k)]


def _write(path, rows):
    with open(path, "w") as f:
        for i, v in rows:
            f.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_hnsw_append(spark, dirs["in"], dirs["ix"], dirs[ckpt])
    q.awaitTermination(120)


def test_stream_hnsw_serves_exact_replay_noop_foreign_rejected(
        spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "ix", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    wave1, wave2 = _vecs(0, 30), _vecs(30, 20)
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)

    corpus = spark.createDataFrame(wave1 + wave2,
                                   "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(_vecs(1000, 3),
                               "qid long, embedding array<double>")
    gp = stream_hnsw_graphs_path(dirs["ix"])
    served = hnsw_topk_from_store_df(spark, gp, qs, "embedding", "qid",
                                     k=5, ef_search=10 ** 6).collect()
    bf = brute_force_topk(corpus, qs, "embedding", "vec_id", "qid",
                          k=5).collect()
    key = lambda rows: [(r.query_id, r.id, r.score, r.rank) for r in rows]
    assert key(served) == key(bf)

    # replay: same checkpoint, no new files — marker and store unchanged
    marker = json.load(open(os.path.join(dirs["ix"], "LATEST.json")))
    parts = {r.part_id for r in spark.read.parquet(gp)
             .select("part_id").distinct().collect()}
    _run(spark, dirs)
    assert json.load(open(os.path.join(
        dirs["ix"], "LATEST.json"))) == marker
    assert {r.part_id for r in spark.read.parquet(gp)
            .select("part_id").distinct().collect()} == parts

    # a DIFFERENT checkpoint against the same store must raise loudly
    with pytest.raises(Exception) as ei:
        q = stream_hnsw_append(spark, dirs["in"], dirs["ix"],
                               dirs["ckpt2"])
        q.awaitTermination(120)
    assert "different" in str(ei.value) or "lineage" in str(ei.value)


def test_append_at_same_offset_is_idempotent(spark, tmp_path):
    """The crash-window story: re-running a batch append at the SAME
    offset rewrites its own shard dirs (dynamic partition overwrite) —
    no duplicate shards, results unchanged."""
    rows = _vecs(0, 40)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "g")
    append_hnsw_index_at(df, "embedding", "vec_id", path, part_offset=100)
    parts1 = sorted(r.part_id for r in spark.read.parquet(path)
                    .select("part_id").distinct().collect())
    n1 = spark.read.parquet(path).count()
    append_hnsw_index_at(df, "embedding", "vec_id", path, part_offset=100)
    parts2 = sorted(r.part_id for r in spark.read.parquet(path)
                    .select("part_id").distinct().collect())
    assert parts1 == parts2
    assert spark.read.parquet(path).count() == n1 == 40
    qs = spark.createDataFrame(_vecs(1000, 2),
                               "qid long, embedding array<double>")
    served = hnsw_topk_from_store_df(spark, path, qs, "embedding", "qid",
                                     k=3, ef_search=10 ** 6).collect()
    bf = brute_force_topk(df, qs, "embedding", "vec_id", "qid",
                          k=3).collect()
    assert [(r.query_id, r.id, r.score, r.rank) for r in served] == \
           [(r.query_id, r.id, r.score, r.rank) for r in bf]
