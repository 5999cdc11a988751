"""Streaming IVF vector-index maintenance: immutable seg=/cell=
segments, quantizer pinned to the first batch, tombstone-based upsert
(a re-ingested embedding may change cells), serving equal to the batch
store on the live corpus."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from rassengine_spark.streaming.vectors import (ivf_topk_from_segments,
                                                stream_vector_ingest)

DIM = 8


def _vec(seed):
    return [float((seed * 13 + j * 7) % 11) - 5.0 for j in range(DIM)]


WAVE1 = [{"vec_id": i, "embedding": _vec(i)} for i in range(1, 21)]
WAVE2 = [{"vec_id": i, "embedding": _vec(i)} for i in range(21, 31)]
# WAVE3 (the upsert wave) is built inside the test: vec 1 re-ingests
# with a DIFFERENT cell's centroid vector, guaranteeing a cell move


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_vector_ingest(spark, dirs["in"], dirs["idx"], dirs[ckpt],
                             n_cells=4)
    q.awaitTermination(120)


def _queries(spark):
    rows = [(100 + i, _vec(50 + i)) for i in range(3)]
    return spark.createDataFrame(rows,
                                 "qid long, embedding array<double>")


def _store_results(spark, tmp_path, live_rows, queries):
    """Batch-store results on the live corpus with the STREAM's
    quantizer rule (md5 sample of the FIRST batch)."""
    from rassengine_spark.llmops.similarity import ivf_centroids
    from rassengine_spark.operators.index_store import (
        ivf_topk_from_store, save_ivf_index)

    first = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in WAVE1],
        "vec_id long, embedding array<double>")
    cents = ivf_centroids(first, "embedding", "vec_id", 4)
    corpus = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in live_rows],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "batch_store")
    save_ivf_index(corpus, "embedding", "vec_id", path, n_cells=4,
                   centroids=cents)
    return sorted(map(tuple,
                      ivf_topk_from_store(spark, path, queries,
                                          "embedding", "qid", k=3,
                                          n_probe=2).collect()))


def test_streamed_ivf_matches_batch_store_and_upserts(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)

    q = _queries(spark)
    got = sorted(map(tuple,
                     ivf_topk_from_segments(spark, dirs["idx"], q,
                                            "embedding", "qid", k=3,
                                            n_probe=2).collect()))
    assert got == _store_results(spark, tmp_path, WAVE1 + WAVE2, q)

    # seg=0 files must be byte-untouched by the append
    seg0 = os.path.join(dirs["idx"], "assignments", "seg=0")
    before = {p: os.path.getmtime(p)
              for p in glob.glob(seg0 + "/**/*.parquet", recursive=True)}
    assert before

    # upsert: vec 1 re-ingests as another cell's centroid vector — a
    # centroid's nearest centroid is itself (cosine 1), so the move is
    # guaranteed; the stale copy must not serve from ANY cell
    asg0 = spark.read.parquet(os.path.join(dirs["idx"], "assignments"))
    old_cell = asg0.filter("id = 1").collect()[0].cell
    cents = (spark.read.parquet(os.path.join(dirs["idx"], "centroids"))
             .orderBy("cell").collect())
    new_cell = next(r.cell for r in cents if r.cell != old_cell)
    moved = [float(x) for x in cents[new_cell].cvec]
    wave3 = [{"vec_id": 1, "embedding": moved},
             {"vec_id": 40, "embedding": _vec(40)}]
    _write(os.path.join(dirs["in"], "c.json"), wave3)
    _run(spark, dirs)
    live = [r for r in WAVE1 if r["vec_id"] != 1] + WAVE2 + wave3
    got2 = sorted(map(tuple,
                      ivf_topk_from_segments(spark, dirs["idx"], q,
                                             "embedding", "qid", k=3,
                                             n_probe=2).collect()))
    assert got2 == _store_results(spark, tmp_path, live, q)

    after = {p: os.path.getmtime(p)
             for p in glob.glob(seg0 + "/**/*.parquet", recursive=True)}
    assert after == before

    # the re-ingested vector must actually have MOVED cells — the
    # scenario the tombstone design exists for
    asg = spark.read.parquet(os.path.join(dirs["idx"], "assignments"))
    cells = {r.seg: r.cell
             for r in asg.filter("id = 1").select("seg", "cell").collect()}
    assert cells[0] != cells[2], "pick an embedding that changes cells"

    # marker sanity + replay no-op
    m = json.load(open(os.path.join(dirs["idx"], "LATEST.json")))
    assert m["segments"] == [0, 1, 2] and m["tombstones"] == [2]
    _run(spark, dirs)
    assert json.load(open(os.path.join(dirs["idx"],
                                       "LATEST.json"))) == m


def test_foreign_checkpoint_rejected(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    q = stream_vector_ingest(spark, dirs["in"], dirs["idx"],
                             dirs["ckpt2"], n_cells=4)
    with pytest.raises(Exception, match="checkpoint lineage"):
        q.awaitTermination(120)
        q.processAllAvailable()


def test_in_batch_duplicates_and_null_rows(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    dup = [{"vec_id": 7, "embedding": _vec(7)},
           {"vec_id": 7, "embedding": _vec(8)},     # same id, same batch
           {"vec_id": 9, "embedding": None},        # no vector: ignored
           {"vec_id": None, "embedding": _vec(3)},  # no id: ignored
           {"vec_id": 10, "embedding": _vec(10)}]
    _write(os.path.join(dirs["in"], "a.json"), dup)
    _run(spark, dirs)
    asg = spark.read.parquet(os.path.join(dirs["idx"], "assignments"))
    ids = [r.id for r in asg.select("id").collect()]
    assert sorted(ids) == [7, 10]                   # one copy of 7, no nulls
    # the kept copy is the greatest embedding (deterministic rule)
    kept = [r.v for r in asg.filter("id = 7").collect()][0]
    assert list(kept) == max(_vec(7), _vec(8))


def test_vector_delete_then_resurrect(spark, tmp_path):
    import shutil

    from rassengine_spark.streaming.vectors import (
        delete_vectors_from_segments, ivf_topk_from_segments)

    dirs = {k: str(tmp_path / k) for k in ("in", "idx", "ckpt")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"), WAVE1)
    _run(spark, dirs)
    _write(os.path.join(dirs["in"], "b.json"), WAVE2)
    _run(spark, dirs)

    victims = [1, 25]
    delete_vectors_from_segments(spark, dirs["idx"], victims)
    q = _queries(spark)
    served = sorted(map(tuple, ivf_topk_from_segments(
        spark, dirs["idx"], q, "embedding", "qid", k=3,
        n_probe=2).collect()))
    live = [r for r in WAVE1 + WAVE2 if r["vec_id"] not in victims]
    assert served == _store_results(spark, tmp_path, live, q)
    assert not any(r[1] in victims for r in served)

    # re-ingest vec 1 in a later segment: it serves again
    shutil.rmtree(str(tmp_path / "batch_store"))
    _write(os.path.join(dirs["in"], "c.json"),
           [{"vec_id": 1, "embedding": _vec(71)}])
    _run(spark, dirs)
    live2 = live + [{"vec_id": 1, "embedding": _vec(71)}]
    served2 = sorted(map(tuple, ivf_topk_from_segments(
        spark, dirs["idx"], q, "embedding", "qid", k=3,
        n_probe=2).collect()))
    assert served2 == _store_results(spark, tmp_path, live2, q)
