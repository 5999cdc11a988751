"""Streaming incremental dedup: micro-batches admit only novel docs,
the signature store grows with survivors, and near-dups quarantine."""

import json
import os

from rassengine_spark.streaming.dedup import stream_dedup_ingest


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, dirs, n):
    # SAME checkpoint across runs: the file source's processed-file log is
    # what makes re-starts exactly-once (a fresh checkpoint would re-ingest
    # everything and self-pair the store)
    q = stream_dedup_ingest(spark, dirs["in"], dirs["store"],
                            dirs["corpus"], dirs["dupes"], dirs["ckpt"])
    q.awaitTermination(120)


def test_stream_dedup_across_batches(spark, tmp_path):
    dirs = {k: str(tmp_path / k)
            for k in ("in", "store", "corpus", "dupes", "ckpt")}
    os.makedirs(dirs["in"])
    base = "the quick brown fox jumps over the lazy dog again and again"
    _write(os.path.join(dirs["in"], "a.json"), [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact in-batch dup
        {"doc_id": 3, "text": "totally different content about spark"},
    ])
    _run(spark, dirs, 1)
    corpus1 = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    assert corpus1 == {1, 3}                              # 2 deduped in-batch

    # second batch: a near-dup of doc 1 plus a genuinely new doc
    _write(os.path.join(dirs["in"], "b.json"), [
        {"doc_id": 10, "text": "quick brown fox jumps over the lazy dog "
                               "again and again"},        # near-dup of 1
        {"doc_id": 11, "text": "novel words that match nothing else here "
                               "at all in any way"},
    ])
    _run(spark, dirs, 2)
    corpus2 = {r.doc_id for r in spark.read.parquet(dirs["corpus"]).collect()}
    assert corpus2 == {1, 3, 11}                          # 10 quarantined
    dupes = spark.read.parquet(dirs["dupes"]).collect()
    assert {(r.id_old, r.id_new) for r in dupes} == {(1, 10)}
    # store holds signatures for exactly the admitted docs
    store_ids = {r.id for r in spark.read.parquet(dirs["store"])
                 .select("id").distinct().collect()}
    assert store_ids == {1, 3, 11}
