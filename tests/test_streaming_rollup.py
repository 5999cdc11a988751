"""Streaming rollup maintenance: versioned copy-on-write folds with an
atomic commit marker — results equal a from-scratch recompute exactly
(DECIMAL value sums), replay is a no-op, and a foreign checkpoint
lineage is rejected instead of silently mis-folding."""

import json
import os
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from rassengine_spark.streaming.rollup import (read_stream_rollup,
                                               stream_rollup_maintenance)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, dirs, ckpt="ckpt"):
    q = stream_rollup_maintenance(spark, dirs["in"], dirs["roll"],
                                  dirs[ckpt])
    q.awaitTermination(120)


def test_stream_rollup_matches_batch_recompute(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "roll", "ckpt")}
    os.makedirs(dirs["in"])
    # 0.1 / 0.3 are NOT dyadic: a double fold would drift by association,
    # the DECIMAL fold must not
    wave1 = [{"user_id": u, "event_type": "click", "value": 0.1, "ts": "t"}
             for u in range(40)] + \
            [{"user_id": u, "event_type": "view", "value": 0.3, "ts": "t"}
             for u in range(10)]
    _write(os.path.join(dirs["in"], "a.json"), wave1)
    _run(spark, dirs)

    wave2 = [{"user_id": u, "event_type": "click", "value": 0.3, "ts": "t"}
             for u in range(20, 60)]
    _write(os.path.join(dirs["in"], "b.json"), wave2)
    _run(spark, dirs)

    counts = {r.event_type: (r.n_events, r.sum_value)
              for r in read_stream_rollup(spark, dirs["roll"],
                                          "counts").collect()}
    assert counts["click"] == (80, Decimal("16.000000"))   # 40*0.1+40*0.3
    assert counts["view"] == (10, Decimal("3.000000"))

    users = {r.event_type: r.approx_distinct
             for r in read_stream_rollup(spark, dirs["roll"],
                                         "users").collect()}
    full = spark.createDataFrame(
        [(r["event_type"], r["user_id"]) for r in wave1 + wave2],
        "event_type string, user_id long")
    want = {r.event_type: r.a for r in
            (full.groupBy("event_type")
                 .agg(F.hll_sketch_estimate(
                     F.hll_sketch_agg("user_id", F.lit(12))).alias("a"))
             .collect())}
    assert users == want
    assert abs(users["click"] - 60) <= 3

    # values: quantiles interpolated from the maintained histogram —
    # click values are 40x0.1 + 40x0.3, so p50 sits in the first 0.5-wide
    # bin (upper edge 0.5) and p99 likewise
    vals = {r.event_type: (r.q_0_5, r.q_0_99)
            for r in read_stream_rollup(spark, dirs["roll"],
                                        "values").collect()}
    assert vals["click"] == (0.5, 0.5)
    assert vals["view"] == (0.5, 0.5)

    # replay with the SAME checkpoint: no new files -> no new folds
    _run(spark, dirs)
    counts2 = {r.event_type: (r.n_events, r.sum_value)
               for r in read_stream_rollup(spark, dirs["roll"],
                                           "counts").collect()}
    assert counts2 == counts
    # retention: at most the committed version and its parent remain
    vs = os.listdir(os.path.join(dirs["roll"], "versions"))
    assert len(vs) <= 2


def test_stream_rollup_rejects_foreign_checkpoint(spark, tmp_path):
    dirs = {k: str(tmp_path / k) for k in ("in", "roll", "ckpt", "ckpt2")}
    os.makedirs(dirs["in"])
    _write(os.path.join(dirs["in"], "a.json"),
           [{"user_id": 1, "event_type": "click", "value": 1.0,
             "ts": "t"}])
    _run(spark, dirs)

    # a NEW checkpoint restarts batch ids at 0 — folding into rollups
    # committed under the old lineage must fail loudly, not mis-fold
    with pytest.raises(Exception, match="checkpoint lineage"):
        q = stream_rollup_maintenance(spark, dirs["in"], dirs["roll"],
                                      dirs["ckpt2"])
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_stream_rollup_hitters_table_tracks_heavy_users(spark, tmp_path):
    import json as _json
    import os

    from rassengine_spark.streaming.rollup import (read_stream_rollup,
                                                   stream_rollup_maintenance)

    dirs = {k: str(tmp_path / k) for k in ("in", "roll", "ckpt")}
    os.makedirs(dirs["in"])
    # user 7 dominates clicks across two batches
    w1 = [{"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": 7,
           "event_type": "click", "value": 1.0} for i in range(40)] + \
         [{"event_id": 100 + i, "ts": "2024-01-01T00:00:00", "user_id": i,
           "event_type": "click", "value": 1.0} for i in range(10)]
    w2 = [{"event_id": 200 + i, "ts": "2024-01-01T01:00:00", "user_id": 7,
           "event_type": "click", "value": 2.0} for i in range(25)]
    for name, rows in (("a", w1), ("b", w2)):
        with open(os.path.join(dirs["in"], f"{name}.json"), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        q = stream_rollup_maintenance(spark, dirs["in"], dirs["roll"],
                                      dirs["ckpt"])
        q.awaitTermination(120)

    hitters = {(r.event_type, r.item): r.est
               for r in read_stream_rollup(spark, dirs["roll"],
                                           "hitters").collect()}
    clicks = {i: e for (t, i), e in hitters.items() if t == "click"}
    assert max(clicks, key=clicks.get) == "7"
    # user 7 truly appears 66 times (40 + 1 in the filler range + 25);
    # MG undercount bound: 75 click events, k=32 -> N/(k+1) = 2
    assert 66 - 2 <= clicks["7"] <= 66
