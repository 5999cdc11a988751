"""Stateful streaming sessionization: gap closure, timeout closure, state
carry across micro-batches (two query runs over one checkpoint)."""

import json
import os

from rassengine_spark.streaming.sessionize import sessionize_stream


def _write_batch(d, name, rows):
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)   # atomic: file source sees whole files


def _run_once(spark, src, out, ckpt):
    events = (spark.readStream.schema("user_id string, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = (sessionize_stream(events, gap_minutes=30, watermark="10 minutes")
         .writeStream.format("parquet").outputMode("append")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return {(r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.read.parquet(str(out)).collect()}


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    # batch 1: u1 has two sessions separated by a >30min gap inside the
    # batch; u2 has one short session
    _write_batch(str(src), "b1.json", [
        {"user_id": "u1", "ts": "2024-01-01T10:00:00"},
        {"user_id": "u1", "ts": "2024-01-01T10:10:00"},
        {"user_id": "u1", "ts": "2024-01-01T11:00:00"},   # gap 50min -> new
        {"user_id": "u2", "ts": "2024-01-01T10:05:00"},
    ])
    got1 = _run_once(spark, src, out, ckpt)
    # u1's first session closes via the in-batch gap; u2's closes via
    # timeout (watermark 10:50 = max event 11:00 - 10min passes u2's
    # last+gap 10:35); u1's second (last+gap 11:30) stays open in state
    assert got1 == {("u1", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
                    ("u2", "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1)}

    # restart from the same checkpoint: a far-future event advances the
    # watermark past the remaining open session's last+gap -> timeout
    _write_batch(str(src), "b2.json", [
        {"user_id": "u3", "ts": "2024-01-01T23:00:00"},
    ])
    got2 = _run_once(spark, src, out, ckpt)
    assert ("u1", "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1) in got2
    # u2 closed in the first run; exactly-once append must not re-emit it
    assert sum(1 for r in got2 if r[0] == "u2") == 1
