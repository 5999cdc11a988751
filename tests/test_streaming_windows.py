"""Watermarked streaming windowed counts + streaming dedup: append-mode
emission on watermark passage, late-data handling, duplicate suppression."""

import json
import os

from rassengine_spark.streaming.windows import dedup_stream, windowed_counts


def _write_batch(d, name, rows):
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _run(spark, src, out, ckpt, build):
    events = (spark.readStream
              .schema("user_id string, event_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = (build(events)
         .writeStream.format("parquet").outputMode("append")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.read.parquet(str(out)).collect()


def test_windowed_counts_append_on_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    # batch 1: three events in the 10:00 window, one in 11:00
    _write_batch(str(src), "b1.json", [
        {"user_id": "u1", "event_id": 1, "ts": "2024-01-01T10:05:00"},
        {"user_id": "u1", "event_id": 2, "ts": "2024-01-01T10:20:00"},
        {"user_id": "u2", "event_id": 3, "ts": "2024-01-01T10:40:00"},
        {"user_id": "u1", "event_id": 4, "ts": "2024-01-01T11:10:00"},
    ])
    # batch 2: a late u1 event for the 10:00 window (inside the 1h
    # watermark) + an event far enough ahead to close both earlier windows
    _write_batch(str(src), "b2.json", [
        {"user_id": "u1", "event_id": 5, "ts": "2024-01-01T10:50:00"},
        {"user_id": "u2", "event_id": 6, "ts": "2024-01-01T13:30:00"},
    ])
    rows = _run(spark, src, out, ckpt,
                lambda ev: windowed_counts(ev, "ts", "user_id",
                                           window="1 hour",
                                           watermark="1 hour"))
    got = {(str(r.window_start), r.user_id): r.n_events for r in rows}
    # the late event_id=5 still counted into u1's 10:00 window
    assert got[("2024-01-01 10:00:00", "u1")] == 3
    assert got[("2024-01-01 10:00:00", "u2")] == 1
    assert got[("2024-01-01 11:00:00", "u1")] == 1
    # the 13:00 window is still open (watermark 12:30) -> not emitted
    assert ("2024-01-01 13:00:00", "u2") not in got


def test_dedup_stream_drops_replays(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _write_batch(str(src), "b1.json", [
        {"user_id": "u1", "event_id": 1, "ts": "2024-01-01T10:00:00"},
        {"user_id": "u1", "event_id": 1, "ts": "2024-01-01T10:00:00"},
        {"user_id": "u1", "event_id": 2, "ts": "2024-01-01T10:01:00"},
    ])
    # replay of event 1 in a later micro-batch, inside the horizon
    _write_batch(str(src), "b2.json", [
        {"user_id": "u1", "event_id": 1, "ts": "2024-01-01T10:00:30"},
        {"user_id": "u1", "event_id": 3, "ts": "2024-01-01T10:02:00"},
    ])
    rows = _run(spark, src, out, ckpt,
                lambda ev: dedup_stream(ev, ["user_id", "event_id"], "ts",
                                        watermark="1 hour"))
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3]


def test_stream_static_enrichment_join(spark, tmp_path):
    """Streaming windowed counts enriched with a static dimension: the
    stream side shuffles on the state key; the static side broadcasts per
    micro-batch (re-read each trigger, so dim updates are picked up)."""
    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _write_batch(str(src), "b1.json", [
        {"user_id": "u1", "event_id": 1, "ts": "2024-01-01T10:05:00"},
        {"user_id": "u2", "event_id": 2, "ts": "2024-01-01T10:10:00"},
        {"user_id": "u1", "event_id": 3, "ts": "2024-01-01T13:00:00"},
    ])
    dim = spark.createDataFrame(
        [("u1", "pro"), ("u2", "free")], "user_id string, tier string")

    def build(ev):
        counts = windowed_counts(ev, "ts", "user_id",
                                 window="1 hour", watermark="1 hour")
        return counts.join(F.broadcast(dim), "user_id")

    rows = _run(spark, src, out, ckpt, build)
    got = {(r.user_id, str(r.window_start)): r.tier for r in rows}
    assert got[("u1", "2024-01-01 10:00:00")] == "pro"
    assert got[("u2", "2024-01-01 10:00:00")] == "free"
