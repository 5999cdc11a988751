"""transformWithState sessionizer: same scenario as the
applyInPandasWithState twin (gap closure + timer closure + checkpoint
restart), so the two APIs are verified semantically interchangeable.

The functional test needs google-protobuf (the v2 state protocol) — absent
in this container, so it skips; the environment-gate tests always run."""

import json
import os

import pytest

from rassengine_spark.streaming.sessionize_v2 import sessionize_stream_v2

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")

try:
    from google.protobuf import descriptor  # noqa: F401
    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


def _write_batch(d, name, rows):
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


@pytest.fixture
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, "")
    spark.conf.set(key, ROCKSDB)
    yield spark
    if old:
        spark.conf.set(key, old)
    else:
        spark.conf.unset(key)


def _run_once(spark, src, out, ckpt):
    events = (spark.readStream.schema("user_id string, ts timestamp")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = (sessionize_stream_v2(events, gap_minutes=30,
                              watermark="10 minutes")
         .writeStream.format("parquet").outputMode("append")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return {(r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in spark.read.parquet(str(out)).collect()}


@pytest.mark.skipif(not HAVE_PROTOBUF,
                    reason="transformWithState needs protobuf")
def test_sessionize_v2_gap_timer_and_restart(rocksdb, tmp_path):
    spark = rocksdb
    src = tmp_path / "events"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _write_batch(str(src), "b1.json", [
        {"user_id": "u1", "ts": "2024-01-01T10:00:00"},
        {"user_id": "u1", "ts": "2024-01-01T10:10:00"},
        {"user_id": "u1", "ts": "2024-01-01T11:00:00"},   # gap 50min -> new
        {"user_id": "u2", "ts": "2024-01-01T10:05:00"},
    ])
    got1 = _run_once(spark, src, out, ckpt)
    # identical expectations to the applyInPandasWithState twin
    assert got1 == {("u1", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
                    ("u2", "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1)}

    _write_batch(str(src), "b2.json", [
        {"user_id": "u3", "ts": "2024-01-01T23:00:00"},
    ])
    got2 = _run_once(spark, src, out, ckpt)
    assert ("u1", "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1) in got2
    assert sum(1 for r in got2 if r[0] == "u2") == 1


def test_sessionize_v2_environment_gates(spark, tmp_path):
    events = (spark.readStream.schema("user_id string, ts timestamp")
              .json(str(tmp_path)))
    if not HAVE_PROTOBUF:
        with pytest.raises(RuntimeError, match="protobuf"):
            sessionize_stream_v2(events)
        return
    if "RocksDB" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""):
        pytest.skip("provider already RocksDB")
    with pytest.raises(RuntimeError, match="RocksDB"):
        sessionize_stream_v2(events)
