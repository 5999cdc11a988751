"""Stream-stream interval join: in-window matches join, out-of-window
don't, and leftOuter emits unmatched rows once the watermark closes them."""

import json
import os

from rassengine_spark.streaming.joins import (attribution_join,
                                              stream_stream_interval_join)


def _write(d, name, rows):
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _streams(spark, imp_dir, clk_dir):
    imps = (spark.readStream
            .schema("user_id string, imp_id long, imp_ts timestamp")
            .json(str(imp_dir)))
    clks = (spark.readStream
            .schema("user_id string, click_id long, click_ts timestamp")
            .json(str(clk_dir)))
    return imps, clks


def _run(df, out, ckpt):
    q = (df.writeStream.format("parquet").outputMode("append")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_attribution_inner_join_interval(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    _write(str(imp_dir), "b1.json", [
        {"user_id": "u1", "imp_id": 1, "imp_ts": "2024-01-01T10:00:00"},
        {"user_id": "u2", "imp_id": 2, "imp_ts": "2024-01-01T10:00:00"},
    ])
    _write(str(clk_dir), "b1.json", [
        # u1 clicks 10 min after the impression -> attributed
        {"user_id": "u1", "click_id": 11, "click_ts": "2024-01-01T10:10:00"},
        # u2 clicks 2 h later -> outside the 30-min window
        {"user_id": "u2", "click_id": 12, "click_ts": "2024-01-01T12:00:00"},
        # u1 clicks BEFORE the impression -> not attributed
        {"user_id": "u1", "click_id": 13, "click_ts": "2024-01-01T09:55:00"},
    ])
    imps, clks = _streams(spark, imp_dir, clk_dir)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run(attribution_join(imps, clks), out, ckpt)
    rows = spark.read.parquet(str(out)).collect()
    assert [(r.imp_id, r.click_id, r.delay_sec) for r in rows] == \
        [(1, 11, 600)]


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    _write(str(imp_dir), "b1.json", [
        {"user_id": "u1", "imp_id": 1, "imp_ts": "2024-01-01T10:00:00"},
        {"user_id": "u2", "imp_id": 2, "imp_ts": "2024-01-01T10:00:00"},
        # far-future impression pushes the watermark past u1/u2 state
        {"user_id": "zz", "imp_id": 9, "imp_ts": "2024-01-01T20:00:00"},
    ])
    _write(str(clk_dir), "b1.json", [
        {"user_id": "u1", "click_id": 11, "click_ts": "2024-01-01T10:05:00"},
        # click watermark must advance too (min of both gates eviction)
        {"user_id": "zz", "click_id": 99, "click_ts": "2024-01-01T20:00:00"},
    ])
    imps, clks = _streams(spark, imp_dir, clk_dir)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    _run(stream_stream_interval_join(
        imps, clks, "user_id", "imp_ts", "click_ts",
        within="30 minutes", left_watermark="1 hour",
        right_watermark="1 hour", how="leftOuter"), out, ckpt)
    rows = {r.imp_id: r.click_id
            for r in spark.read.parquet(str(out)).collect()}
    assert rows[1] == 11          # matched
    assert rows[2] is None        # u2 never clicked -> outer row with null
