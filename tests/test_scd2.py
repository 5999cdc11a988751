"""pipeline/scd2.py: SCD2 snapshots, fold-vs-snapshot invisibility under
monotonic (CDC-ordered) batches, touched-key discipline, point-in-time
reads, crash healing."""

import random

from pyspark.sql import functions as F

from rassengine_spark.pipeline.scd2 import (merge_scd2, read_scd2,
                                            scd2_as_of, scd2_snapshot)

KEY, ATTR = ["k"], ["a"]


def _obs(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, ts int, seq long")


def _snap_set(spark, rows):
    return {(r.k, r.a, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_snapshot(_obs(spark, rows), KEY, ATTR,
                                   "ts", "seq").drop("_seq").collect()}


def _store_set(spark, path, batches):
    for b in batches:
        merge_scd2(spark, str(path), _obs(spark, b), KEY, ATTR, "ts", "seq")
    return {(r.k, r.a, r.valid_from, r.valid_to, r.is_current)
            for r in read_scd2(spark, str(path)).collect()}


def test_snapshot_compresses_and_closes_intervals(spark):
    rows = [(1, "x", 10, 0), (1, "x", 20, 1),    # duplicate regime
            (1, "y", 30, 2),                     # change
            (2, "z", 5, 3)]                      # other key
    assert _snap_set(spark, rows) == {
        (1, "x", 10, 30, False), (1, "y", 30, None, True),
        (2, "z", 5, None, True)}


def test_same_ts_ties_break_on_seq(spark):
    rows = [(1, "x", 10, 1), (1, "y", 10, 2)]    # same ts: seq orders
    assert _snap_set(spark, rows) == {
        (1, "x", 10, 10, False), (1, "y", 10, None, True)}


def test_null_attr_is_a_regime(spark):
    rows = [(1, None, 10, 0), (1, "x", 20, 1), (1, None, 30, 2)]
    assert _snap_set(spark, rows) == {
        (1, None, 10, 20, False), (1, "x", 20, 30, False),
        (1, None, 30, None, True)}


def test_folds_equal_snapshot_and_skip_untouched(spark, tmp_path):
    b1 = [(1, "x", 10, 0), (2, "p", 10, 1)]
    b2 = [(1, "x", 20, 2),     # repeats current attrs: compresses away
          (1, "y", 30, 3)]     # closes x at 30; key 2 untouched
    got = _store_set(spark, tmp_path / "s", [b1, b2])
    assert got == _snap_set(spark, b1 + b2)
    assert (2, "p", 10, None, True) in got
    assert (1, "x", 10, 30, False) in got and (1, "y", 30, None, True) in got


def test_random_fold_sequences_equal_snapshot(spark, tmp_path):
    rng = random.Random(13)
    rows = []
    seq = 0
    for ts in range(0, 50, 5):       # global ts order => CDC contract
        for k in range(4):
            if rng.random() < 0.7:
                rows.append((k, rng.choice("abc"), ts, seq))
                seq += 1
    want = _snap_set(spark, rows)
    for trial in range(2):
        cut1 = len(rows) // 3
        cut2 = 2 * len(rows) // 3
        batches = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
        got = _store_set(spark, tmp_path / f"t{trial}", batches)
        assert got == want, trial


def test_as_of_point_in_time(spark):
    rows = [(1, "x", 10, 0), (1, "y", 30, 1), (2, "z", 40, 2)]
    snap = scd2_snapshot(_obs(spark, rows), KEY, ATTR, "ts", "seq")
    at_20 = {(r.k, r.a) for r in scd2_as_of(snap, 20).collect()}
    assert at_20 == {(1, "x")}
    at_35 = {(r.k, r.a) for r in scd2_as_of(snap, 35).collect()}
    assert at_35 == {(1, "y")}
    at_40 = {(r.k, r.a) for r in scd2_as_of(snap, 40).collect()}
    assert at_40 == {(1, "y"), (2, "z")}


def test_fold_crash_heals(spark, tmp_path):
    import os
    import shutil

    p = tmp_path / "s"
    _store_set(spark, p, [[(1, "x", 10, 0)]])
    data = str(p / "data")
    shutil.move(data, data + ".__fold_bak")   # crash between renames
    got = {(r.k, r.a, r.is_current)
           for r in read_scd2(spark, str(p)).collect()}
    assert got == {(1, "x", True)}
    assert not os.path.exists(data + ".__fold_bak")
