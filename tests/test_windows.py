"""Tests for the batch-mode streaming analytics in operators/windows.py:
sessionization, tumbling windows, running totals."""

import datetime as dt

from pyspark.sql import functions as F

from rassengine_spark.operators.windows import (running_total, session_stats,
                                                sessionize, tumbling_counts)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions separated by a 31-minute gap
        (1, 1, base),
        (2, 1, base + dt.timedelta(minutes=10)),
        (3, 1, base + dt.timedelta(minutes=41, seconds=1)),
        (4, 1, base + dt.timedelta(minutes=50)),
        # user 2: single event
        (5, 2, base + dt.timedelta(minutes=5)),
        # user 1: gap of exactly 30min -> same session (strict >)
        (6, 2, base + dt.timedelta(minutes=35)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_semantics(spark):
    ev = _events(spark)
    got = {r.event_id: r.session_idx
           for r in sessionize(ev, "user_id", "ts", "event_id", 1800).collect()}
    assert got[1] == 1 and got[2] == 1        # within 30min
    assert got[3] == 2 and got[4] == 2        # 31:01 gap -> new session
    assert got[5] == 1 and got[6] == 1        # exactly 30min -> SAME session


def test_session_stats(spark):
    ev = _events(spark)
    stats = {(r.user_id, r.session_idx): r
             for r in session_stats(ev, "user_id", "ts", "event_id",
                                    1800).collect()}
    s11 = stats[(1, 1)]
    assert s11.n_events == 2 and s11.duration_sec == 600
    s12 = stats[(1, 2)]
    assert s12.n_events == 2
    assert s12.duration_sec == (50 - 41) * 60 - 1
    assert stats[(2, 1)].n_events == 2


def test_tumbling_counts(spark):
    ev = _events(spark)
    got = {(r.window_start.hour, r.user_id): r.n
           for r in tumbling_counts(ev, "ts", "user_id", "1 hour").collect()}
    assert got[(10, 1)] == 4 and got[(10, 2)] == 2


def test_running_total_exact(spark):
    rows = [(1, 10, dt.datetime(2024, 1, 1), 0.1),
            (2, 10, dt.datetime(2024, 1, 2), 0.2),
            (3, 10, dt.datetime(2024, 1, 3), 0.3),
            (4, 11, dt.datetime(2024, 1, 1), 5.0)]
    df = spark.createDataFrame(
        rows, "id long, k long, t timestamp, v double")
    got = {r.id: r.running_total
           for r in running_total(df, "k", "t", "id", "v").collect()}
    # DECIMAL accumulation: 0.1+0.2 is exactly 0.3 (double sum would drift)
    assert got[2] == 0.3 and got[3] == 0.6 and got[4] == 5.0
