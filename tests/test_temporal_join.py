"""Tests for operators/temporal_join.py: as-of join (backward, inclusive)
and bucketized interval join (half-open bounds, bucket-spanning windows)."""

import datetime as dt

from rassengine_spark.operators.temporal_join import asof_join, interval_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_backward_inclusive(spark):
    probe = spark.createDataFrame(
        [(1, 7, _ts(10)),       # after builds at :05 and :08 -> :08 wins
         (2, 7, _ts(5)),        # equal ts -> inclusive match
         (3, 7, _ts(1)),        # before any build -> dropped (inner)
         (4, 8, _ts(30))],      # other key, no builds -> dropped
        "event_id long, user_id long, ts timestamp")
    build = spark.createDataFrame(
        [(100, 7, _ts(5)), (101, 7, _ts(8)), (102, 9, _ts(0))],
        "event_id long, user_id long, ts timestamp")
    got = {r.event_id: (r.b_id, r.b_ts)
           for r in asof_join(probe, build, ["user_id"], "ts", "ts",
                              {"event_id": "b_id", "ts": "b_ts"}).collect()}
    assert got == {1: (101, _ts(8)), 2: (100, _ts(5))}


def test_asof_multiple_keys_and_passthrough(spark):
    probe = spark.createDataFrame(
        [(1, 7, "x", _ts(10)), (2, 7, "y", _ts(10))],
        "event_id long, user_id long, kind string, ts timestamp")
    build = spark.createDataFrame(
        [(50, 7, "x", _ts(9)), (51, 7, "y", _ts(8))],
        "event_id long, user_id long, kind string, ts timestamp")
    out = asof_join(probe, build, ["user_id", "kind"], "ts", "ts",
                    {"event_id": "b_id"})
    got = {(r.event_id, r.kind): r.b_id for r in out.collect()}
    assert got == {(1, "x"): 50, (2, "y"): 51}


def test_interval_half_open_and_bucket_span(spark):
    probe = spark.createDataFrame(
        [(1, 7, _ts(0)),        # == start -> in
         (2, 7, _ts(9, 59)),    # just inside
         (3, 7, _ts(10)),       # == end -> OUT (half-open)
         (4, 7, _ts(4)),        # inside both overlapping windows
         (5, 8, _ts(0))],       # other key -> out
        "event_id long, user_id long, ts timestamp")
    # two overlapping 10-min windows for user 7; bucket (60 s) << width,
    # so each interval spans many buckets — exercises the explode path
    ivs = spark.createDataFrame(
        [(900, 7, _ts(0), _ts(10)), (901, 7, _ts(3), _ts(13))],
        "iv_id long, user_id long, w_start timestamp, w_end timestamp")
    out = interval_join(probe, ivs, ["user_id"], "ts",
                        "w_start", "w_end", bucket_seconds=60)
    got = sorted((r.event_id, r.iv_id) for r in out.collect())
    assert got == [(1, 900), (2, 900), (2, 901), (3, 901),
                   (4, 900), (4, 901)]


def test_interval_no_duplicate_pairs_wide_bucket(spark):
    # bucket wider than the interval: interval explodes into 1-2 buckets,
    # probe sits in exactly one -> each qualifying pair appears once
    probe = spark.createDataFrame(
        [(1, 7, _ts(59, 30))], "event_id long, user_id long, ts timestamp")
    ivs = spark.createDataFrame(
        [(900, 7, _ts(59), dt.datetime(2024, 1, 1, 11, 1))],
        "iv_id long, user_id long, w_start timestamp, w_end timestamp")
    out = interval_join(probe, ivs, ["user_id"], "ts",
                        "w_start", "w_end", bucket_seconds=3600)
    assert [(r.event_id, r.iv_id) for r in out.collect()] == [(1, 900)]


def test_asof_forward_direction(spark):
    import datetime as dt
    T = dt.datetime
    probe = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10, 0)), (2, "a", T(2024, 1, 1, 12, 0)),
         (3, "b", T(2024, 1, 1, 10, 0))],
        "pid int, k string, ts timestamp")
    build = spark.createDataFrame(
        [(100, "a", T(2024, 1, 1, 10, 30)), (101, "a", T(2024, 1, 1, 11, 0)),
         (102, "b", T(2024, 1, 1, 9, 0))],
        "bid int, k string, bts timestamp")
    from rassengine_spark.operators.temporal_join import asof_join
    got = {r.pid: r.bid for r in asof_join(
        probe, build, ["k"], "ts", "bts", {"bid": "bid"},
        direction="forward").collect()}
    # pid 1 -> next build at 10:30; pid 2 has none after 12:00 (dropped);
    # pid 3 -> b's only build is before, none after -> dropped
    assert got == {1: 100}


def test_asof_tolerance(spark):
    import datetime as dt
    T = dt.datetime
    probe = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10, 0)), (2, "a", T(2024, 1, 1, 23, 0))],
        "pid int, k string, ts timestamp")
    build = spark.createDataFrame(
        [(100, "a", T(2024, 1, 1, 9, 45))],
        "bid int, k string, bts timestamp")
    from rassengine_spark.operators.temporal_join import asof_join
    within = asof_join(probe, build, ["k"], "ts", "bts", {"bid": "bid"},
                       tolerance_seconds=3600)
    # pid 1 is 15 min after the build row (inside 1h); pid 2 is 13h15m out
    assert {r.pid for r in within.collect()} == {1}
    no_tol = asof_join(probe, build, ["k"], "ts", "bts", {"bid": "bid"})
    assert {r.pid for r in no_tol.collect()} == {1, 2}


def test_asof_forward_inclusive_tie(spark):
    import datetime as dt
    T = dt.datetime
    probe = spark.createDataFrame([(1, "a", T(2024, 1, 1, 10, 0))],
                                  "pid int, k string, ts timestamp")
    build = spark.createDataFrame([(100, "a", T(2024, 1, 1, 10, 0))],
                                  "bid int, k string, bts timestamp")
    from rassengine_spark.operators.temporal_join import asof_join
    for d in ("backward", "forward"):
        got = asof_join(probe, build, ["k"], "ts", "bts", {"bid": "bid"},
                        direction=d).collect()
        assert len(got) == 1 and got[0].bid == 100
