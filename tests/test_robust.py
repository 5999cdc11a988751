"""Theil-Sen trend and MAD outlier gate: hand-computed medians,
corruption resistance, degenerate MAD."""

import pytest

from rassengine_spark.operators.robust import (mad_outliers,
                                               theilsen_trend_micro)


def test_theilsen_exact_on_line(spark):
    rows = [("a", t, 5.0 + 3.0 * t) for t in range(6)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    r = theilsen_trend_micro(df, "k", "t", "y").collect()[0]
    assert r.slope_micro == 3_000_000
    assert r.level_micro == 5_000_000
    assert r.n_obs == 6


def test_theilsen_resists_corruption(spark):
    """One wildly corrupted day out of seven leaves the median slope
    untouched (least squares would move by ~1000x)."""
    rows = [("a", t, 10.0 + 2.0 * t) for t in range(7)]
    rows[3] = ("a", 3, 100000.0)
    df = spark.createDataFrame(rows, "k string, t int, y double")
    r = theilsen_trend_micro(df, "k", "t", "y").collect()[0]
    assert r.slope_micro == 2_000_000


def test_theilsen_lower_median_and_short_series(spark):
    # two points -> single pairwise slope; 1-obs series dropped
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 2, 4.0), ("b", 0, 9.0)],
        "k string, t int, y double")
    got = {r.k: r for r in theilsen_trend_micro(
        df, "k", "t", "y").collect()}
    assert set(got) == {"a"}
    assert got["a"].slope_micro == 1_500_000     # floor(3e6 / 2)


def test_mad_outlier_gate(spark):
    rows = [("a", t, 10.0) for t in range(6)] + [("a", 6, 100.0)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = {r.t: r for r in mad_outliers(df, "k", "t", "y").collect()}
    # median 10, MAD 0 (degenerate): only the deviating day flags
    assert out[6].is_outlier and out[6].deviation_micro == 90_000_000
    assert not any(out[t].is_outlier for t in range(6))
    assert out[0].mad_micro == 0


def test_mad_nondegenerate(spark):
    rows = [("a", t, float(v)) for t, v in
            enumerate([10, 11, 9, 12, 8, 10, 30])]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = {r.t: r for r in mad_outliers(df, "k", "t", "y").collect()}
    # sorted y: 8,9,10,10,11,12,30 -> lower median 10; deviations
    # sorted: 0,0,1,1,2,2,20 -> MAD 1; only 30 exceeds 3 MADs
    assert out[0].median_micro == 10_000_000
    assert out[0].mad_micro == 1_000_000
    assert out[6].is_outlier
    assert sum(1 for r in out.values() if r.is_outlier) == 1
    with pytest.raises(ValueError):
        mad_outliers(df, "k", "t", "y", nmads_pct=0)


def test_null_values_dropped_not_crashed(spark):
    """All-null series vanish; partially-null series score over their
    non-null buckets with a consistent n_obs (review finding)."""
    rows = [("dead", 0, None), ("dead", 1, None),
            ("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    got = {r.k: r for r in theilsen_trend_micro(
        df, "k", "t", "y").collect()}
    assert set(got) == {"a"}
    assert got["a"].n_obs == 2
    assert got["a"].slope_micro == 1_000_000    # (3-1)/(2-0)
    out = mad_outliers(df, "k", "t", "y").collect()
    assert {r.k for r in out} == {"a"}
    assert len(out) == 2


def test_trend_residual_outliers_on_ramp(spark):
    """A steep ramp with one level-shift day: the plain MAD gate flags
    ramp endpoints; the residual gate flags ONLY the shifted day."""
    from rassengine_spark.operators.robust import trend_residual_outliers
    rows = [("a", t, 10.0 + 20.0 * t) for t in range(9)]
    rows[4] = ("a", 4, 10.0 + 20.0 * 4 + 60.0)       # subtle level shift
    df = spark.createDataFrame(rows, "k string, t int, y double")
    got = {r.t: r for r in trend_residual_outliers(
        df, "k", "t", "y").collect()}
    assert got[4].is_outlier
    assert sum(1 for r in got.values() if r.is_outlier) == 1
    # the +60 shift hides inside the ramp's global spread: the plain
    # MAD gate misses it entirely (MAD ~40, deviation only 40-100)
    plain = mad_outliers(df, "k", "t", "y").collect()
    assert not any(r.is_outlier for r in plain)
