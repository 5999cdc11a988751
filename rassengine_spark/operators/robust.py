"""Robust per-series statistics: Theil-Sen trend and MAD outlier days
(Theil 1950 / Sen 1968; Hampel 1974 — public estimators), the
outlier-resistant complements of the Holt/EWMA tier: one corrupted day
moves a least-squares or exponential trend arbitrarily, but Theil-Sen
tolerates ~29% corruption and the median/MAD gate flags exactly the
days a stddev gate lets a fat tail hide.

Engine-exactness: everything is BIGINT micro-units. Slopes are
floor((y_j - y_i) * 1e6 / (t_j - t_i)); the median is the LOWER median
(element ceil(n/2) of the sorted list — deterministic, integer, no
half-sum averaging to disagree over); MAD is the lower median of
absolute deviations. Both engines compute the identical order
statistics, so the oracle is plain SQL window math.

Shapes at 100 TB: series fold bounded per-series arrays inside one row
(the forecast-tier pattern). Theil-Sen is O(n²) pairs per series — by
construction, for BOUNDED buckets per series (days of a rollup:
30-365); it is not a long-horizon estimator and the docstring caps it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
MAX_BUCKETS = 5000        # O(n^2) pairs per series: 5000 -> 12.5M pairs


def _lower_median(sorted_arr: Column) -> Column:
    """Element ceil(n/2) of an ascending array — the deterministic
    integer lower median."""
    n = F.size(sorted_arr)
    return F.element_at(sorted_arr, F.ceil(n / 2).cast("int"))


def theilsen_trend_micro(series: DataFrame, key_col: str, t_col: str,
                         y_col: str) -> DataFrame:
    """(key, n_obs, slope_micro, level_micro) — the Theil-Sen estimator:
    slope = lower median over all pairwise slopes
    floor((y_j - y_i)·1e6 / (t_j - t_i)), level = lower median of
    y_i·1e6 - slope·t_i (the robust intercept, Conover's form).
    ``t`` must be numeric (bucket index / epoch day); series with fewer
    than 2 observations are dropped; more than MAX_BUCKETS raises (the
    pair expansion is quadratic by design — pre-bucket coarser)."""
    # localCheckpoint both the observation frame and its per-series
    # count so the MAX_BUCKETS guard action, the pair self-join, the
    # level join, and the final n_obs output all share ONE scan of the
    # input instead of four (ADVICE r06). Checkpointing drops size
    # stats, so the per-series joins plan as SortMergeJoin on k — the
    # join that survives millions of series at 100 TB (the sf0.001
    # broadcast was small-data luck, not the scale plan).
    obs = series.select(
        F.col(key_col).alias("k"), F.col(t_col).cast("long").alias("t"),
        F.round(F.col(y_col).cast("double") * MICRO, 0).cast("long")
        .alias("y")).filter(F.col("y").isNotNull()) \
        .localCheckpoint(eager=False)
    a, b = obs.alias("a"), obs.alias("b")
    slope = F.floor(
        ((F.col("b.y") - F.col("a.y"))).cast("double")
        / (F.col("b.t") - F.col("a.t")).cast("double")).cast("long")
    pairs = (a.join(b, (F.col("a.k") == F.col("b.k"))
                    & (F.col("a.t") < F.col("b.t")))
             .select(F.col("a.k").alias("k"), slope.alias("s")))
    slopes = (pairs.groupBy("k")
              .agg(_lower_median(F.array_sort(F.collect_list("s")))
                   .alias("slope_micro"),
                   F.count(F.lit(1)).alias("_n_pairs")))
    # n_obs counts the SCORABLE (non-null) buckets obs kept, so the
    # medians and the count agree; an all-null series simply vanishes
    # instead of crashing _lower_median on an empty array
    n_check = (obs.groupBy("k").agg(F.count(F.lit(1)).alias("n_obs"))
               .localCheckpoint(eager=False))
    over = n_check.filter(F.col("n_obs") > MAX_BUCKETS).count()
    if over:
        raise ValueError(
            f"{over} series exceed MAX_BUCKETS={MAX_BUCKETS} buckets — "
            "Theil-Sen is quadratic in buckets per series; aggregate to "
            "coarser buckets first")
    lev = (obs.join(slopes, "k")
           .select("k", (F.col("y")
                         - F.col("slope_micro") * F.col("t"))
                   .alias("r"))
           .groupBy("k")
           .agg(_lower_median(F.array_sort(F.collect_list("r")))
                .alias("level_micro")))
    return (n_check.filter(F.col("n_obs") >= 2)
            .join(slopes.select("k", "slope_micro"), "k")
            .join(lev, "k")
            .select(F.col("k").alias(key_col), "n_obs", "slope_micro",
                    "level_micro"))


def mad_outliers(series: DataFrame, key_col: str, t_col: str,
                 y_col: str, nmads_pct: int = 300) -> DataFrame:
    """(key, t, y_micro, median_micro, mad_micro, deviation_micro,
    is_outlier) — the Hampel gate: a bucket is an outlier when
    |y - median| · 100 > nmads_pct · MAD (default 3 MADs, expressed as
    an integer percent so the comparison is pure BIGINT — no scaled-MAD
    double). MAD = 0 (over half the buckets identical) flags every
    deviating bucket, the standard degenerate-case behavior."""
    if nmads_pct < 1:
        raise ValueError(f"nmads_pct must be >= 1, got {nmads_pct}")
    obs = series.select(
        F.col(key_col).alias("k"), F.col(t_col).alias("t"),
        F.round(F.col(y_col).cast("double") * MICRO, 0).cast("long")
        .alias("y")).filter(F.col("y").isNotNull())
    med = (obs.groupBy("k")
           .agg(_lower_median(F.array_sort(F.collect_list("y")))
                .alias("median_micro")))
    dev = (obs.join(med, "k")
           .select("k", "t", "y", "median_micro",
                   F.abs(F.col("y") - F.col("median_micro"))
                   .alias("deviation_micro")))
    mad = (dev.groupBy("k")
           .agg(_lower_median(F.array_sort(
               F.collect_list("deviation_micro"))).alias("mad_micro")))
    out = dev.join(mad, "k")
    flag = (F.col("deviation_micro") * 100
            > F.lit(nmads_pct) * F.col("mad_micro"))
    return out.select(F.col("k").alias(key_col), "t",
                      F.col("y").alias("y_micro"), "median_micro",
                      "mad_micro", "deviation_micro",
                      flag.alias("is_outlier"))


def trend_residual_outliers(series: DataFrame, key_col: str, t_col: str,
                            y_col: str,
                            nmads_pct: int = 300) -> DataFrame:
    """(key, t, y_micro, resid_micro, resid_median_micro,
    resid_mad_micro, is_outlier) — the Hampel gate applied to residuals
    from the Theil-Sen fit instead of raw values: for a TRENDING series
    the plain median/MAD gate flags the ramp's endpoints as outliers
    (they are far from the global median by construction); detrending
    against the robust line first flags exactly the level-shift days.
    Composition of the two estimators above, same BIGINT math
    throughout (resid = y - (level + slope·t) in micro-units)."""
    if nmads_pct < 1:
        raise ValueError(f"nmads_pct must be >= 1, got {nmads_pct}")
    fit = theilsen_trend_micro(series, key_col, t_col, y_col) \
        .select(F.col(key_col).alias("k"), "slope_micro", "level_micro")
    obs = series.select(
        F.col(key_col).alias("k"), F.col(t_col).cast("long").alias("t"),
        F.round(F.col(y_col).cast("double") * MICRO, 0).cast("long")
        .alias("y")).filter(F.col("y").isNotNull())
    r = (obs.join(fit, "k")
         .select("k", "t", "y",
                 (F.col("y") - (F.col("level_micro")
                                + F.col("slope_micro") * F.col("t")))
                 .alias("r")))
    med = (r.groupBy("k")
           .agg(_lower_median(F.array_sort(F.collect_list("r")))
                .alias("resid_median_micro")))
    dev = (r.join(med, "k")
           .select("k", "t", "y", "r", "resid_median_micro",
                   F.abs(F.col("r") - F.col("resid_median_micro"))
                   .alias("_d")))
    mad = (dev.groupBy("k")
           .agg(_lower_median(F.array_sort(F.collect_list("_d")))
                .alias("resid_mad_micro")))
    out = dev.join(mad, "k")
    flag = (F.col("_d") * 100
            > F.lit(nmads_pct) * F.col("resid_mad_micro"))
    return out.select(F.col("k").alias(key_col), "t",
                      F.col("y").alias("y_micro"),
                      F.col("r").alias("resid_micro"),
                      "resid_median_micro", "resid_mad_micro",
                      flag.alias("is_outlier"))
