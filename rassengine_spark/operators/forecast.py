"""Time-series forecasting: Holt's linear-trend double exponential
smoothing (Holt 1957, public method) in exact integer micro-units — the
forecasting member of the events-analytics family (EWMA smooths,
volume-anomaly flags, THIS extrapolates).

Engine-exactness (the pagerank_micro convention): the recurrence

    l_t = (a·y_t + (100-a)·(l_{t-1} + b_{t-1})) / 100
    b_t = (g·(l_t - l_{t-1}) + (100-g)·b_{t-1}) / 100
    init: l_1 = y_1,  b_1 = y_2 - y_1   (classic two-point init,
                                         recurrence runs from t = 2)
    forecast: f_h = l_n + h·b_n

runs entirely on BIGINT micro-units with percent-integer smoothing
weights; the division is an explicit floor (computed through doubles,
exact for |x| < 2^53 — micro-unit daily volumes sit far below that), so
every step is bit-identical in any engine and the SQL oracle replays
the same recurrence as a recursive CTE.

Shape at 100 TB: the heavy lift is the (series, bucket) hash-aggregate
that builds daily volumes — one shuffle with map-side combine. The
recurrence itself folds each series' bounded bucket array (days × 8
bytes) inside one row; series are independent rows, so a million series
parallelize trivially and nothing ever sorts globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _floordiv100(x: Column) -> Column:
    # exact for |x| < 2^53; floor (not truncate) so negative trends
    # round identically in both engines
    return F.floor(x.cast("double") / 100.0).cast("long")


def holt_forecast_micro(series: DataFrame, key_col: str, t_col: str,
                        y_col: str, horizons: int = 7,
                        alpha_pct: int = 50, beta_pct: int = 30
                        ) -> DataFrame:
    """(key, h, forecast_micro, level_micro, trend_micro, n_obs) for
    h = 1..horizons, from one observation row (key, t, y) per bucket
    per series. Buckets fold in t order; series with fewer than 2
    observations are dropped (no trend to estimate). ``y`` is cast to
    micro-units as round(y * 1e6)."""
    if not (0 < alpha_pct <= 100 and 0 < beta_pct <= 100):
        raise ValueError(f"alpha_pct/beta_pct must be in (0, 100], got "
                         f"{alpha_pct}/{beta_pct}")
    if horizons < 1:
        raise ValueError(f"horizons must be >= 1, got {horizons}")
    ym = F.round(F.col(y_col).cast("double") * MICRO, 0).cast("long")
    obs = series.select(F.col(key_col).alias("k"),
                        F.col(t_col).alias("t"), ym.alias("y"))
    arr = (obs.groupBy("k")
           .agg(F.array_sort(F.collect_list(F.struct("t", "y")))
                .alias("a"),
                F.count(F.lit(1)).alias("n_obs"))
           .filter(F.col("n_obs") >= 2))

    a, g = alpha_pct, beta_pct
    init = F.struct(
        F.element_at(F.col("a"), 1)["y"].alias("l"),
        (F.element_at(F.col("a"), 2)["y"]
         - F.element_at(F.col("a"), 1)["y"]).alias("b"))

    def step(acc, x):
        l_new = _floordiv100(a * x["y"] + (100 - a) * (acc["l"] + acc["b"]))
        b_new = _floordiv100(g * (l_new - acc["l"]) + (100 - g) * acc["b"])
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    state = F.aggregate(F.slice(F.col("a"), 2, F.size(F.col("a")) - 1),
                        init, step)
    fitted = arr.select("k", "n_obs", state["l"].alias("level_micro"),
                        state["b"].alias("trend_micro"))
    hs = F.explode(F.sequence(F.lit(1), F.lit(horizons))).alias("h")
    return (fitted.select("k", "n_obs", "level_micro", "trend_micro", hs)
            .select(F.col("k").alias(key_col), F.col("h"),
                    (F.col("level_micro")
                     + F.col("h") * F.col("trend_micro"))
                    .alias("forecast_micro"),
                    "level_micro", "trend_micro", "n_obs"))


def holt_backtest_micro(series: DataFrame, key_col: str, t_col: str,
                        y_col: str, alpha_pct: int = 50,
                        beta_pct: int = 30) -> DataFrame:
    """(key, n_steps, sae_micro, mae_micro) — in-sample one-step-ahead
    backtest of the same recurrence: at each fold step the PRIOR state
    forecasts l+b, the absolute error against the incoming bucket
    accumulates (exact integer sum), THEN the state updates. The
    standard walk-forward evaluation of a forecaster, with mae =
    sae / n_steps floor-divided in micro-units — all integers, so the
    oracle replays it verbatim."""
    if not (0 < alpha_pct <= 100 and 0 < beta_pct <= 100):
        raise ValueError(f"alpha_pct/beta_pct must be in (0, 100], got "
                         f"{alpha_pct}/{beta_pct}")
    ym = F.round(F.col(y_col).cast("double") * MICRO, 0).cast("long")
    obs = series.select(F.col(key_col).alias("k"),
                        F.col(t_col).alias("t"), ym.alias("y"))
    arr = (obs.groupBy("k")
           .agg(F.array_sort(F.collect_list(F.struct("t", "y")))
                .alias("a"),
                F.count(F.lit(1)).alias("n_obs"))
           .filter(F.col("n_obs") >= 3))

    a, g = alpha_pct, beta_pct
    init = F.struct(
        F.element_at(F.col("a"), 1)["y"].alias("l"),
        (F.element_at(F.col("a"), 2)["y"]
         - F.element_at(F.col("a"), 1)["y"]).alias("b"),
        F.lit(0).cast("long").alias("sae"))

    def step(acc, x):
        err = F.abs(x["y"] - (acc["l"] + acc["b"]))
        l_new = _floordiv100(a * x["y"] + (100 - a) * (acc["l"] + acc["b"]))
        b_new = _floordiv100(g * (l_new - acc["l"]) + (100 - g) * acc["b"])
        return F.struct(l_new.alias("l"), b_new.alias("b"),
                        (acc["sae"] + err).alias("sae"))

    state = F.aggregate(F.slice(F.col("a"), 2, F.size(F.col("a")) - 1),
                        init, step)
    n_steps = (F.col("n_obs") - 1).cast("long")
    return arr.select(
        F.col("k").alias(key_col), n_steps.alias("n_steps"),
        state["sae"].alias("sae_micro"),
        F.floor(state["sae"].cast("double")
                / n_steps.cast("double")).cast("long").alias("mae_micro"))
