"""Stream-stream joins with watermark-bounded state: the attribution /
correlation shape (join two unbounded streams on a key within an
event-time interval).

The reference has no streaming data plane (SURVEY §2.10); this completes
the Structured Streaming tier next to windows.py / sessionize.py with the
remaining first-class stateful operator Spark offers.

Why the interval condition is mandatory at scale: a stream-stream equi-join
with no time bound must keep EVERY past row of both sides in the state
store forever (any future row might still match). With watermarks on both
event-time columns AND a time-range join condition, Spark derives how long
each side's rows can possibly match and evicts state past that horizon —
state is bounded by (arrival rate × interval + watermark), independent of
stream lifetime. Both sides shuffle on the join key into the state store,
so key skew maps to state-store skew: salt upstream or widen
`spark.sql.shuffle.partitions` before the first run (it is fixed for the
checkpoint's lifetime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
        left: DataFrame, right: DataFrame, key_col: str,
        left_time: str, right_time: str,
        within: str = "30 minutes",
        left_watermark: str = "1 hour", right_watermark: str = "1 hour",
        how: str = "inner") -> DataFrame:
    """Join right-stream rows to left-stream rows with the same `key_col`
    where `right_time` falls in [left_time, left_time + within].

    The classic use is attribution: left = impressions, right = clicks,
    `within` = the attribution window. `how='leftOuter'` additionally
    emits unmatched left rows (with null right columns) once the watermark
    proves no match can arrive — outer emission is therefore delayed by
    the watermark, not wrong, when it seems late in testing.

    Column hygiene: both inputs must have disjoint column names apart from
    `key_col` (rename upstream); the duplicate right key is dropped from
    the output.
    """
    lw = left.withWatermark(left_time, left_watermark).alias("l")
    rw = right.withWatermark(right_time, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & F.col(f"r.{right_time}").between(
            F.col(f"l.{left_time}"),
            F.expr(f"l.{left_time} + INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(F.col(f"r.{key_col}"))


def attribution_join(impressions: DataFrame, clicks: DataFrame,
                     key_col: str = "user_id",
                     imp_time: str = "imp_ts", click_time: str = "click_ts",
                     within: str = "30 minutes",
                     watermark: str = "1 hour") -> DataFrame:
    """Impression→click attribution with the matching delay computed:
    inner interval join + `delay_sec` (click minus impression, seconds)."""
    joined = stream_stream_interval_join(
        impressions, clicks, key_col, imp_time, click_time,
        within=within, left_watermark=watermark, right_watermark=watermark)
    return joined.withColumn(
        "delay_sec",
        (F.unix_timestamp(F.col(click_time))
         - F.unix_timestamp(F.col(imp_time))).cast("long"))
