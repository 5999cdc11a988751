"""Window / dedup operators — W1 collapse lives in search.py; here: W2 chat
history, D1 context dedup, D2 per-key file sets (SURVEY.md §2.5, §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from rassengine_spark.util import micros


def last_n_per_key(df: DataFrame, key_col: str, time_col: str, id_col: str,
                   n: int = 10) -> DataFrame:
    """W2: last-N rows per key by time desc, returned in chronological order
    (reference chat history: fetch 10 desc then reverse, app/main.py:2786-2794).

    Spark >=3.5 rewrites rank<=N into WindowGroupLimit: each partition keeps
    an N-heap per key before the shuffle, so state is O(keys x N), not O(rows).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).desc(), F.col(id_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= n).drop("_rn")
              .orderBy(F.col(key_col).asc(), F.col(time_col).asc(),
                       F.col(id_col).asc()))


def dedup_concat_by_key(df: DataFrame, key_col: str, text_col: str,
                        order_col: str, sep: str = "\n") -> DataFrame:
    """D1: context snippets deduped by doc_id, concatenated on collision
    (reference app/main.py:2894-2915). collect_list order is made
    deterministic by sorting the collected structs on `order_col`."""
    pairs = F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(text_col).alias("t")))
    return (df.groupBy(key_col)
              .agg(F.array_join(
                  F.transform(F.array_sort(pairs), lambda s: s["t"]),
                  sep).alias("context")))


def capped_set_per_key(df: DataFrame, key_col: str, item_col: str,
                       cap: int = 5) -> DataFrame:
    """D2: per-key distinct item set, capped (reference per-patient file sets
    capped at MAX_FILES_PER_PATIENT=5, app/main.py:2811-2844)."""
    return (df.groupBy(key_col)
              .agg(F.slice(F.array_sort(F.collect_set(F.col(item_col))),
                           1, cap).alias("items")))


def sessionize(df: DataFrame, key_col: str, time_col: str, id_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    key's previous event exceeds `gap_seconds` — Structured Streaming's
    ``session_window`` semantics, computed in batch via lag + running sum.

    Scale: one shuffle on the key; both windows share the same
    (key, time, id) ordering so Spark evaluates them in a single Window
    physical node — no second sort."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc())
    prev = F.lag(F.col(time_col)).over(w)
    # exact microsecond arithmetic: casting to seconds would truncate the
    # fraction and flip borderline gap comparisons
    is_new = F.when(
        prev.isNull()
        | ((micros(F.col(time_col)) - micros(prev))
           > gap_seconds * 1_000_000), 1).otherwise(0)
    sess_idx = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("session_idx", sess_idx)


def session_stats(df: DataFrame, key_col: str, time_col: str, id_col: str,
                  gap_seconds: int = 1800) -> DataFrame:
    """Per-session aggregate over sessionize(): event count, start/end,
    duration in seconds."""
    s = sessionize(df, key_col, time_col, id_col, gap_seconds)
    return (s.groupBy(key_col, "session_idx")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min(time_col).alias("session_start"),
                  F.max(time_col).alias("session_end"),
                  ((micros(F.max(F.col(time_col)))
                    - micros(F.min(F.col(time_col))))
                   / F.lit(1_000_000)).cast("bigint")
                  .alias("duration_sec")))


def tumbling_counts(df: DataFrame, time_col: str, group_col: str,
                    width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts — the batch twin of
    ``groupBy(window(ts, width), type).count()`` in Structured Streaming
    (the same expression runs under readStream with a watermark)."""
    return (df.groupBy(F.window(F.col(time_col), width).alias("w"),
                       F.col(group_col))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("window_start"),
                      group_col, "n"))


def running_total(df: DataFrame, key_col: str, time_col: str, id_col: str,
                  value_col: str, dec: str = "decimal(18,2)") -> DataFrame:
    """Per-key running sum ordered by (time, id) — an analytic window with a
    rows-unbounded-preceding frame. The value goes through DECIMAL so the
    running sum is exact (and engine-independent) despite double inputs."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(time_col).asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(
        "running_total",
        F.sum(F.col(value_col).cast(dec)).over(w).cast("double"))
