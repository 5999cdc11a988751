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


def ewma_half(df: DataFrame, part_col: str, order_col: str, val_col: str,
              max_lag: int = 50, round_to: int = 4) -> DataFrame:
    """Exponentially-weighted moving average with decay 1/2 over each
    partition's ordered rows: ewma_t = Σ_{s<=t} x_s·2^(s−t) / Σ 2^(s−t),
    truncated at `max_lag` trailing rows (2^-50 is far below any
    rounding anyway, and it bounds the shift) — the smoothing baseline
    for trend/anomaly monitors.

    Engine-exactness is the design driver (the reason for decay = 1/2
    exactly): each weight is a power of two, so x·w is an EXACT fp
    scaling (integer shift, no pow()), and both folds run in explicit
    s-order (array_sort + F.aggregate here, SUM(... ORDER BY s) in the
    SQL twin) — a plain window SUM would let each engine associate the
    additions differently. Scale: one hash-agg shuffle is assumed done
    upstream (df is the per-(part, step) frame, e.g. a daily rollup);
    the self-join fans each row out max_lag+1 times and re-aggregates —
    rows here are partitions x steps, tiny relative to the fact table.

    `order_col` must be unique within each partition (the contract of a
    rollup frame): row_number() ties would otherwise make _t — and the
    weights — nondeterministic. The final groupBy keys on the ordinal
    _t, so duplicate (order, val) rows surface as duplicate output rows
    rather than silently merging. Returns (part, order, val, ewma)."""
    if not 0 <= max_lag <= 62:
        # shiftleft on a JVM long is mod-64: 1 << 64 wraps to 1 and the
        # weights go silently wrong, so refuse instead
        raise ValueError(f"max_lag must be in [0, 62], got {max_lag}")
    w = Window.partitionBy("_p").orderBy("_o")
    idx = df.select(F.col(part_col).alias("_p"),
                    F.col(order_col).alias("_o"),
                    F.col(val_col).alias("_x")) \
            .withColumn("_t", F.row_number().over(w) - 1)
    a = idx.select(F.col("_p"), F.col("_o"), F.col("_x"), F.col("_t"))
    b = idx.select(F.col("_p").alias("_bp"), F.col("_t").alias("_s"),
                   F.col("_x").alias("_bx"))
    # 1 << lag as an expression (F.shiftleft takes only a literal count)
    wgt = F.lit(1.0) / F.expr(
        "cast(shiftleft(cast(1 as bigint), cast(_t - _s as int)) as double)")
    j = (a.join(b, (F.col("_p") == F.col("_bp"))
                & (F.col("_s") <= F.col("_t"))
                & (F.col("_t") - F.col("_s") <= max_lag))
          .select("_p", "_t", "_o", "_x", "_s",
                  (F.col("_bx") * wgt).alias("_term"),
                  wgt.alias("_w")))
    g = (j.groupBy("_p", "_t", "_o", "_x")
          .agg(F.array_sort(F.collect_list(
              F.struct(F.col("_s"), F.col("_term"), F.col("_w"))))
              .alias("_arr")))
    num = F.aggregate("_arr", F.lit(0.0), lambda acc, e: acc + e["_term"])
    den = F.aggregate("_arr", F.lit(0.0), lambda acc, e: acc + e["_w"])
    return g.select(F.col("_p").alias(part_col),
                    F.col("_o").alias(order_col),
                    F.col("_x").alias(val_col),
                    F.round(num / den, round_to).alias("ewma"))
