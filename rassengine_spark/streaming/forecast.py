"""Streaming Holt-state maintenance: every micro-batch of bucket
observations folds through the integer recurrence into the persisted
per-series state (``operators/forecast.py`` store tier) — forecasts
(`forecast_from_state`) serve an always-consistent model while volumes
stream in.

Protocol: the shared harness (``streaming/counters.py``) provides the
init-if-missing / lineage-guard / replay-skip discipline; the state
itself is the crash-safe swap store, so each fold is atomic on its own.
CDC contract inherited from `append_holt_buckets`: batches must carry
whole buckets in t order per series (the scd2-maintainer assumption);
an out-of-order bucket fails the batch loudly rather than corrupting
the recurrence. Single writer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.forecast import append_holt_buckets, save_holt_state
from .counters import stream_counter_maintenance


def stream_holt_maintenance(spark: SparkSession, input_dir: str,
                            store_dir: str, checkpoint_dir: str,
                            key_col: str = "k", t_col: str = "t",
                            y_col: str = "y", alpha_pct: int = 50,
                            beta_pct: int = 30,
                            max_files_per_trigger: int = 16,
                            available_now: bool = True):
    """Start the state-maintenance stream over JSON-lines files of
    (key_col string, t_col long, y_col double) bucket rows; returns the
    StreamingQuery."""
    schema = f"{key_col} string, {t_col} long, {y_col} double"

    def init() -> None:
        save_holt_state(spark.createDataFrame([], schema), key_col,
                        t_col, y_col, store_dir, alpha_pct=alpha_pct,
                        beta_pct=beta_pct)

    def append(batch_df, delta_name: str) -> None:
        # skip_stale: a crash between the state swap and the marker
        # commit replays this batch — its buckets are then all
        # at-or-before last_t and must fold to a no-op, not raise
        # forever (review finding, pinned by the crash-replay test)
        append_holt_buckets(spark, batch_df, key_col, t_col, y_col,
                            store_dir, skip_stale=True)

    return stream_counter_maintenance(
        spark, input_dir, store_dir, checkpoint_dir, schema, init,
        append, "_holt_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
