"""Streaming percentile-threshold maintenance: every micro-batch of
scored rows folds its per-group score histogram into the persisted
counter store (``llmops/splits.py::append_score_hist``) — curators serve
exact drop-ppm thresholds (``quantile_thresholds_from_store``) against a
consistent snapshot while the corpus grows, and history files are never
rewritten.

Protocol (init-empty-base, named-delta folds, lineage guard, replay
no-ops, one-shot-store attach): ``streaming/counters.py`` — the shared
harness both counter-store maintainers ride.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..llmops.splits import append_score_hist, save_score_hist
from .counters import stream_counter_maintenance


def stream_score_hist_maintenance(spark: SparkSession, input_dir: str,
                                  hist_dir: str, checkpoint_dir: str,
                                  score_col: str = "score",
                                  group_col: str = "lang",
                                  buckets: int = 32,
                                  max_files_per_trigger: int = 16,
                                  available_now: bool = True):
    """Start the histogram-maintenance stream over JSON-lines files of
    scored rows (``score_col`` bigint, ``group_col`` string); returns
    the StreamingQuery. The column names are recorded by the empty init
    build; a store already built one-shot is attached to, not rebuilt.
    Run ``counter_store.compact_counters`` (CLI
    ``table --compact-store scorehist``) as a separate maintenance job —
    it and this stream are the SAME single writer (serialize them)."""
    schema = f"{score_col} long, {group_col} string"

    def init() -> None:
        save_score_hist(spark.createDataFrame([], schema), score_col,
                        group_col, hist_dir, buckets=buckets)

    def append(batch_df, delta_name: str) -> None:
        append_score_hist(batch_df, hist_dir, delta_name=delta_name)

    return stream_counter_maintenance(
        spark, input_dir, hist_dir, checkpoint_dir, schema, init,
        append, "_scorehist_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
