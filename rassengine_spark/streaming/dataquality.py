"""Streaming data-quality counter maintenance: every micro-batch of
ingested rows folds its constraint counters (num/den per check) into the
persisted DQ store (``llmops/dataquality.py``) as one O(batch) named
delta — the quality dashboard reads an always-consistent report while
ingest runs, and history files are never rewritten.

Protocol (init-empty-base, named-delta folds, lineage guard, replay
no-ops, one-shot-store attach): ``streaming/counters.py`` — the shared
harness every counter-store maintainer rides.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..llmops.dataquality import (Check, append_dq_counters,
                                  save_dq_counters)
from .counters import stream_counter_maintenance


def stream_dq_counters_maintenance(spark: SparkSession, input_dir: str,
                                   store_dir: str, checkpoint_dir: str,
                                   schema: str, checks: list[Check],
                                   buckets: int = 8,
                                   max_files_per_trigger: int = 16,
                                   available_now: bool = True):
    """Start the DQ counter-maintenance stream over JSON-lines files of
    ``schema`` rows; returns the StreamingQuery. The check suite (and
    its pass thresholds) is recorded by the empty init build; a store
    already built one-shot via ``save_dq_counters`` is attached to (the
    batch suite must match — append_dq_counters validates), never
    rebuilt over. Run ``compact_dq_counters`` as a separate maintenance
    job — it and this stream are the SAME single writer (serialize
    them)."""

    def init() -> None:
        save_dq_counters(spark.createDataFrame([], schema), checks,
                         store_dir, buckets=buckets)

    def append(batch_df, delta_name: str) -> None:
        append_dq_counters(batch_df, checks, store_dir,
                           delta_name=delta_name)

    return stream_counter_maintenance(
        spark, input_dir, store_dir, checkpoint_dir, schema, init,
        append, "_dq_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
