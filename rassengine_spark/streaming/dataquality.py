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


def stream_psi_current_maintenance(spark: SparkSession, input_dir: str,
                                   store_dir: str, checkpoint_dir: str,
                                   schema: str,
                                   max_files_per_trigger: int = 16,
                                   available_now: bool = True):
    """Maintain the 'cur' side of a persisted PSI drift store
    (``llmops/dataquality.py::save_psi_counters``) from JSON-lines
    micro-batches: each batch's (group, bin) counts fold as one O(batch)
    named delta, and ``psi_report_from_counters`` reads an
    always-consistent gate while ingest runs.

    Unlike the other counter streams there is NO empty-init path: the
    baseline side MUST exist first (a PSI against an absent baseline is
    meaningless), so a missing manifest is a loud error, and the bin
    grid comes from that manifest — the stream cannot diverge from the
    baseline's binning."""
    import os

    from ..llmops.dataquality import append_psi_current

    if not os.path.exists(os.path.join(store_dir, "manifest.json")):
        raise FileNotFoundError(
            f"no PSI baseline store at {store_dir}: build one with "
            "save_psi_counters(reference_snapshot, ...) before "
            "streaming the current side into it")

    def init() -> None:    # unreachable: manifest presence checked above
        raise AssertionError("PSI stream requires a pre-built baseline")

    def append(batch_df, delta_name: str) -> None:
        append_psi_current(batch_df, store_dir, delta_name=delta_name)

    return stream_counter_maintenance(
        spark, input_dir, store_dir, checkpoint_dir, schema, init,
        append, "_psi_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
