"""Streaming per-source boilerplate-counter maintenance: every micro-batch
of crawled documents folds its line counters into the persisted store
(``llmops/boilerplate.py``) as one O(batch) named delta — curators query
``boilerplate_from_store`` against an always-consistent snapshot while the
crawl grows, and history files are never rewritten.

Protocol (init-empty-base, named-delta folds, lineage guard, replay
no-ops, one-shot-store attach): ``streaming/counters.py`` — the shared
harness both counter-store maintainers ride.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..llmops.boilerplate import append_line_stats, save_line_stats
from .counters import stream_counter_maintenance


def stream_line_stats_maintenance(spark: SparkSession, input_dir: str,
                                  stats_dir: str, checkpoint_dir: str,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  source_col: str = "source",
                                  min_len: int = 1, sep: str = "\n",
                                  buckets: int = 32,
                                  max_files_per_trigger: int = 16,
                                  available_now: bool = True):
    """Start the counter-maintenance stream over JSON-lines files of doc
    rows (``id_col`` bigint, ``text_col``/``source_col`` string); returns
    the StreamingQuery. min_len/sep/buckets are recorded by the empty
    init build; a store already built one-shot is attached to, not
    rebuilt. Run ``compact_line_stats`` as a separate maintenance job —
    it and this stream are the SAME single writer (serialize them)."""
    schema = f"{id_col} long, {text_col} string, {source_col} string"

    def init() -> None:
        save_line_stats(spark.createDataFrame([], schema), text_col,
                        id_col, source_col, stats_dir, min_len=min_len,
                        sep=sep, buckets=buckets)

    def append(batch_df, delta_name: str) -> None:
        append_line_stats(batch_df, text_col, id_col, source_col,
                          stats_dir, delta_name=delta_name)

    return stream_counter_maintenance(
        spark, input_dir, stats_dir, checkpoint_dir, schema, init,
        append, "_boilerplate_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
