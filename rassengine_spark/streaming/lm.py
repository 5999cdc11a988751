"""Streaming LM-model maintenance: every micro-batch of reference-corpus
documents folds its bigram/vocab counts into the persisted LM store
(``llmops/lm_score.py`` store tier) as one O(batch) named delta pair —
quality-scoring jobs (`kn_model_from_store` + `kn_bigram_score`) always
read a consistent model while the reference corpus grows, and history
files are never rewritten.

Protocol: ``streaming/counters.py`` harness. The store's TWO counter
tables (bigrams, words) commit in a fixed order under the SAME delta
name ``b{batch_id}``; a crash between the two commits is healed by the
harness's replay (the marker commits last, so the batch replays, the
bigrams append no-ops on its committed name and the words append
completes — the `append_lm_shard` crash-window contract, pytest-pinned).
Counts are ADDITIVE, so the replay-skip marker is load-bearing exactly
as for every counter maintainer. Single writer per store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..llmops.lm_score import append_lm_shard, save_lm_store
from .counters import stream_counter_maintenance


def stream_lm_maintenance(spark: SparkSession, input_dir: str,
                          store_dir: str, checkpoint_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          buckets: int = 8,
                          max_files_per_trigger: int = 16,
                          available_now: bool = True):
    """Start the LM-count maintenance stream over JSON-lines files of
    (id_col long, text_col string) rows; returns the StreamingQuery.
    ``compact_lm_store`` is the same single writer — serialize it with
    the stream."""
    schema = f"{id_col} long, {text_col} string"

    def init() -> None:
        empty = spark.createDataFrame([], schema)
        save_lm_store(empty, text_col, id_col, store_dir, buckets=buckets)

    def append(batch_df, delta_name: str) -> None:
        append_lm_shard(batch_df, text_col, id_col, store_dir,
                        delta_name=delta_name)

    return stream_counter_maintenance(
        spark, input_dir, store_dir, checkpoint_dir, schema, init,
        append, "_lm_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
