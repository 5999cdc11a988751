"""Streaming per-source boilerplate-counter maintenance: every micro-batch
of crawled documents folds its line counters into the persisted store
(``llmops/boilerplate.py``) as one O(batch) delta — curators query
``boilerplate_from_store`` against an always-consistent snapshot while the
crawl grows, and history files are never rewritten.

Exactly-once discipline: the counters are ADDITIVE (a replayed fold would
double-count, like the rollup/DSIR stores — unlike the anti-joined gram
vocabulary), but here idempotence comes from NAMING, not a marker: the
delta directory is ``b{batch_id}`` — a crash before the manifest commit
leaves an orphan the replay overwrites in place; a crash after it makes
the replayed fold a no-op (append_line_stats returns on an
already-committed name, never rewriting a directory readers can see).
The commit marker
remains as the foreign-checkpoint lineage guard (batch ids from a replaced
checkpoint restart at 0 and would silently overwrite live deltas) and as a
replay fast-path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..llmops.boilerplate import append_line_stats, save_line_stats
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_boilerplate_stream_id")


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
    the StreamingQuery. The first committed batch builds the store
    (save_line_stats, recording min_len/sep/buckets); every later batch
    appends one manifest-committed delta named by its batch id. Run
    ``compact_line_stats`` as a separate maintenance job when the delta
    count grows — compaction and this stream are the SAME single writer
    (serialize them), readers need no coordination."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(stats_dir, exist_ok=True)
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {text_col} string, "
                   f"{source_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(stats_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"line-stats store in {stats_dir} was built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the stats dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return        # replayed batch: its delta is already committed
        if state is None:
            # first COMMITTED batch builds the base; keying on the marker
            # (not manifest existence) keeps a crash between save and
            # marker idempotent — the replay rebuilds v1 with the same
            # rows instead of double-counting them as a delta
            save_line_stats(batch_df, text_col, id_col, source_col,
                            stats_dir, min_len=min_len, sep=sep,
                            buckets=buckets)
        else:
            append_line_stats(batch_df, text_col, id_col, source_col,
                              stats_dir, delta_name=f"b{batch_id}")
        _commit_marker(stats_dir, {"max_batch_id": batch_id,
                                   "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
