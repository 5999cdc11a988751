"""Streaming percentile-threshold maintenance: every micro-batch of
scored rows folds its per-group score histogram into the persisted
counter store (``llmops/splits.py::append_score_hist``) — curators serve
exact drop-ppm thresholds (``quantile_thresholds_from_store``) against a
consistent snapshot while the corpus grows, and history files are never
rewritten.

Same exactly-once discipline as the boilerplate counter stream
(``streaming/boilerplate.py``): counters are ADDITIVE, replay safety
comes from NAMING (delta ``b{batch_id}`` — an uncommitted crash rewrites
the orphan, an already-committed name is a pure no-op inside
append_counters), and the commit marker guards foreign-checkpoint
lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..llmops.splits import append_score_hist, save_score_hist
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_scorehist_stream_id")


def stream_score_hist_maintenance(spark: SparkSession, input_dir: str,
                                  hist_dir: str, checkpoint_dir: str,
                                  score_col: str = "score",
                                  group_col: str = "lang",
                                  buckets: int = 32,
                                  max_files_per_trigger: int = 16,
                                  available_now: bool = True):
    """Start the histogram-maintenance stream over JSON-lines files of
    scored rows (``score_col`` bigint, ``group_col`` string); returns
    the StreamingQuery. The first committed batch builds the store
    (save_score_hist, recording the column names); every later batch
    appends one manifest-committed delta named by its batch id. Run
    ``counter_store.compact_counters`` as a separate maintenance job —
    it and this stream are the SAME single writer (serialize them)."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(hist_dir, exist_ok=True)
    raw = (spark.readStream.format("json")
           .schema(f"{score_col} long, {group_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(hist_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"score-histogram store in {hist_dir} was built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the hist dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return        # replayed batch: its delta is already committed
        if state is None:
            # first COMMITTED batch builds the base (keyed on the
            # marker, not manifest existence — a crash between save and
            # marker makes the replay rebuild v1, never double-count)
            save_score_hist(batch_df, score_col, group_col, hist_dir,
                            buckets=buckets)
        else:
            append_score_hist(batch_df, hist_dir,
                              delta_name=f"b{batch_id}")
        _commit_marker(hist_dir, {"max_batch_id": batch_id,
                                  "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
