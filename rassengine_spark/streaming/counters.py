"""Generic micro-batch maintenance harness for the manifest-committed
LSM counter stores (``llmops/counter_store.py``) — the shared protocol
behind the boilerplate line-counter and percentile-histogram streams, so
a future hardening has ONE copy to fix (the same reason commitlog.py
centralizes the marker files).

Protocol (single writer; counters are ADDITIVE, so replay discipline is
load-bearing):

- at stream START, if the store has no manifest, ``init_fn()`` commits
  an EMPTY base — so every data batch, including the first, folds as a
  delta named ``b{batch_id}``. That naming makes every crash window
  idempotent without having to distinguish "crashed first-batch build"
  from "store built one-shot before the stream": an uncommitted crash
  rewrites the orphan delta, an already-committed name is a pure no-op
  inside append_counters. A pre-existing store (manifest present —
  built one-shot via ``save_*``/``append_*`` or by an earlier stream)
  is ATTACHED to and folded into, never rebuilt over;
- foreign-checkpoint lineage guard: a marker written by a different
  checkpoint means batch ids are not comparable — loud error;
- replay fast-path: batch ids at or below the marker are committed;
- the marker commits last, after the delta's manifest commit.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def stream_counter_maintenance(
        spark: SparkSession, input_dir: str, store_dir: str,
        checkpoint_dir: str, schema: str,
        init_fn: Callable[[], None],
        append_fn: Callable[[DataFrame, str], None],
        marker_filename: str,
        max_files_per_trigger: int = 16,
        available_now: bool = True):
    """Start a counter-store maintenance stream over JSON-lines files of
    ``schema`` rows; returns the StreamingQuery. ``init_fn()`` builds an
    empty store (recording the fold parameters in the manifest);
    ``append_fn(batch, delta_name)`` folds each batch. Compaction
    (``counter_store.compact_counters`` / the per-store wrapper) is the
    SAME single writer — serialize it with the stream; readers need no
    coordination."""
    sid = stream_id(checkpoint_dir, marker_filename)
    os.makedirs(store_dir, exist_ok=True)
    if not os.path.exists(os.path.join(store_dir, "manifest.json")):
        # a crash inside init_fn leaves no manifest -> re-init; after its
        # commit this branch never runs again (no deltas exist before
        # the first batch, so the overwrite window is empty)
        init_fn()
    raw = (spark.readStream.format("json")
           .schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(store_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"counter store in {store_dir} was built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the store dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return        # replayed batch: its delta is already committed
        append_fn(batch_df, f"b{batch_id}")
        _commit_marker(store_dir, {"max_batch_id": batch_id,
                                   "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
