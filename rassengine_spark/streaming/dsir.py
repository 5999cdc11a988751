"""Streaming DSIR density maintenance: every micro-batch of TARGET (or
raw) documents folds its hashed-gram bucket counts into the persisted
density table (``llmops/dsir.py::merge_gram_counts``) — so importance
weights (`importance_weights_from_counts`) are servable fresh at any
moment without re-shingling the corpus history, and the stream holds
ZERO state (the on-disk counts ARE the state, shared with the batch
tier, like every maintenance stream here).

Exactly-once with the copy-on-write discipline of streaming/rollup.py:
versioned fold dirs + one atomic LATEST.json commit + replay skip +
foreign-checkpoint rejection. Unlike the cluster stream, a double-fold
here WOULD corrupt (counts are additive, not idempotent), so the marker
discipline is load-bearing, exactly as for the additive rollups.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..llmops.dsir import merge_gram_counts, read_gram_counts
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_dsir_stream_id")


def read_stream_gram_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """(b, c) from the COMMITTED version."""
    state = _load_marker(counts_dir)
    if state is None:
        raise FileNotFoundError(
            f"no committed gram-counts version under {counts_dir}")
    return read_gram_counts(
        spark, os.path.join(counts_dir, "versions",
                            f"v{state['version']}", "counts"))


def stream_gram_counts_maintenance(spark: SparkSession, input_dir: str,
                                   counts_dir: str, checkpoint_dir: str,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   n: int = 2, n_buckets: int = 8192,
                                   max_files_per_trigger: int = 16,
                                   available_now: bool = True):
    """Start the density-maintenance stream over JSON-lines files of doc
    rows (``id_col`` bigint, ``text_col`` string); returns the
    StreamingQuery. Any extra columns ride along and are ignored. Point
    one instance at the curated TARGET feed (the usual setup — targets
    trickle in as curators bless domains) and, optionally, another at
    the raw firehose; `importance_weights_from_counts` then scores any
    frame against the two committed tables."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(counts_dir, exist_ok=True)
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {text_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = _load_marker(counts_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"gram counts in {counts_dir} were built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the counts dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch: already committed
        nv = (state["version"] + 1) if state else 1
        prev = (os.path.join(counts_dir, "versions",
                             f"v{state['version']}", "counts")
                if state else None)
        vdir = os.path.join(counts_dir, "versions", f"v{nv}")
        shutil.rmtree(vdir, ignore_errors=True)   # crashed earlier try
        merge_gram_counts(sp, os.path.join(vdir, "counts"), batch_df,
                          text_col, id_col, n=n, n_buckets=n_buckets,
                          src_path=prev)
        _commit_marker(counts_dir, {"version": nv, "max_batch_id": batch_id,
                                    "stream_id": sid})
        vroot = os.path.join(counts_dir, "versions")
        for d in os.listdir(vroot):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < nv - 1:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
