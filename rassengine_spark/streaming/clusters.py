"""Streaming duplicate-cluster maintenance: every micro-batch of
near-dup PAIRS (e.g. streaming/dedup.py's quarantine output, or any
pair-producing job) folds into the persisted cluster store
(``llmops/dedup.py::merge_cluster_store``) — so "which docs are the
same" is answerable fresh at any moment without re-clustering history,
and the stream holds ZERO state (the store IS the state, shared with
the batch tier, like every maintenance stream here).

Exactly-once with the copy-on-write discipline of streaming/rollup.py:
versioned fold dirs + one atomic LATEST.json commit + replay skip +
foreign-checkpoint rejection. Clusters add one extra safety property
the rollups don't have: folding the SAME pairs twice is a no-op by
construction (edges are idempotent for connectivity), so even a
hypothetical double-fold could not corrupt the store — the versioning
here protects against torn writes, not double counting.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..llmops.dedup import merge_cluster_store, read_cluster_store
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_clusters_stream_id")


def read_stream_clusters(spark: SparkSession, clusters_dir: str) -> DataFrame:
    """(node, root, cluster_size) from the COMMITTED version."""
    state = _load_marker(clusters_dir)
    if state is None:
        raise FileNotFoundError(
            f"no committed cluster version under {clusters_dir}")
    return read_cluster_store(
        spark, os.path.join(clusters_dir, "versions",
                            f"v{state['version']}", "clusters"))


def stream_cluster_maintenance(spark: SparkSession, input_dir: str,
                               clusters_dir: str, checkpoint_dir: str,
                               src: str = "id_a", dst: str = "id_b",
                               max_files_per_trigger: int = 16,
                               available_now: bool = True):
    """Start the cluster-maintenance stream over JSON-lines files of
    pair rows (``src`` bigint, ``dst`` bigint); returns the
    StreamingQuery. Any extra columns ride along and are ignored."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(clusters_dir, exist_ok=True)
    raw = (spark.readStream.format("json")
           .schema(f"{src} long, {dst} long")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = _load_marker(clusters_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"clusters in {clusters_dir} were built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the cluster dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch: already committed
        n = (state["version"] + 1) if state else 1
        prev = (os.path.join(clusters_dir, "versions",
                             f"v{state['version']}", "clusters")
                if state else None)
        vdir = os.path.join(clusters_dir, "versions", f"v{n}")
        shutil.rmtree(vdir, ignore_errors=True)   # crashed earlier try
        merge_cluster_store(sp, os.path.join(vdir, "clusters"),
                            batch_df, src=src, dst=dst, src_path=prev)
        _commit_marker(clusters_dir, {"version": n, "max_batch_id": batch_id,
                                      "stream_id": sid})
        vroot = os.path.join(clusters_dir, "versions")
        for d in os.listdir(vroot):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < n - 1:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
