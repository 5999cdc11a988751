"""Streaming KMV sketch-store maintenance: every micro-batch of crawled
documents folds its per-corpus k-min sketch into the persisted store
(``llmops/overlap.py`` store tier) as one O(batch) named delta — corpus
overlap dashboards (`kmv_pairwise_overlap` over `read_kmv_store`) read
an always-consistent snapshot while ingest runs, and history files are
never rewritten.

Protocol (init-empty-base, named-delta folds, lineage guard, replay
no-ops, one-shot-store attach): ``streaming/counters.py`` — the shared
harness every manifest-LSM maintainer rides. Min-merge is additionally
idempotent on VALUES (re-folding the same hashes cannot change a top-k),
so the replay discipline here is belt-and-braces rather than
load-bearing. Folds always sketch at the k the store's MANIFEST records
(a shard sketched with a smaller k could silently drop members of the
global top-k; a larger k is lossless), so attaching to a pre-existing
store with a different ``k`` argument is safe — the manifest wins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..llmops.overlap import append_kmv_shard, kmv_sketch, save_kmv_store
from .counters import stream_counter_maintenance


def stream_kmv_maintenance(spark: SparkSession, input_dir: str,
                           store_dir: str, checkpoint_dir: str,
                           group_col: str = "g", text_col: str = "text",
                           k: int = 256, shingle_n: int = 2,
                           buckets: int = 8,
                           max_files_per_trigger: int = 16,
                           available_now: bool = True):
    """Start the sketch-maintenance stream over JSON-lines files of
    (group_col string, text_col string) rows; returns the
    StreamingQuery. Each batch is sketched (bounded: ≤k hashes per
    group reach the store regardless of batch size) and folded as a
    named delta; ``compact_kmv_store`` is the same single writer —
    serialize it with the stream."""
    schema = f"{group_col} string, {text_col} string"

    def init() -> None:
        empty = spark.createDataFrame(
            [], "g string, hs array<bigint>, n_hashes bigint")
        save_kmv_store(empty, store_dir, k=k, buckets=buckets)

    def append(batch_df, delta_name: str) -> None:
        from ..llmops.counter_store import load_counter_manifest
        mk = int(load_counter_manifest(store_dir)["k"])
        append_kmv_shard(
            kmv_sketch(batch_df, group_col, text_col, k=mk,
                       shingle_n=shingle_n),
            store_dir, delta_name=delta_name, k=mk)

    return stream_counter_maintenance(
        spark, input_dir, store_dir, checkpoint_dir, schema, init,
        append, "_kmv_stream_id",
        max_files_per_trigger=max_files_per_trigger,
        available_now=available_now)
