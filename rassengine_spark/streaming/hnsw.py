"""Streaming HNSW index maintenance: every micro-batch of new vectors
becomes fresh immutable shard graphs in the persisted store
(``llmops/hnsw.py``'s Lucene-segment pattern) — ANN serving
(``hnsw_topk_from_store_df``) stays fresh as the corpus grows, with the
stream holding ZERO state.

Exactly-once WITHOUT versioned copies (a graph store is too big to
copy-on-write per batch): each batch writes its shards into a
DETERMINISTIC part_id namespace derived from the batch id, through
dynamic partition overwrite (``append_hnsw_index_at``). A replayed batch
therefore REWRITES exactly its own shard directories instead of
duplicating them — idempotent by construction, like the vocabulary
store's anti-join — so the commit marker is a replay-skip optimization
plus the usual foreign-checkpoint lineage guard. A crash between the
shard write and the marker commit is repaired by simply re-running the
batch.

Layout: ``out_dir/graphs`` is the parquet shard store (part_id=* dirs);
``out_dir/LATEST.json`` the marker. Serve with
``hnsw_topk_from_store_df(spark, os.path.join(out_dir, "graphs"), ...)``
or the `read path` helper below. Periodic ``save_hnsw_index`` over the
full corpus plays the compaction role when the shard count grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..llmops.hnsw import _SUBSHARD_STRIDE, append_hnsw_index_at
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id

# per-batch part_id namespace: batch b owns [(b+1)*STRIDE, (b+2)*STRIDE).
# With the appender's fixed 8 build partitions each batch needs
# 8 * _SUBSHARD_STRIDE = 8192 ids; 1 << 16 leaves 8x headroom. part_id
# is BIGINT in the store schema, so the namespace never exhausts in
# practice (2^47 batches) — note the streaming checkpoint's batch_id
# only ever grows; compaction resets the STORE's part ids but not the
# batch counter, so an int32 id would eventually have overflowed.
_BATCH_STRIDE = 1 << 16


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_hnsw_stream_id")


def stream_hnsw_append(spark: SparkSession, input_dir: str, out_dir: str,
                       checkpoint_dir: str, vec_col: str = "embedding",
                       id_col: str = "vec_id", m: int = 8,
                       ef_construction: int = 64,
                       max_files_per_trigger: int = 16,
                       available_now: bool = True):
    """Start the HNSW-maintenance stream over JSON-lines files of vector
    rows (``id_col`` bigint, ``vec_col`` array<double>); returns the
    StreamingQuery. Each committed batch appends its vectors as new
    shard graphs in its own part_id namespace; serving reads
    ``out_dir/graphs`` at any moment."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(out_dir, exist_ok=True)
    graphs = os.path.join(out_dir, "graphs")
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {vec_col} array<double>")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(out_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"HNSW store in {out_dir} was built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the store dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return      # replayed batch (re-append would be idempotent)
        append_hnsw_index_at(batch_df, vec_col, id_col, graphs,
                             part_offset=(batch_id + 1) * _BATCH_STRIDE,
                             m=m, ef_construction=ef_construction)
        _commit_marker(out_dir, {"max_batch_id": batch_id,
                                 "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hnsw_graphs_path(out_dir: str) -> str:
    """The parquet shard-store path to hand hnsw_topk_from_store[_df]."""
    return os.path.join(out_dir, "graphs")


# static assertion of the namespace math: one batch can never reach into
# the next batch's id range (8 build partitions x subshard stride, plus
# chunk indexes strictly below the stride)
assert 8 * _SUBSHARD_STRIDE <= _BATCH_STRIDE
