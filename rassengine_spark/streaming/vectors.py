"""Streaming vector-index maintenance: the IVF sibling of
streaming/index.py — every micro-batch of (id, embedding) rows becomes
an immutable IVF SEGMENT under one root partitioned by
``seg={batch_id}/cell={c}``, so continuous embedding ingest (the
reference's upload path embeds and indexes documents as they arrive,
app/main.py:1211-1282 + 563-572) keeps a servable ANN index without
ever rewriting history.

- The QUANTIZER is part of the index version: centroids are sampled
  from the FIRST batch (md5-deterministic) and persisted; every later
  batch assigns against them — re-deriving centroids from new data
  would silently shift historical cell boundaries (the same rule as the
  batch tier's ``append_ivf_index``).
- Vector UPSERT via TOMBSTONES, not a serve-time window: a re-ingested
  embedding may land in a DIFFERENT cell, so "highest segment wins"
  resolved at serve time would need an unpruned scan to even notice the
  newer copy. Instead each commit writes (id, seg, cell) tombstones for
  every prior copy of its ids — serving reads probed cells plus the
  (tiny) tombstone table and anti-joins, keeping the
  O(N * n_probe / n_cells) IVF contract intact. The commit-time
  tombstone discovery joins batch ids against history once per batch —
  the same O(history) commit cost the term tier pays for stats, removed
  by compaction.
- Exactly-once via the shared commit protocol (streaming/commitlog.py):
  crashed segment dirs are invisible and rmtree'd on replay; committed
  batch ids are no-ops; a foreign checkpoint lineage raises.
- Compaction seam: read the live set and ``save_ivf_index`` it with the
  SAME centroids — segments and tombstones collapse away.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .commitlog import commit_marker, load_marker, stream_id


def stream_vector_ingest(spark: SparkSession, input_dir: str,
                         index_dir: str, checkpoint_dir: str,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_cells: int = 8, round_to: int = 6,
                         max_files_per_trigger: int = 16,
                         available_now: bool = True):
    """Index a stream of JSON-lines vectors (vec_id long, embedding
    array<double>) into IVF segment form. Returns the StreamingQuery;
    serve with ``ivf_topk_from_segments``."""
    from ..llmops.similarity import _best_cell, ivf_centroids
    from ..util import qident

    sid = stream_id(checkpoint_dir, "_vector_stream_id")
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {vec_col} array<double>")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))
    os.makedirs(index_dir, exist_ok=True)
    cent_p = os.path.join(index_dir, "centroids")
    assign_p = os.path.join(index_dir, "assignments")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = load_marker(index_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"vector segments in {index_dir} were built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the index dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id in state["segments"]:
            return            # replayed batch: already committed
        shutil.rmtree(os.path.join(assign_p, f"seg={batch_id}"),
                      ignore_errors=True)   # crashed earlier try
        shutil.rmtree(os.path.join(index_dir, "tombstones",
                                   f"seg={batch_id}"),
                      ignore_errors=True)
        # a row without an id or vector is not an upsert (it must not
        # tombstone anything); in-batch duplicates of an id resolve
        # DETERMINISTICALLY to the greatest embedding — distributed file
        # reads have no meaningful arrival order inside one batch
        batch_df = (batch_df
                    .filter(F.col(id_col).isNotNull()
                            & F.col(vec_col).isNotNull())
                    .groupBy(id_col)
                    .agg(F.max(vec_col).alias(vec_col))
                    .localCheckpoint())
        if batch_df.isEmpty():
            return
        if state is None:
            # quantizer = md5 sample of the FIRST batch, persisted once
            cents = ivf_centroids(batch_df, vec_col, id_col, n_cells)
            (sp.createDataFrame([(i, c) for i, c in enumerate(cents)],
                                "cell int, cvec array<double>")
             .repartition(1).write.mode("overwrite").parquet(cent_p))
        else:
            cents = _read_centroids(sp, index_dir)
        (batch_df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"),
                         _best_cell(qident(vec_col), cents, round_to)
                         .alias("cell"))
         .withColumn("seg", F.lit(batch_id))
         .repartition("cell")
         .write.partitionBy("seg", "cell").mode("append")
         .parquet(assign_p))
        # tombstone every prior copy of this batch's ids (any cell)
        tomb_segs = list(state["tombstones"]) if state else []
        prior_segs = state["segments"] if state else []
        if prior_segs:
            prior = (sp.read.parquet(assign_p)
                     .filter(F.col("seg").isin(prior_segs)))
            tomb = (prior.join(batch_df.select(
                        F.col(id_col).alias("id")),
                        "id", "left_semi")
                    .select("id", F.col("seg").alias("tseg"), "cell"))
            # write first, count the WRITTEN rows: one history join per
            # batch, not two
            tdir = os.path.join(index_dir, "tombstones",
                                f"seg={batch_id}")
            tomb.write.mode("overwrite").parquet(tdir)
            if sp.read.parquet(tdir).limit(1).count():
                tomb_segs.append(batch_id)
            else:
                shutil.rmtree(tdir, ignore_errors=True)
        commit_marker(index_dir, {
            "segments": sorted(prior_segs + [batch_id]),
            "tombstones": sorted(tomb_segs),
            # the marker REPLACES — committed delete epochs must survive
            "deletes": state.get("deletes", []) if state else [],
            "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_centroids(spark: SparkSession,
                    index_dir: str) -> list[list[float]]:
    from ..operators.index_store import read_ivf_centroids
    return read_ivf_centroids(spark, index_dir)


def delete_vectors_from_segments(spark: SparkSession, index_dir: str,
                                 ids: list) -> None:
    """Erasure for the vector segment index — the shared (id, at_seg)
    watermark protocol (streaming/deletes.py): write the epoch, then
    recommit the marker with it; the epoch is invisible until that
    commit (segment crash discipline). History untouched; idempotent;
    a later re-ingest of the id resurrects it."""
    if not ids:
        return
    from .deletes import write_delete_epoch
    state = load_marker(index_dir)
    if state is None or not state["segments"]:
        raise FileNotFoundError(f"no committed segments in {index_dir}")
    committed = state.get("deletes", [])
    epoch = write_delete_epoch(spark, index_dir, ids,
                               max(state["segments"]), committed)
    commit_marker(index_dir, {
        "segments": state["segments"],
        "tombstones": state["tombstones"],
        "deletes": sorted(committed + [epoch]),
        "stream_id": state["stream_id"]})


def ivf_topk_from_segments(spark: SparkSession, index_dir: str,
                           queries: DataFrame, vec_col: str,
                           query_id_col: str, k: int = 5,
                           n_probe: int = 2,
                           round_to: int = 6) -> DataFrame:
    """IVF top-k over the committed vector segments: probe cells from
    the persisted quantizer (driver-side, bounded query batch), ONE
    seg=+cell=-pruned read of the assignments, tombstone anti-join for
    upserted ids, rounded-cosine scoring + per-query k-heap — identical
    scores to the batch store's ``ivf_topk_from_store`` on the same
    live corpus."""
    from ..operators.index_store import ivf_probe_frame, ivf_score_topk

    state = load_marker(index_dir)
    if state is None or not state["segments"]:
        raise FileNotFoundError(f"no committed segments in {index_dir}")
    cents = _read_centroids(spark, index_dir)
    q, probe_cells = ivf_probe_frame(queries, vec_col, query_id_col,
                                     cents, n_probe, round_to)
    live = (spark.read.parquet(os.path.join(index_dir, "assignments"))
            .filter(F.col("seg").isin(state["segments"]))
            .filter(F.col("cell").isin(probe_cells)))
    if state["tombstones"]:
        # one root read; the seg= filter also hides any crashed
        # uncommitted tombstone dir
        tombs = (spark.read.parquet(os.path.join(index_dir, "tombstones"))
                 .filter(F.col("seg").isin(state["tombstones"]))
                 .select("id", F.col("tseg").alias("seg")))
        live = live.join(F.broadcast(tombs), ["id", "seg"], "left_anti")
    from .deletes import apply_delete_watermarks
    live = apply_delete_watermarks(spark, index_dir, live,
                                   state.get("deletes", []))
    return ivf_score_topk(live, q, k, round_to)
