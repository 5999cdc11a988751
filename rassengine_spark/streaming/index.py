"""Streaming term-index maintenance: every micro-batch of documents
becomes an immutable index SEGMENT — the Lucene pattern the reference's
continuously-indexing upload path relies on (OpenSearch indexes each
bulk request into new segments and supersedes prior copies of an `_id`;
app/main.py:1211-1282), re-expressed on parquet.

Layout: ONE root per table, hive-partitioned by segment —
``postings/seg={batch_id}/tb={bucket}/`` and
``doclens/seg={batch_id}/`` — so history is never rewritten (an append
only creates its own ``seg=`` directory), serving is a single
partition-pruned read whatever the segment count (no per-segment
union-plan growth), and both the committed-segment filter and the
query-term bucket filter prune at the directory level.

Document UPSERT semantics, like the reference: re-ingesting a doc_id in
a later batch supersedes every earlier copy. The live copy of a doc is
its row in the HIGHEST committed segment containing it (last writer
wins); serving filters postings and doclens to live rows, and the
marker's corpus stats (exact integers, recomputed at commit over the
live set — the same discipline as the batch tier's
``append_term_index``) reflect superseded docs exactly once.

Exactly-once via the shared commit protocol (streaming/commitlog.py):
an uncommitted or crashed segment directory is invisible (the committed
list in the marker is what serving and stats read) and is rmtree'd on
the replay attempt; replays of committed batches are no-ops; a foreign
checkpoint lineage raises. Compaction seam: read the live set and
``save_term_index`` it — segments collapse to one, serving unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.bm25 import B, K1
from ..functions.text import terms_of
from ..operators.index_store import term_bucket_expr, term_bucket_py
from .commitlog import commit_marker, load_marker, stream_id

_N_BUCKETS = 256


def _live_doclens(doclens: DataFrame) -> DataFrame:
    """(id, dl, seg) rows of the LIVE copy of each doc: the row from the
    highest segment containing the id (last writer wins)."""
    w = Window.partitionBy("id").orderBy(F.col("seg").desc())
    return (doclens.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def _live_stats(live: DataFrame) -> dict:
    """Exact integer corpus stats of a live doclens frame — the ONE
    place the convention lives (avgdl divides by the NON-NULL dl count,
    F.avg semantics; sum guards the all-null corpus)."""
    agg = live.agg(F.count(F.lit(1)).alias("n"),
                   F.count("dl").alias("n_dl"),
                   F.sum("dl").alias("s")).collect()[0]
    return {"n_docs": int(agg["n"]), "n_dl": int(agg["n_dl"]),
            "sum_dl": int(agg["s"] or 0)}


def _live_view(spark: SparkSession, index_dir: str, segs: list[int],
               delete_epochs: list[int]) -> DataFrame:
    """Live doclens under the committed segments AND committed delete
    watermarks — the single definition of 'the corpus' that serving,
    ingest stats, and delete recommits all share."""
    from .deletes import apply_delete_watermarks
    live = _live_doclens(
        spark.read.parquet(os.path.join(index_dir, "doclens"))
             .filter(F.col("seg").isin(segs)))
    return apply_delete_watermarks(spark, index_dir, live, delete_epochs)


def delete_docs_from_segments(spark: SparkSession, index_dir: str,
                              doc_ids: list) -> None:
    """Doc-level DELETE against the segment index (the erasure twin of
    the tier's upsert, completing the reference's document lifecycle):
    writes an (id, at_seg = highest committed segment) watermark epoch
    and recommits the marker with it plus exact live-corpus stats — the
    epoch is INVISIBLE until that commit (same crash discipline as
    segments: a crash between the two leaves serving on the old marker,
    stats and live set still consistent with each other). History stays
    byte-untouched; re-deleting appends an equal-or-lower watermark
    (no-op); re-ingesting a deleted id in a later segment resurrects
    it."""
    if not doc_ids:
        return
    from .deletes import write_delete_epoch
    state = load_marker(index_dir)
    if state is None or not state["segments"]:
        raise FileNotFoundError(f"no committed segments in {index_dir}")
    committed = state.get("deletes", [])
    epoch = write_delete_epoch(spark, index_dir, doc_ids,
                               max(state["segments"]), committed)
    epochs = sorted(committed + [epoch])
    live = _live_view(spark, index_dir, state["segments"], epochs)
    commit_marker(index_dir, {
        "segments": state["segments"],
        "deletes": epochs,
        **_live_stats(live),
        "stream_id": state["stream_id"]})


def stream_index_ingest(spark: SparkSession, input_dir: str,
                        index_dir: str, checkpoint_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_files_per_trigger: int = 16,
                        available_now: bool = True):
    """Index a stream of JSON-lines documents (doc_id long, text string)
    into segment form with doc-level upsert. Returns the StreamingQuery;
    serve with ``bm25_topk_from_segments``."""
    from ..operators.inverted_index import build_term_index

    sid = stream_id(checkpoint_dir, "_index_stream_id")
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {text_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))
    os.makedirs(index_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = load_marker(index_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"index segments in {index_dir} were built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the index dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id in state["segments"]:
            return            # replayed batch: already committed
        for t in ("postings", "doclens"):
            shutil.rmtree(os.path.join(index_dir, t, f"seg={batch_id}"),
                          ignore_errors=True)   # crashed earlier try
        # rows without an id cannot be keyed; in-batch duplicates of an
        # id resolve DETERMINISTICALLY to the greatest text (distributed
        # file reads have no meaningful arrival order inside one batch —
        # cross-batch order is what seg supersedence provides). One
        # materialization: both table writes reuse it instead of
        # re-reading and re-tokenizing the batch's input files
        batch_df = (batch_df
                    .filter(F.col(id_col).isNotNull())
                    .groupBy(id_col)
                    .agg(F.max(text_col).alias(text_col))
                    .localCheckpoint())
        if batch_df.isEmpty():
            return
        postings, doclens, _ = build_term_index(batch_df, text_col,
                                                id_col)
        (postings.withColumn("seg", F.lit(batch_id))
                 .withColumn("tb", term_bucket_expr("term", _N_BUCKETS))
                 .repartition("tb")
                 .write.partitionBy("seg", "tb").mode("append")
                 .parquet(os.path.join(index_dir, "postings")))
        (doclens.withColumn("seg", F.lit(batch_id))
                .write.partitionBy("seg").mode("append")
                .parquet(os.path.join(index_dir, "doclens")))
        # corpus stats over the LIVE set (superseded copies excluded),
        # as exact integers — avgdl divides by the NON-NULL dl count
        # (F.avg semantics, the batch tier's stats convention)
        segs = (state["segments"] if state else []) + [batch_id]
        epochs = state.get("deletes", []) if state else []
        live = _live_view(sp, index_dir, segs, epochs)
        commit_marker(index_dir, {
            "segments": sorted(segs),
            "deletes": epochs,      # the marker REPLACES — preserve them
            **_live_stats(live),
            "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bm25_topk_from_segments(spark: SparkSession, index_dir: str,
                            query: str, k: int = 10, k1: float = K1,
                            b: float = B, round_to: int = 6) -> DataFrame:
    """BM25 top-k over the committed segments: ONE partition-pruned read
    per table (seg= to the committed list, tb= to the query terms'
    buckets), live-copy filter for upserted docs, corpus stats from the
    marker's exact integers — bit-identical to ``bm25_topk`` over the
    live corpus (parity-tested)."""
    from ..operators.inverted_index import bm25_topk_from_index

    state = load_marker(index_dir)
    if state is None or not state["segments"]:
        raise FileNotFoundError(f"no committed segments in {index_dir}")
    terms = terms_of(query)
    if not terms:
        raise ValueError("no tokenizable terms in query")
    buckets = sorted({term_bucket_py(t, _N_BUCKETS) for t in terms})
    segs = state["segments"]
    live = _live_view(spark, index_dir, segs, state.get("deletes", []))
    postings = (spark.read.parquet(os.path.join(index_dir, "postings"))
                .filter(F.col("seg").isin(segs))
                .filter(F.col("tb").isin(buckets))
                .join(live.select("id", "seg"), ["id", "seg"],
                      "left_semi")
                .select("term", "id", "tf"))
    stats = spark.createDataFrame(
        [(state["n_docs"],
          state["sum_dl"] / state["n_dl"] if state["n_dl"] else 0.0)],
        "n_docs long, avgdl double")
    return bm25_topk_from_index(postings, live.select("id", "dl"),
                                stats, query, k=k, k1=k1, b=b,
                                round_to=round_to)
