"""Streaming term-index maintenance: every micro-batch of documents
becomes an immutable index SEGMENT — the Lucene pattern the reference's
continuously-indexing upload path relies on (OpenSearch indexes each
bulk request into new segments; app/main.py:1211-1282), re-expressed on
parquet. History is never rewritten: a segment is a complete
(postings, doclens) pair for its batch, bucket-partitioned exactly like
the batch store (operators/index_store.py), and serving unions the
committed segments with the same per-term bucket pruning.

Exactly-once with the same copy-on-write discipline as
streaming/rollup.py:

- each batch writes ``segments/s{batch_id}/`` from scratch (a crashed
  half-written segment is rmtree'd on the replay attempt);
- the commit is one atomic ``os.replace`` of ``LATEST.json`` listing the
  committed segment ids plus EXACT integer corpus stats (n_docs,
  sum_dl) — avgdl is derived by one integer division at read time, so
  index-served BM25 stays bit-identical to a scan over the union
  corpus;
- replays are detected by ``batch_id`` membership; a checkpoint-identity
  uuid guards against a lost/replaced checkpoint silently restarting
  batch ids (mismatch raises, as in the rollup maintainer);
- compaction seam: read all committed segments and
  ``save_term_index`` the union — segments collapse to one, the marker
  resets; serving code is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1
from ..functions.text import terms_of
from ..operators.index_store import term_bucket_expr, term_bucket_py

_N_BUCKETS = 256


def _stream_id(checkpoint_dir: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    p = os.path.join(checkpoint_dir, "_index_stream_id")
    if not os.path.exists(p):
        with open(p, "w") as f:
            f.write(uuid.uuid4().hex)
    with open(p) as f:
        return f.read().strip()


def _load_marker(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, "LATEST.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _commit_marker(index_dir: str, state: dict) -> None:
    tmp = os.path.join(index_dir, "LATEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(index_dir, "LATEST.json"))


def stream_index_ingest(spark: SparkSession, input_dir: str,
                        index_dir: str, checkpoint_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_files_per_trigger: int = 16,
                        available_now: bool = True):
    """Index a stream of JSON-lines documents (doc_id long, text string)
    into segment form. Returns the StreamingQuery; serve with
    ``bm25_topk_from_segments``."""
    from ..operators.inverted_index import build_term_index

    sid = _stream_id(checkpoint_dir)
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {text_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))
    os.makedirs(index_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(index_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"index segments in {index_dir} were built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the index dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id in state["segments"]:
            return            # replayed batch: already committed
        sdir = os.path.join(index_dir, "segments", f"s{batch_id}")
        shutil.rmtree(sdir, ignore_errors=True)   # crashed earlier try
        postings, doclens, _ = build_term_index(batch_df, text_col,
                                                id_col)
        (postings.withColumn("tb", term_bucket_expr("term", _N_BUCKETS))
                 .repartition("tb")
                 .write.partitionBy("tb").mode("overwrite")
                 .parquet(os.path.join(sdir, "postings")))
        doclens.write.mode("overwrite") \
               .parquet(os.path.join(sdir, "doclens"))
        # n_docs counts every row, but avgdl must divide by the NON-NULL
        # dl count (F.avg semantics — the batch tier's stats convention)
        agg = (batch_df.sparkSession.read
               .parquet(os.path.join(sdir, "doclens"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.count("dl").alias("n_dl"),
                    F.sum("dl").alias("s")).collect()[0])
        prev = state or {"segments": [], "n_docs": 0, "n_dl": 0,
                         "sum_dl": 0, "stream_id": sid}
        _commit_marker(index_dir, {
            "segments": sorted(prev["segments"] + [batch_id]),
            "n_docs": prev["n_docs"] + int(agg["n"]),
            "n_dl": prev["n_dl"] + int(agg["n_dl"]),
            "sum_dl": prev["sum_dl"] + int(agg["s"] or 0),
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
    """BM25 top-k over the union of committed segments: per segment the
    postings read prunes to the query terms' buckets (same literal
    filter as the batch store), doclens union, and corpus stats come
    from the marker's exact integer sums — bit-identical to
    ``bm25_topk`` over the union corpus (parity-tested)."""
    from ..operators.inverted_index import bm25_topk_from_index

    state = _load_marker(index_dir)
    if state is None or not state["segments"]:
        raise FileNotFoundError(f"no committed segments in {index_dir}")
    terms = terms_of(query)
    if not terms:
        raise ValueError("no tokenizable terms in query")
    buckets = sorted({term_bucket_py(t, _N_BUCKETS) for t in terms})
    post_parts, dl_parts = [], []
    for s in state["segments"]:
        sdir = os.path.join(index_dir, "segments", f"s{s}")
        post_parts.append(
            spark.read.parquet(os.path.join(sdir, "postings"))
            .filter(F.col("tb").isin(buckets))
            .select("term", "id", "tf"))
        dl_parts.append(spark.read.parquet(os.path.join(sdir, "doclens")))
    postings = post_parts[0]
    for p in post_parts[1:]:
        postings = postings.unionByName(p)
    doclens = dl_parts[0]
    for d in dl_parts[1:]:
        doclens = doclens.unionByName(d)
    # avgdl from the marker's exact integer sums: AVG over integers is
    # sum / non-null-count in any engine, so serving equals the
    # union-corpus scan
    stats = spark.createDataFrame(
        [(state["n_docs"],
          state["sum_dl"] / state["n_dl"] if state["n_dl"] else 0.0)],
        "n_docs long, avgdl double")
    return bm25_topk_from_index(postings, doclens, stats, query, k=k,
                                k1=k1, b=b, round_to=round_to)
