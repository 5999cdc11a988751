"""Streaming upload-directory ingest: file source -> foreachBatch upsert.

Maps the reference's per-request synchronous ingest (POST /upload_data,
app/embedding_gen.py:1256-1408) onto a continuously-running Structured
Streaming job: new files landing in the upload directory flow through the
identical S1-S8 transformations; each micro-batch upserts by ``doc_id``
(the ``_id`` idempotency analog, app/main.py:1228), so replays and
re-uploads are exactly-once at the table level.

Scale: the file source tracks processed files in the checkpoint; with
``maxFilesPerTrigger`` the job admission-controls bursty uploads. State is
bounded (no aggregation state — pure transform), so no watermark is needed;
there is no event-time logic to replicate (SURVEY.md §2.10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.embed import EmbedFn, with_embeddings
from ..pipeline.ingest import upsert_parquet
from ..sources.fhir import parse_fhir


def stream_fhir_uploads(spark: SparkSession, upload_dir: str, out_dir: str,
                        checkpoint_dir: str, user_id: str = "stream",
                        chunk_size: int = 512,
                        embed_fn: EmbedFn | None = None, dim: int = 64,
                        max_files_per_trigger: int = 64,
                        available_now: bool = True):
    """Start the streaming ingest; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the directory and
    stops (batch-like semantics for tests); False runs continuously.
    """
    raw = (spark.readStream.format("text")
           .option("wholetext", "true")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(upload_dir)
           .select(F.lit(user_id).alias("user_id"),
                   F.input_file_name().alias("file_path"),
                   F.col("value").alias("content")))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs, chunks = parse_fhir(batch_df, chunk_size)
        chunks = with_embeddings(chunks, "unstructuredText", embed_fn, dim)
        upsert_parquet(docs, os.path.join(out_dir, "documents"))
        upsert_parquet(chunks, os.path.join(out_dir, "chunks"))

    writer = (raw.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bucketed_sink(table: str, path: str, bucket_col: str,
                  num_buckets: int = 8):
    """foreachBatch sink that appends micro-batches into a BUCKETED
    datasource table.

    Every batch's files carry the same bucket spec, so the accumulating
    table keeps the co-located layout at all times: downstream joins and
    aggregations on ``bucket_col`` read it with NO exchange (the buckets
    ARE the shuffle — see tests/test_bucketing.py). At 100 TB this is the
    streaming half of the bucketing strategy: pay a batch-local shuffle at
    ingest time once, never re-shuffle the big table at query time.
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (batch_df.write.mode("append")
         .bucketBy(num_buckets, bucket_col).sortBy(bucket_col)
         .option("path", path)
         .saveAsTable(table))
    return sink


def stream_to_bucketed(source_df: DataFrame, table: str, path: str,
                       checkpoint_dir: str, bucket_col: str,
                       num_buckets: int = 8, available_now: bool = True):
    """Run a streaming source into a bucketed table via ``bucketed_sink``.
    The checkpoint makes the file source exactly-once: re-running after
    completion appends nothing."""
    writer = (source_df.writeStream
              .foreachBatch(bucketed_sink(table, path, bucket_col,
                                          num_buckets))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
