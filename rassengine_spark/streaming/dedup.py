"""Streaming incremental dedup: a continuously-ingesting corpus where
every micro-batch is deduped against the PERSISTED minhash signature
store before admission — the streaming complement of the batch tier in
``llmops/dedup.py`` (same signatures, same band buckets, same estimate
verify), mirroring how production crawl pipelines admit documents.

Per micro-batch:

1. exact in-batch dedup (min-id keeper per byte-identical text);
2. near-dup check against the signature store
   (``incremental_minhash_pairs`` — history is never re-shingled; the
   batch side is broadcast);
3. survivors append to the corpus table, their signatures append to the
   store (so later batches dedup against them), and the detected pairs
   append to a quarantine table for audit.

Exactly-once: the file source tracks processed files in the checkpoint;
batch writes are parquet appends keyed by the batch's files, so a replay
after a crash re-appends the same rows (dedup-by-construction upstream
makes duplicate appends detectable downstream by doc_id). State is
bounded: the stream holds NO aggregation state — the signature store IS
the state, on disk, shared with the batch tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmops.dedup import (exact_dedup, incremental_minhash_pairs,
                            minhash_store_frame)


def stream_dedup_ingest(spark: SparkSession, input_dir: str,
                        store_path: str, corpus_dir: str, dupes_dir: str,
                        checkpoint_dir: str,
                        threshold: float = 0.5,
                        shingle_n: int = 3, num_hashes: int = 16,
                        bands: int = 4,
                        max_files_per_trigger: int = 16,
                        available_now: bool = True):
    """Start the deduping ingest over JSON-lines files of
    (doc_id bigint, text string); returns the StreamingQuery."""
    raw = (spark.readStream.format("json")
           .schema("doc_id long, text string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = exact_dedup(batch_df, "text", "doc_id")
        # existence probe through Spark's filesystem layer (NOT os.path:
        # the store may be file:/, hdfs://, s3a://, ... — a local-only
        # check would silently disable dedup against history). ONLY a
        # missing path means "first batch"; any other read failure
        # (permissions, transient FS error, corrupt footer) must abort
        # the batch rather than silently admit duplicates.
        from pyspark.errors import AnalysisException
        try:
            store = spark.read.parquet(store_path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in (e.getErrorClass() or "") \
                    and "Path does not exist" not in str(e):
                raise
            store = None
        # signature the batch ONCE; both the pairing and the store append
        # reuse this frame (shingling is the dominant per-batch cost)
        sigs = minhash_store_frame(batch, "text", "doc_id", shingle_n,
                                   num_hashes, bands).localCheckpoint()
        if store is not None:
            pairs = incremental_minhash_pairs(
                batch, store, "text", "doc_id", shingle_n=shingle_n,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
                new_banded=sigs)
            # one tiny frame reused twice (quarantine write + anti-join)
            pairs = pairs.localCheckpoint()
            (pairs.withColumn("batch_id", F.lit(batch_id))
                  .write.mode("append").parquet(dupes_dir))
            losers = pairs.select(F.col("id_new").alias("doc_id")).distinct()
            batch = batch.join(losers, "doc_id", "left_anti")
            sigs = sigs.join(losers.select(F.col("doc_id").alias("id")),
                             "id", "left_anti")
        batch.write.mode("append").parquet(corpus_dir)
        (sigs.write.partitionBy("band").mode("append").parquet(store_path))

    writer = (raw.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(process_batch))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
