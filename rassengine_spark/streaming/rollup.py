"""Streaming rollup maintenance: every micro-batch folds into the
persisted serving rollups — the additive aggregates via
``pipeline/ingest.py::merge_rollup`` and the distinct counts via
``merge_hll_rollup`` — so dashboards read fresh, pre-aggregated tables
while the stream holds ZERO aggregation state (no watermark, no state
store: the rollup tables on disk ARE the state, shared with the batch
tier, exactly like streaming/dedup.py's signature store).

Scale: each micro-batch costs a map-side partial aggregate over the batch
plus a semi-join-pruned rewrite of only the groups the batch touches —
the rollup's history is never rescanned, so cost tracks batch size, not
table size. A replayed batch (crash before the checkpoint commit) re-folds
the same rows: additive rollups would double-count, so the foreachBatch
sink guards with a processed-batch-id manifest (the standard
idempotent-foreachBatch pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.ingest import merge_hll_rollup, merge_rollup


def _already_done(spark: SparkSession, manifest: str, batch_id: int) -> bool:
    if not os.path.exists(manifest):
        return False
    return (spark.read.parquet(manifest)
            .filter(F.col("batch_id") == batch_id).limit(1).count()) > 0


def _mark_done(spark: SparkSession, manifest: str, batch_id: int) -> None:
    (spark.createDataFrame([(batch_id,)], "batch_id long")
     .coalesce(1).write.mode("append").parquet(manifest))


def stream_rollup_maintenance(spark: SparkSession, input_dir: str,
                              rollup_dir: str, checkpoint_dir: str,
                              max_files_per_trigger: int = 16,
                              available_now: bool = True):
    """Maintain two serving rollups over a stream of JSON-lines events
    (user_id long, event_type string, value double, ts string):

    - ``counts``: per-event-type additive (n_events, sum_value) via
      merge_rollup;
    - ``users``: per-event-type approximate distinct users via
      merge_hll_rollup.

    Returns the StreamingQuery. Idempotent under batch replay via the
    batch-id manifest."""
    raw = (spark.readStream.format("json")
           .schema("user_id long, event_type string, value double, "
                   "ts string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))
    manifest = os.path.join(rollup_dir, "_batches")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _already_done(batch_df.sparkSession, manifest, batch_id):
            return            # replayed batch: already folded in
        sp = batch_df.sparkSession
        delta = batch_df.select(
            "event_type",
            F.lit(1).alias("n_events"),
            F.col("value").alias("sum_value"))
        merge_rollup(sp, os.path.join(rollup_dir, "counts"), delta,
                     ["event_type"],
                     {"n_events": "sum", "sum_value": "sum"})
        merge_hll_rollup(sp, os.path.join(rollup_dir, "users"),
                         batch_df.select("event_type", "user_id"),
                         ["event_type"], "user_id")
        _mark_done(sp, manifest, batch_id)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
