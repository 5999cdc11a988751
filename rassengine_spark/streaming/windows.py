"""Watermarked event-time streaming analytics: windowed aggregation and
streaming deduplication.

The reference has no streaming data plane (SURVEY §2.10) — these extend the
batch analytics (`events_tumbling_counts`, `dedup_exact`) to unbounded
input, per the north-star streaming requirement.

Both operators are pure built-in Structured Streaming:

- `windowed_counts` — tumbling event-time windows with a watermark. Late
  rows inside the watermark horizon still update their (closed-but-retained)
  window; rows later than the watermark are dropped. In append mode a
  window emits exactly once, when the watermark passes its end — the
  standard exactly-once rollup feeding a serving table.
- `dedup_stream` — `dropDuplicatesWithinWatermark` on a key: the streaming
  twin of exact dedup. State holds one entry per key seen inside the
  watermark horizon, so memory is bounded by key arrival rate x horizon —
  the knob that makes corpus-scale streaming ingest dedup feasible (an
  unbounded `dropDuplicates` would OOM on an infinite stream).

Scale: both shuffle on their state key (window/dedup key) into the state
store, so each key lives on one task across the cluster; AQE does not apply
to streaming stages, so `spark.sql.shuffle.partitions` at job start sizes
the state store parallelism for the life of the checkpoint — set it to the
cluster's core count before the first run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, time_col: str, key_col: str,
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per key over an unbounded stream.

    Output schema: (window_start, window_end, {key_col}, n_events) —
    identical to the batch `events_tumbling_counts` rollup, so a batch
    backfill and the streaming head can share one serving table."""
    return (events
            .withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("w"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "n_events"))


def dedup_stream(rows: DataFrame, key_cols: list[str], time_col: str,
                 watermark: str = "2 hours") -> DataFrame:
    """First-arrival-wins streaming dedup on `key_cols`.

    Duplicates arriving within the watermark horizon of the first sighting
    are dropped; state for a key is evicted once the watermark passes, so
    the store stays bounded. (Exactly the ingest-path guard: replayed
    uploads / at-least-once sources collapse to one row.)"""
    return (rows.withWatermark(time_col, watermark)
                .dropDuplicatesWithinWatermark(key_cols))
