"""Streaming rollup maintenance: every micro-batch folds into the
persisted serving rollups — the additive aggregates via
``pipeline/ingest.py::merge_rollup`` and the distinct counts via
``merge_hll_rollup`` — so dashboards read fresh, pre-aggregated tables
while the stream holds ZERO aggregation state (no watermark, no state
store: the rollup tables on disk ARE the state, shared with the batch
tier, exactly like streaming/dedup.py's signature store).

Exactly-once on plain parquet, copy-on-write style:

- each fold writes NEW version directories (``versions/v{n}/counts``,
  ``versions/v{n}/users``) from the previously COMMITTED version — a
  crash mid-fold leaves the committed tables untouched and the replayed
  batch simply recomputes v{n};
- the commit is one atomic ``os.replace`` of ``LATEST.json`` (version,
  max committed batch id, stream identity) — the only mutation readers
  ever see;
- replays are detected by ``batch_id <= max_batch_id`` (file-source
  batch ids are monotonic within a checkpoint lineage);
- the checkpoint's identity (a uuid dropped next to it on first run) is
  recorded in the marker: a lost/replaced checkpoint restarts batch ids
  at 0, which silently either skips new data or double-folds old data —
  so a stream-id mismatch raises instead, telling the operator to
  rebuild the rollups with the new checkpoint;
- value sums fold as DECIMAL(18,6): partial-sum association is exact, so
  the incrementally maintained table EQUALS a from-scratch recompute
  (double sums would drift by fold order);
- only the previous version is retained (crash safety); older version
  directories are pruned, and the commit marker is a single file — no
  per-batch metadata growth.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.ingest import (merge_histogram_rollup, merge_hll_rollup,
                               merge_mg_rollup,
                               merge_rollup)
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_rollup_stream_id")


def read_stream_rollup(spark: SparkSession, rollup_dir: str,
                       table: str) -> DataFrame:
    """Read the COMMITTED version of a maintained rollup table
    ('counts' -> the additive table, 'users' -> the HLL table with its
    decoded approx_distinct column, 'values' -> per-type p50/p95/p99
    interpolated from the maintained histogram bins, 'hitters' -> the
    per-type Misra-Gries heavy-user summaries)."""
    state = _load_marker(rollup_dir)
    if state is None:
        raise FileNotFoundError(f"no committed rollup in {rollup_dir}")
    vdir = os.path.join(rollup_dir, "versions", f"v{state['version']}",
                        table)
    if table == "users":
        from ..pipeline.ingest import read_hll_rollup
        return read_hll_rollup(spark, vdir)
    if table == "values":
        from ..pipeline.ingest import read_histogram_quantiles
        return read_histogram_quantiles(spark, vdir, ["event_type"],
                                        [0.5, 0.95, 0.99])
    if table == "hitters":
        from ..pipeline.ingest import read_mg_rollup
        return read_mg_rollup(spark, vdir)
    return spark.read.parquet(vdir)


def stream_rollup_maintenance(spark: SparkSession, input_dir: str,
                              rollup_dir: str, checkpoint_dir: str,
                              max_files_per_trigger: int = 16,
                              available_now: bool = True):
    """Maintain two serving rollups over a stream of JSON-lines events
    (user_id long, event_type string, value double, ts string):

    - ``counts``: per-event-type additive (n_events, sum_value — DECIMAL
      fold, exactly order-independent) via merge_rollup;
    - ``users``: per-event-type approximate distinct users via
      merge_hll_rollup;
    - ``values``: per-event-type value-distribution histogram bins via
      merge_histogram_rollup (served as interpolated quantiles).

    Returns the StreamingQuery. Crash/replay-safe as described in the
    module docstring; read with ``read_stream_rollup``."""
    sid = _stream_id(checkpoint_dir)
    raw = (spark.readStream.format("json")
           .schema("user_id long, event_type string, value double, "
                   "ts string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))
    os.makedirs(rollup_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = _load_marker(rollup_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"rollups in {rollup_dir} were built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the rollup dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch: already committed
        n = (state["version"] + 1) if state else 1
        prev = (os.path.join(rollup_dir, "versions",
                             f"v{state['version']}") if state else None)
        vdir = os.path.join(rollup_dir, "versions", f"v{n}")
        shutil.rmtree(vdir, ignore_errors=True)   # crashed earlier try

        delta = batch_df.select(
            "event_type",
            F.lit(1).cast("long").alias("n_events"),
            F.col("value").cast("decimal(18,6)").alias("sum_value"))
        merge_rollup(sp, os.path.join(vdir, "counts"), delta,
                     ["event_type"],
                     {"n_events": "sum", "sum_value": "sum"},
                     src_path=(os.path.join(prev, "counts")
                               if prev else None))
        merge_hll_rollup(sp, os.path.join(vdir, "users"),
                         batch_df.select("event_type", "user_id"),
                         ["event_type"], "user_id",
                         src_path=(os.path.join(prev, "users")
                                   if prev else None))
        merge_histogram_rollup(sp, os.path.join(vdir, "values"),
                               batch_df.select("event_type", "value"),
                               ["event_type"], "value", lo=0.0,
                               width=0.5,
                               src_path=(os.path.join(prev, "values")
                                         if prev else None))
        merge_mg_rollup(sp, os.path.join(vdir, "hitters"),
                        batch_df.select(
                            "event_type",
                            F.col("user_id").cast("string").alias("u")),
                        ["event_type"], "u", k=32,
                        src_path=(os.path.join(prev, "hitters")
                                  if prev else None))
        _commit_marker(rollup_dir, {"version": n, "max_batch_id": batch_id,
                                    "stream_id": sid})
        # retention: keep the committed version and its parent only
        vroot = os.path.join(rollup_dir, "versions")
        for d in os.listdir(vroot):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < n - 1:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
