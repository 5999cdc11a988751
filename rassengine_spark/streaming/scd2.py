"""Streaming SCD2 maintenance: every micro-batch of dimension
observations (key, attrs, ts, seq) folds into the persisted SCD2 table
(``pipeline/scd2.py::merge_scd2``) — point-in-time dimension state stays
fresh without re-deriving history, and the stream holds ZERO state (the
table IS the state, shared with the batch tier).

Exactly-once with the copy-on-write discipline of streaming/rollup.py:
versioned fold dirs + one atomic LATEST.json commit + replay skip +
foreign-checkpoint rejection. Like the DSIR counts (and unlike the
cluster forest), a double-fold CAN corrupt here — replaying the current
row's closing observation is harmless (compression absorbs attr
repeats), but replayed regime CHANGES would re-close rows at stale
timestamps — so the marker discipline is load-bearing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.scd2 import merge_scd2, read_scd2
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_scd2_stream_id")


def read_stream_scd2(spark: SparkSession, scd2_dir: str) -> DataFrame:
    """(keys..., attrs..., valid_from, valid_to, is_current) from the
    COMMITTED version."""
    state = _load_marker(scd2_dir)
    if state is None:
        raise FileNotFoundError(
            f"no committed scd2 version under {scd2_dir}")
    return read_scd2(
        spark, os.path.join(scd2_dir, "versions",
                            f"v{state['version']}", "scd2"))


def stream_scd2_maintenance(spark: SparkSession, input_dir: str,
                            scd2_dir: str, checkpoint_dir: str,
                            key_cols: list[str] | None = None,
                            attr_cols: list[str] | None = None,
                            ts_col: str = "ts", seq_col: str = "seq",
                            col_types: dict[str, str] | None = None,
                            max_files_per_trigger: int = 16,
                            available_now: bool = True):
    """Start the SCD2-maintenance stream over JSON-lines files of
    observation rows; returns the StreamingQuery. Defaults expect
    (k bigint, a string, ts bigint, seq bigint); pass key/attr col
    names to override. ``col_types`` maps column name -> Spark DDL type
    for the JSON read (e.g. ``{"store_id": "long", "price":
    "double"}``); unmapped key/attr columns default to ``long`` for the
    default key ``k`` and ``string`` otherwise, while ts/seq are always
    ``long``. Type the columns explicitly when keys or attrs are
    numeric — a string-typed read would silently diverge from the
    batch-tier table's types and change join/compare semantics (ADVICE
    r5). Batches must respect the CDC contract (per key, observations
    arrive in (ts, seq) order across batches) — the same append-only
    change-log assumption every SCD2 maintainer makes."""
    key_cols = key_cols or ["k"]
    attr_cols = attr_cols or ["a"]
    col_types = col_types or {}
    sid = _stream_id(checkpoint_dir)
    os.makedirs(scd2_dir, exist_ok=True)

    def _ddl(c: str) -> str:
        default = "long" if c == "k" else "string"
        return f"{c} {col_types.get(c, default)}"

    fields = [_ddl(c) for c in (*key_cols, *attr_cols)]
    schema = ", ".join(fields + [f"{ts_col} long", f"{seq_col} long"])
    raw = (spark.readStream.format("json")
           .schema(schema)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = _load_marker(scd2_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"scd2 table in {scd2_dir} was built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the table dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch: already committed
        nv = (state["version"] + 1) if state else 1
        prev = (os.path.join(scd2_dir, "versions",
                             f"v{state['version']}", "scd2")
                if state else None)
        vdir = os.path.join(scd2_dir, "versions", f"v{nv}")
        shutil.rmtree(vdir, ignore_errors=True)   # crashed earlier try
        merge_scd2(sp, os.path.join(vdir, "scd2"), batch_df,
                   key_cols, attr_cols, ts_col, seq_col, src_path=prev)
        _commit_marker(scd2_dir, {"version": nv, "max_batch_id": batch_id,
                                  "stream_id": sid})
        vroot = os.path.join(scd2_dir, "versions")
        for d in os.listdir(vroot):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < nv - 1:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
