"""Streaming contamination-report maintenance: every micro-batch of EVAL
documents (benchmark items trickling in per suite) probes the persisted
gram vocabulary and folds its finest-grain integer counters into the
persisted report table (``llmops/decontam.py::merge_contamination_
counters``) — the release-gate ROLLUP view (``report_from_counters``)
is servable fresh at any moment without re-probing eval history, and
the stream holds ZERO state.

Exactly-once with the copy-on-write discipline of streaming/rollup.py:
versioned fold dirs + one atomic LATEST.json commit + replay skip +
foreign-checkpoint rejection. Counters are ADDITIVE, so a double-fold
WOULD corrupt — the marker discipline is load-bearing, exactly as for
DSIR counts and the additive rollups.

The train-side vocabulary is maintained independently (batch
``save/append_gram_vocab`` or ``streaming/vocab.py``); this stream only
READS it. Folding an eval batch probed against vocabulary version V
records contamination as-of V — the usual eval-hygiene semantics
(reports are per train-corpus snapshot; rebuild the counters if the
vocabulary is rebuilt).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..llmops.decontam import (contamination_counters,
                               merge_contamination_counters,
                               read_contamination_counters,
                               report_from_counters)
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_decontam_report_stream_id")


def read_stream_contamination_report(spark: SparkSession,
                                     report_dir: str,
                                     slice_cols: list[str]) -> DataFrame:
    """The full ROLLUP report from the COMMITTED counters version."""
    state = _load_marker(report_dir)
    if state is None:
        raise FileNotFoundError(
            f"no committed report version under {report_dir}")
    counters = read_contamination_counters(
        spark, os.path.join(report_dir, "versions",
                            f"v{state['version']}", "counters"))
    return report_from_counters(counters, slice_cols)


def stream_contamination_report_maintenance(
        spark: SparkSession, input_dir: str, report_dir: str,
        checkpoint_dir: str, vocab_dir: str,
        slice_cols: list[str] | None = None,
        text_col: str = "text", id_col: str = "doc_id",
        threshold: float = 0.8, max_files_per_trigger: int = 16,
        available_now: bool = True):
    """Start the report-maintenance stream over JSON-lines files of eval
    doc rows (``id_col`` bigint, ``text_col`` string, plus the string
    slice columns, default ["suite", "lang"]); returns the
    StreamingQuery. ``vocab_dir`` is an existing gram-vocabulary store
    (save_gram_vocab layout) — its meta pins the shingle n."""
    slice_cols = slice_cols or ["suite", "lang"]
    sid = _stream_id(checkpoint_dir)
    os.makedirs(report_dir, exist_ok=True)
    fields = ", ".join([f"{id_col} long", f"{text_col} string"]
                       + [f"{c} string" for c in slice_cols])
    raw = (spark.readStream.format("json")
           .schema(fields)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        state = _load_marker(report_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"report counters in {report_dir} were built by a "
                "different checkpoint lineage; batch ids are no longer "
                "comparable — rebuild the report dir (or restore the "
                "original checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch: already committed
        nv = (state["version"] + 1) if state else 1
        prev = (os.path.join(report_dir, "versions",
                             f"v{state['version']}", "counters")
                if state else None)
        vdir = os.path.join(report_dir, "versions", f"v{nv}")
        shutil.rmtree(vdir, ignore_errors=True)   # crashed earlier try
        counters = contamination_counters(sp, batch_df, text_col, id_col,
                                          slice_cols, vocab_dir,
                                          threshold=threshold)
        merge_contamination_counters(sp, os.path.join(vdir, "counters"),
                                     counters, slice_cols, src_path=prev)
        _commit_marker(report_dir, {"version": nv,
                                    "max_batch_id": batch_id,
                                    "stream_id": sid})
        vroot = os.path.join(report_dir, "versions")
        for d in os.listdir(vroot):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < nv - 1:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
