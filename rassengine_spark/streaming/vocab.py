"""Streaming gram-vocabulary maintenance: every micro-batch of TRAIN
documents folds its NOVEL gram hashes into the persisted decontamination
vocabulary (``llmops/decontam.py::append_gram_vocab``) — eval probes
(``ngram_overlap_from_store``) stay fresh as the train corpus grows, the
stream holds ZERO state, and history files are never rewritten.

Exactly-once discipline is LIGHTER here than for the additive stores
(rollup/DSIR counts): a replayed batch is IDEMPOTENT by construction —
the append anti-joins against the store, so re-folding the same docs
contributes zero novel grams (like the cluster forest, unlike the
counts). The commit marker is therefore a replay-skip optimization plus
the usual foreign-checkpoint lineage guard, not a correctness
requirement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..llmops.decontam import append_gram_vocab, save_gram_vocab
from .commitlog import commit_marker as _commit_marker
from .commitlog import load_marker as _load_marker
from .commitlog import stream_id


def _stream_id(checkpoint_dir: str) -> str:
    return stream_id(checkpoint_dir, "_vocab_stream_id")


def stream_gram_vocab_maintenance(spark: SparkSession, input_dir: str,
                                  vocab_dir: str, checkpoint_dir: str,
                                  text_col: str = "text",
                                  id_col: str = "doc_id", n: int = 8,
                                  buckets: int = 64,
                                  max_files_per_trigger: int = 16,
                                  available_now: bool = True):
    """Start the vocabulary-maintenance stream over JSON-lines files of
    doc rows (``id_col`` bigint, ``text_col`` string); returns the
    StreamingQuery. The first committed batch builds the store
    (save_gram_vocab, recording `n`); every later batch appends only its
    novel grams. Probe any eval frame against the live store with
    ``ngram_overlap_from_store`` — the store is always a consistent
    distinct-gram SET (parquet appends are atomic at file granularity;
    an in-flight append can only make a probe marginally stricter)."""
    sid = _stream_id(checkpoint_dir)
    os.makedirs(vocab_dir, exist_ok=True)
    raw = (spark.readStream.format("json")
           .schema(f"{id_col} long, {text_col} string")
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .load(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _load_marker(vocab_dir)
        if state is not None and state["stream_id"] != sid:
            raise RuntimeError(
                f"gram vocabulary in {vocab_dir} was built by a different "
                "checkpoint lineage; batch ids are no longer comparable "
                "— rebuild the vocab dir (or restore the original "
                "checkpoint) before streaming into it")
        if state is not None and batch_id <= state["max_batch_id"]:
            return            # replayed batch (and re-appends are no-ops)
        if not os.path.exists(os.path.join(vocab_dir, "meta.json")):
            save_gram_vocab(batch_df, text_col, vocab_dir, n=n,
                            buckets=buckets)
        else:
            append_gram_vocab(batch_df, text_col, vocab_dir)
        _commit_marker(vocab_dir, {"max_batch_id": batch_id,
                                   "stream_id": sid})

    writer = (raw.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
