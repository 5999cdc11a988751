"""Shared (id, at_seg) delete-watermark protocol for the segment
indexes (term tier streaming/index.py, vector tier streaming/vectors.py).

Rule: a doc/vector is dead iff its LIVE copy's segment is <= the highest
committed watermark for its id — so re-ingesting the id in a later
segment resurrects it (the reference's DELETE + re-upload lifecycle).

Watermarks are committed with the same crash-invisibility discipline as
segments: each delete writes its rows under ``deletes/d={epoch}`` and
the epoch only becomes visible when the caller recommits the marker with
it in the ``deletes`` list — a crash between the parquet append and the
marker commit leaves the epoch directory invisible to serving and stats
(and the next delete rmtree's it). Tombstone/segment namespaces are
untouched: delete epochs can never collide with a future batch id.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_delete_epoch(spark: SparkSession, index_dir: str, ids: list,
                       at_seg: int, committed: list[int]) -> int:
    """Write the next delete epoch's (id, at_seg) rows; returns the
    epoch for the caller to include in its marker recommit. A crashed
    earlier attempt at the same epoch is removed first."""
    epoch = max(committed, default=-1) + 1
    ddir = os.path.join(index_dir, "deletes", f"d={epoch}")
    shutil.rmtree(ddir, ignore_errors=True)
    (spark.createDataFrame([(int(d), int(at_seg)) for d in ids],
                           "id long, at_seg long")
     .repartition(1).write.parquet(ddir))
    return epoch


def apply_delete_watermarks(spark: SparkSession, index_dir: str,
                            live: DataFrame,
                            epochs: list[int]) -> DataFrame:
    """Filter a live (id, seg, ...) frame through the COMMITTED delete
    epochs: rows whose seg is at or below their id's highest watermark
    drop. The watermark table is erasure-request-sized, hence the
    broadcast; no epochs means no work."""
    if not epochs:
        return live
    tomb = (spark.read.parquet(os.path.join(index_dir, "deletes"))
            .filter(F.col("d").isin(epochs))
            .groupBy("id").agg(F.max("at_seg").alias("_at")))
    return (live.join(F.broadcast(tomb), "id", "left")
                .filter(F.col("_at").isNull()
                        | (F.col("seg") > F.col("_at")))
                .drop("_at"))
