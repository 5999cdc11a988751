"""S6 chunker — fixed word-window chunking as a pure Spark expression.

Reference: ``chunk_text`` splits on whitespace and emits consecutive
``CHUNK_SIZE``-word windows joined with single spaces, no overlap
(app/main.py:2160-2170, CHUNK_SIZE=512 at app/main.py:79).

Implemented with sequence/transform/slice + posexplode — fully JVM-side and
data-parallel: a 100 TB corpus chunks in one narrow stage with zero shuffle
(posexplode is a per-row generator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words_of(col: Column | str) -> Column:
    """Whitespace word-split, empty tokens dropped (Python str.split())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def chunk_expr(col: Column | str, chunk_size: int) -> Column:
    """array<string> of space-joined word windows of `chunk_size`."""
    w = words_of(col)
    n_chunks = F.ceil(F.size(w) / F.lit(chunk_size)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.when(F.size(w) > 0, F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(w, i * chunk_size + 1, chunk_size), " "),
    )).otherwise(F.array().cast("array<string>"))


def chunk_table(df: DataFrame, text_col: str, id_cols: list[str],
                chunk_size: int = 512) -> DataFrame:
    """One row per chunk: id_cols + (chunk_idx bigint, chunk_text string).
    Rows with empty text produce no chunks (reference: empty texts are
    skipped before embedding, app/main.py:227-228)."""
    chunks = chunk_expr(text_col, chunk_size)
    return (df.select(*id_cols, F.posexplode(chunks)
                      .alias("chunk_idx", "chunk_text"))
              .withColumn("chunk_idx", F.col("chunk_idx").cast("long")))
