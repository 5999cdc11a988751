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


def word_ngram_array(w: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array, multiplicity kept, in
    position order; fewer than n tokens yields an empty array. LINEAR
    expansion: n shifted views of the array zip elementwise — the
    per-position form (array_join(slice(w, i, n)) inside transform)
    allocates a sliced array plus a joined string per gram and profiled
    ~4x slower on corpus passes."""
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))   # n-gram count
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(w, j + 1, m),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


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


def chunk_expr_overlap(col: Column | str, chunk_size: int,
                       overlap: int) -> Column:
    """array<string> of word windows with `overlap` words shared between
    consecutive chunks (stride = chunk_size - overlap).

    The reference chunker is strictly non-overlapping (app/main.py:
    2160-2170); overlap is the standard retrieval/pretraining extension —
    boundary-spanning sentences appear whole in at least one chunk at the
    cost of ~size/(size-overlap)x stored tokens. Same plan shape: a pure
    per-row generator expression, zero shuffle at any corpus size.

    Windows: starts 0, stride, 2*stride, ... covering every word; a final
    short window is emitted only if it adds new words (mirrors the
    non-overlap variant's tail behavior)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    w = words_of(col)
    n = F.size(w)
    # number of windows: 1 + ceil(max(0, n - chunk_size) / stride)
    extra = F.greatest(n - F.lit(chunk_size), F.lit(0))
    n_chunks = (F.lit(1) + F.ceil(extra / F.lit(stride))).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.when(n > 0, F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(w, i * stride + 1, chunk_size), " "),
    )).otherwise(F.array().cast("array<string>"))
