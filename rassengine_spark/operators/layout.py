"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping scans.

Why this exists at 100 TB: parquet scans prune row groups and files by
min/max statistics, but sorting by ONE column only clusters that column —
a predicate on a second dimension (e.g. `user_id` when the table is sorted
by `ts`) still touches every file. Interleaving the bits of both dimensions
into one Morton code and range-partitioning + sorting by it makes files
cover small HYPER-RECTANGLES of the key space, so a 2-D box predicate
(user slice × time slice) touches only the files whose rectangle
intersects the box — the same layout trick Delta/Iceberg expose as
`OPTIMIZE ... ZORDER BY`, built here from plain DataFrame ops:
one `repartitionByRange` (a range shuffle on the code) + an in-partition
sort, no custom physical operator.

The reference engine has no analog (single-node OpenSearch handles layout
internally); this extends the ingest/sink tier (SURVEY.md §2.1 S9/S10) the
same way the llmops modules extend the query tier.

Everything is integer math over built-in expressions (floor-division grid,
shift/AND bit interleave) — codegen-friendly and bit-identical in DuckDB,
so layouts are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_cell(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Integer grid cell in [0, 2^bits): floor((x - lo) / (hi - lo) * 2^bits),
    clamped at both ends so out-of-bounds values land in the edge cells.

    `lo`/`hi` are fixed constants chosen per column (NOT computed from the
    data — that would need an extra pass and make the code data-dependent;
    stable bounds also keep codes comparable across ingest batches).
    Double math is exact here while (x - lo) * 2^bits stays under 2^53;
    with bits=16 that allows spans up to ~1.4e11 — epoch-second ranges
    included."""
    if hi <= lo:
        raise ValueError("grid_cell needs hi > lo")
    n_cells = 1 << bits
    cell = F.floor((col.cast("double") - F.lit(float(lo)))
                   * F.lit(float(n_cells)) / F.lit(float(hi - lo)))
    return F.greatest(F.lit(0).cast("bigint"),
                      F.least(F.lit(n_cells - 1).cast("bigint"),
                              cell.cast("bigint")))


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-curve) code: interleave the low `bits` bits of two cell
    ids — a's bit j lands at position 2j, b's at 2j+1. Pure shift/AND
    expression, one codegen projection, no shuffle."""
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)),
                            2 * j + 1)
    return z


def zorder_code(a: Column, a_lo: float, a_hi: float,
                b: Column, b_lo: float, b_hi: float,
                bits: int = 16) -> Column:
    """2-D Z-order code: grid both columns to 2^bits cells, interleave."""
    return morton_interleave(grid_cell(a, a_lo, a_hi, bits),
                             grid_cell(b, b_lo, b_hi, bits), bits)


def zorder_layout(df: DataFrame, code: Column,
                  num_files: int = 200) -> DataFrame:
    """Cluster a DataFrame along a Z-order code before writing: range
    shuffle on the code (each output partition owns a contiguous code
    range = a set of small key-space rectangles) + in-partition sort (row
    groups within a file stay tight too). Write the result with any sink;
    parquet min/max stats then prune on EVERY interleaved dimension."""
    return (df.withColumn("_z", code)
              .repartitionByRange(num_files, F.col("_z"))
              .sortWithinPartitions("_z")
              .drop("_z"))
