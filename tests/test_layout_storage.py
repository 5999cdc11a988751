"""Z-order layout at the STORAGE level: write the same rows as parquet
under (a) single-column sort and (b) Z-order clustering, then read back
each file's min/max column statistics (what a scan's file/row-group
pruning actually uses) and count how many files a 2-D box predicate could
skip. Z-order must let the box skip most files; the 1-D sort cannot skip
any on the secondary column."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rassengine_spark.operators.layout import zorder_code, zorder_layout

N_FILES = 8
GRID = 64


def _pts(spark):
    # 64x64 grid of (u, t) points, shuffled order
    return (spark.range(GRID * GRID)
            .select((F.col("id") % GRID).alias("u"),
                    (F.col("id") / GRID).cast("bigint").alias("t")))


def _file_ranges(path):
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        mins = {"u": None, "t": None}
        maxs = {"u": None, "t": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    mins[name] = lo if mins[name] is None \
                        else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None \
                        else max(maxs[name], hi)
        out.append((mins, maxs))
    return out


def _files_hit(ranges, u_hi, t_hi):
    # files whose [min,max] boxes intersect the predicate
    # u < u_hi AND t < t_hi
    return sum(1 for mins, maxs in ranges
               if mins["u"] < u_hi and mins["t"] < t_hi)


def test_zorder_files_prune_2d_box(spark, tmp_path):
    pts = _pts(spark)
    z_path = str(tmp_path / "zorder")
    t_path = str(tmp_path / "tsort")

    code = zorder_code(F.col("u"), 0, GRID, F.col("t"), 0, GRID, bits=6)
    zorder_layout(pts, code, num_files=N_FILES).write.parquet(z_path)
    (pts.repartitionByRange(N_FILES, F.col("t"))
        .sortWithinPartitions("t").write.parquet(t_path))

    z_ranges = _file_ranges(z_path)
    t_ranges = _file_ranges(t_path)
    assert len(z_ranges) == N_FILES and len(t_ranges) == N_FILES

    # corner box: u < 16 AND t < 16 (1/16 of the key space)
    z_hit = _files_hit(z_ranges, 16, 16)
    t_hit = _files_hit(t_ranges, 16, 16)
    # z-order: the corner box lives in the first z-range files only
    assert z_hit <= 2
    # t-sort: every t<16 file spans ALL u values -> no u pruning, and the
    # t range covers 1/4 of files at best
    assert t_hit >= 2

    # u-slice: u < 8 over all t — the case 1-D t-sort cannot prune at all
    zu = sum(1 for mins, maxs in z_ranges if mins["u"] < 8)
    tu = sum(1 for mins, maxs in t_ranges if mins["u"] < 8)
    assert tu == N_FILES                 # every t-sorted file is hit
    assert zu < N_FILES                  # z-order skips some files even
    #                                      on the secondary dimension
