"""Z-order layout: code correctness + the data-skipping locality property
it exists for (a 2-D box predicate touches few range-partitions)."""

from pyspark.sql import functions as F

from rassengine_spark.operators.layout import (grid_cell, morton_interleave,
                                               zorder_code, zorder_layout)


def test_morton_interleave_hand_computed(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)],
                               "a bigint, b bigint")
    out = [r["z"] for r in
           df.select(morton_interleave(F.col("a"), F.col("b"), 3)
                     .alias("z")).collect()]
    # z(1,0)=1 (a bits at even positions), z(0,1)=2 (b at odd),
    # z(3,5) = a=0b011 -> 0b010101? a bit j -> 2j: 1+4; b=0b101 -> 2+32
    assert out == [0, 1, 2, 1 + 4 + 2 + 32]


def test_grid_cell_bounds_and_clamp(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (63.9,), (64.0,), (99.0,)],
                               "x double")
    cells = [r[0] for r in
             df.select(grid_cell(F.col("x"), 0, 64, 6)).collect()]
    # below-range clamps to 0, above-range clamps to 63; in-range = floor
    assert cells == [0, 0, 63, 63, 63]


def test_zorder_box_query_touches_few_partitions(spark):
    # 64x64 grid of points; 64 range-partitions of 64 cells each.
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("u"), (F.col("id") / 64).cast("bigint")
        .alias("t"))
    z = zorder_code(F.col("u"), 0, 64, F.col("t"), 0, 64, bits=6)
    # partition = contiguous z-range (what repartitionByRange produces)
    zp = pts.withColumn("part", F.floor(z / 64))
    # single-dim layout baseline: sorted by t only
    tp = pts.withColumn("part", F.floor(F.col("t") * 64 / 64))
    box = (F.col("u") < 8) & (F.col("t") < 8)   # 8x8 corner box, 64 rows
    z_parts = zp.filter(box).select("part").distinct().count()
    t_parts = tp.filter(box).select("part").distinct().count()
    # Morton: the 8x8 box is exactly one 64-cell z-block; t-sort smears it
    # across 8 partitions (and a u-slice would touch all 64)
    assert z_parts == 1
    assert t_parts == 8


def test_zorder_layout_partitions_are_disjoint_code_ranges(spark):
    pts = spark.range(1000).select(
        (F.col("id") % 50).alias("u"),
        (F.col("id") % 97).alias("t"))
    code = zorder_code(F.col("u"), 0, 64, F.col("t"), 0, 128, bits=7)
    laid = (zorder_layout(pts, code, num_files=8)
            .withColumn("z", code)
            .withColumn("pid", F.spark_partition_id()))
    ranges = (laid.groupBy("pid")
                  .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
                  .orderBy("lo").collect())
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"]      # contiguous, non-overlapping
