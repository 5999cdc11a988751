"""Sketch aggregates: HLL++ distinct count and approximate percentiles must
track their exact twins within published error bounds (the driver's oracle
can't hash-compare algorithm-specific sketch outputs, so bounds live here)."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") % 1000).alias("u"))
    approx = df.agg(F.approx_count_distinct("u").alias("a")).collect()[0].a
    # default rsd = 5%; allow 3 sigma
    assert abs(approx - 1000) <= 1000 * 0.15


def test_percentile_approx_within_accuracy(spark):
    df = spark.range(10000).select(F.col("id").cast("double").alias("v"))
    got = df.agg(
        F.percentile_approx("v", [0.5, 0.95], 10000).alias("q"),
        F.expr("percentile(v, array(0.5, 0.95))").alias("exact")).collect()[0]
    for a, e in zip(got.q, got.exact):
        # accuracy 10000 -> rank error <= N/10000 = 1 row; give slack
        assert abs(a - e) <= 10.0


def test_sketch_rollup_tracks_exact(spark):
    # grouped: per-key approx distinct within 15% of exact
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), ((F.col("id") * 7) % 900).alias("u"))
    j = (df.groupBy("g")
           .agg(F.approx_count_distinct("u").alias("a"),
                F.countDistinct("u").alias("e")))
    for r in j.collect():
        assert abs(r.a - r.e) <= max(5, 0.15 * r.e)
