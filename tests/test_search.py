

def test_rrf_fuse_reference(spark):
    from pyspark.sql import functions as F

    from rassengine_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id long, rank int")
    b = spark.createDataFrame([(12, 1), (10, 2), (13, 3)], "id long, rank int")
    got = {r.id: r.score for r in rrf_fuse(a, b, rrf_k=60, top=4).collect()}
    want = {10: round(1 / 61 + 1 / 62, 6), 12: round(1 / 63 + 1 / 61, 6),
            11: round(1 / 62, 6), 13: round(1 / 63, 6)}
    assert got == want
