"""Salted two-phase aggregation: exactness vs plain groupBy."""

from pyspark.sql import functions as F

from rassengine_spark.operators.skew import salted_agg


def test_salted_agg_exact(spark):
    # one hot key (90% of rows) + a cold key
    rows = [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = {r.k: r for r in salted_agg(
        df, ["k"],
        {"n": "count(*)", "s": "sum(v)", "lo": "min(id)", "hi": "max(id)"},
        num_salts=8, salt_source="id").collect()}
    want = {r.k: r for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("v").alias("s"),
                                F.min("id").alias("lo"),
                                F.max("id").alias("hi")).collect()}
    for k in want:
        assert got[k].n == want[k].n
        assert got[k].s == want[k].s
        assert (got[k].lo, got[k].hi) == (want[k].lo, want[k].hi)


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, "a")], "id long, k string")
    import pytest
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"m": "median(id)"})
