

def test_salted_join_exact_vs_plain(spark):
    """salted_join == the plain join for inner and left, including a
    pathologically hot key and dim-missing keys (left nulls)."""
    from rassengine_spark.operators.skew import salted_join
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)],
        "k long, payload int")
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold")], "k long, attr string")
    for how in ("inner", "left"):
        got = {(r.k, r.payload, r.attr) for r in
               salted_join(big, dim, ["k"], num_salts=8,
                           how=how).collect()}
        want = {(r.k, r.payload, r.attr) for r in
                big.join(dim, "k", how).collect()}
        assert got == want, how
    import pytest
    with pytest.raises(ValueError):
        salted_join(big, dim, ["k"], how="outer")
