

def test_rrf_fuse_reference(spark):
    from pyspark.sql import functions as F

    from rassengine_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id long, rank int")
    b = spark.createDataFrame([(12, 1), (10, 2), (13, 3)], "id long, rank int")
    got = {r.id: r.score for r in rrf_fuse(a, b, rrf_k=60, top=4).collect()}
    want = {10: round(1 / 61 + 1 / 62, 6), 12: round(1 / 63 + 1 / 61, 6),
            11: round(1 / 62, 6), 13: round(1 / 63, 6)}
    assert got == want


def test_resolve_ids_trigram_typo_tolerant(spark):
    """A mid-token typo defeats exact/phrase and ties the prefix-fuzzy
    tier; trigram Jaccard still ranks the intended name first. Short
    (<3 char) and NULL names must not error."""
    from rassengine_spark.operators.search import resolve_ids_trigram
    df = spark.createDataFrame(
        [(1, "Customer#000000042"), (2, "Customer#000000420"),
         (3, "Supplier#000000042"), (4, "ab"), (5, None)],
        "id long, name string")
    got = resolve_ids_trigram(df, "name", "id", "Custmer#000000042",
                              k=3).collect()
    assert got[0]["id"] == 1                       # intended name first
    assert all(r["score"] > 0 for r in got)
    # exact query: perfect score 1.0 on the identical name
    exact = resolve_ids_trigram(df, "name", "id", "Customer#000000042",
                                k=1).collect()
    assert exact[0]["id"] == 1 and exact[0]["score"] == 1.0
    # short query: whole-string gram, no crash
    short = resolve_ids_trigram(df, "name", "id", "ab", k=2).collect()
    assert short[0]["id"] == 4 and short[0]["score"] == 1.0
