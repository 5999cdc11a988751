"""Operator-level tests against hand-computed frames (SURVEY §5 strategy)."""

from pyspark.sql import functions as F

from rassengine_spark.operators import search as ops
from rassengine_spark.operators import windows as W

SPEC = ops.CorpusSpec(
    id_col="id",
    text_fields=["body"],
    keyword_fields=["tag"],
    date_fields=["ts"],
    note_fields={"body": 3.0},
    structured_fields=["body"],
    identity_fields={"name": 4.0},
    compare_fields={"body": 2.0},
    embedding_col="emb",
    partition_col="tenant",
)


def corpus(spark):
    rows = [
        (1, "alpha beta gamma", "red", "2024-01-01 00:00:00", [1.0, 0.0], "Ann Lee", "t1"),
        (2, "beta delta", "blue", "2024-01-10 00:00:00", [0.0, 1.0], "Bob Low", "t1"),
        (3, "alpha beta", "red", "2023-01-01 00:00:00", [0.6, 0.8], "Ann Lee", "t2"),
        (4, "epsilon", None, None, [1.0, 0.0], None, "t1"),
    ]
    df = spark.createDataFrame(
        rows, "id int, body string, tag string, ts string, "
              "emb array<double>, name string, tenant string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_exact_match_search(spark):
    out = ops.exact_match_search(corpus(spark), SPEC, "alpha beta", k=10)
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got == {1: 2.0, 3: 2.0}          # phrase hit in body, boost 2.0


def test_semantic_search_orders_by_dot(spark):
    out = ops.semantic_search(corpus(spark), SPEC, [1.0, 0.0], k=2)
    assert [r["id"] for r in out.collect()] == [1, 4]  # tie -> id asc


def test_semantic_search_filter_pushdown(spark):
    out = ops.semantic_search(corpus(spark), SPEC, [1.0, 0.0], k=5,
                              partition_key="t1")
    assert {r["id"] for r in out.collect()} == {1, 4}


def test_hybrid_scores_sum_clauses(spark):
    out = ops.hybrid_search(corpus(spark), SPEC, "alpha red", [0.0, 1.0], k=5)
    got = {r["id"]: r["score"] for r in out.collect()}
    # id1: 1.5*1 (alpha) + 1.0 (tag red) + 2.0*0.0 = 2.5
    assert got[1] == 2.5
    # id3: 1.5*1 + 1.0 + 2.0*0.8 = 4.1
    assert abs(got[3] - 4.1) < 1e-9


def test_structured_prefix_and(spark):
    out = ops.structured_search(corpus(spark), SPEC, "alp bet", k=5)
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_aggregate_search_tiebreak(spark):
    out = ops.aggregate_search(corpus(spark), SPEC, ["tag"], size=5)
    rows = [(r["key"], r["cnt"]) for r in out.collect()]
    assert rows == [("red", 2), ("blue", 1)]   # count desc, key asc


def test_temporal_search_window_and_sort(spark):
    out = ops.temporal_search(corpus(spark), SPEC, "beta", k=5,
                              now="2024-02-01 00:00:00")
    assert [r["id"] for r in out.collect()] == [2, 1]  # ts desc, 3 too old


def test_collapse_best_per_key(spark):
    df = corpus(spark).withColumn("score", F.col("id").cast("double"))
    out = ops.collapse_best_per_key(df, "tenant", "score", "id")
    assert {(r["tenant"], r["id"]) for r in out.collect()} == {("t1", 4), ("t2", 3)}


def test_resolve_ids_from_name_tiers(spark):
    out = ops.resolve_ids_from_name(corpus(spark), "name", "id", "Ann Lee", k=5)
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got[1] == 3.0 and got[3] == 3.0     # exact tier
    assert 2 not in got                        # "Bob Low" beyond AUTO distance


def test_has_any_data(spark):
    assert ops.has_any_data(corpus(spark))
    assert not ops.has_any_data(corpus(spark).filter(F.col("id") > 99))


def test_last_n_per_key_chronological(spark):
    df = corpus(spark).filter(F.col("ts").isNotNull())
    out = W.last_n_per_key(df, "tenant", "ts", "id", n=1)
    assert [(r["tenant"], r["id"]) for r in out.collect()] == [("t1", 2), ("t2", 3)]


def test_dedup_concat_by_key(spark):
    out = W.dedup_concat_by_key(corpus(spark), "tenant", "body", "id", sep="|")
    got = {r["tenant"]: r["context"] for r in out.collect()}
    assert got["t1"] == "alpha beta gamma|beta delta|epsilon"
    assert got["t2"] == "alpha beta"
