"""Unit tests for the lexical/vector expression builders (SURVEY §2.6)."""

import math

from pyspark.sql import functions as F

from rassengine_spark.functions import text as T
from rassengine_spark.functions import vector as V


def test_tokenize_and_terms(spark):
    df = spark.createDataFrame([("Hello, World! x2",), (None,)], ["t"])
    rows = df.select(T.tokenize("t").alias("tok")).collect()
    assert rows[0]["tok"] == ["hello", "world", "x2"]
    assert rows[1]["tok"] is None
    assert T.terms_of("Hello, World!") == ["hello", "world"]


def test_phrase_match(spark):
    df = spark.createDataFrame(
        [("the hash join runs",), ("join hash",), (None,)], ["t"])
    got = [r[0] for r in df.select(T.phrase_match("t", "Hash  Join")).collect()]
    assert got == [True, False, False]


def test_auto_fuzziness_thresholds():
    # OpenSearch AUTO: <=2 -> 0, 3-5 -> 1, >=6 -> 2
    assert T.auto_fuzziness("ab") == 0
    assert T.auto_fuzziness("abc") == 1
    assert T.auto_fuzziness("abcde") == 1
    assert T.auto_fuzziness("abcdef") == 2


def test_fuzzy_and_prefix_match(spark):
    df = spark.createDataFrame([("stream batch spark",)], ["t"])
    tok = T.tokenize("t")
    out = df.select(
        T.fuzzy_term_match(tok, "streem").alias("a"),   # d=2 matches stream
        T.fuzzy_term_match(tok, "xx").alias("b"),       # d=0, absent
        T.prefix_term_match(tok, "spa").alias("c"),
        T.all_terms_prefix(tok, ["str", "ba"]).alias("d"),
        T.all_terms_prefix(tok, ["str", "zz"]).alias("e"),
    ).collect()[0]
    assert (out["a"], out["b"], out["c"], out["d"], out["e"]) == (
        True, False, True, True, False)


def test_vector_ops(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    row = df.select(
        V.dot_literal(F.col("v"), [1.0, 2.0]).alias("dot"),
        V.l2_norm(F.col("v")).alias("n"),
        V.l2_norm(V.l2_normalize(F.col("v"))).alias("unit"),
        V.cosine(F.col("v"), F.array(F.lit(3.0), F.lit(4.0))).alias("cos"),
    ).collect()[0]
    assert row["dot"] == 11.0
    assert row["n"] == 5.0
    assert math.isclose(row["unit"], 1.0, abs_tol=1e-6)
    assert math.isclose(row["cos"], 1.0, abs_tol=1e-6)
