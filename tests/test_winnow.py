"""Winnowing fingerprints (text_analysis.winnow_*) and the
exact-substring pair detector built on them (dedup.substring_dup_pairs)."""

from pyspark.sql import functions as F

from rassengine_spark.llmops.dedup import substring_dup_pairs
from rassengine_spark.llmops.text_analysis import (winnow_expr,
                                                   winnow_fingerprints)

K, W = 8, 4


def _expr_fps(spark, rows):
    df = spark.createDataFrame(rows, "id int, text string")
    return set(map(tuple, df.select(
        "id", F.explode(winnow_expr(F.col("text"), K, W)).alias("fp"))
        .collect()))


def _arrow_fps(spark, rows):
    df = spark.createDataFrame(rows, "id int, text string")
    return set(map(tuple,
                   winnow_fingerprints(df, "text", "id", K, W).collect()))


def test_expr_arrow_parity_edge_cases(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog " * 5),
        (1, "short"),                      # < k chars -> fallback hash
        (2, ""),                           # empty -> fallback hash
        (3, "exactly8"),                   # == k chars, one shingle
        (4, "twelve chars"),               # k <= len < k+w-1: one window
        (5, "tabs\tand\nnewlines   collapse to one space x"),
        (6, "ünïcödé ñörmälïzätïön teststring"),   # non-ascii path
        (7, None),                         # null text
        (8, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"),       # all-equal shingles
    ]
    assert _expr_fps(spark, rows) == _arrow_fps(spark, rows)


def test_winnow_guarantee_shared_substring(spark):
    # two docs sharing >= k+w-1 normalized chars MUST share a fingerprint
    shared = "this exact sentence appears verbatim in both documents"
    rows = [(0, "prefix junk 123 " + shared + " tail A"),
            (1, "QQQ completely different lead-in " + shared + " other Z")]
    fps = _arrow_fps(spark, rows)
    a = {fp for i, fp in fps if i == 0}
    b = {fp for i, fp in fps if i == 1}
    assert a & b


def test_winnow_density(spark):
    # winnowing selects ~2/(w+1) of shingles; assert a sane upper bound
    # (every window contributes at most one fp) and non-triviality
    text = " ".join(f"tok{i}" for i in range(200))
    fps = _arrow_fps(spark, [(0, text)])
    n_shingles = len(text) - K + 1
    assert 2 <= len(fps) <= n_shingles - W + 1
    assert len(fps) < n_shingles / 2   # far below the full shingle set


def test_substring_dup_pairs_plants(spark):
    shared = "one common long passage that is clearly much longer than " \
             "the winnowing window size"
    rows = [(0, "alpha " + shared + " omega"),
            (1, "beta " + shared + " psi"),
            (2, "totally unrelated content with zero overlap qwerty")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {(r.id_a, r.id_b): r.shared
           for r in substring_dup_pairs(df, "text", "id", K, W,
                                        min_shared=2).collect()}
    assert (0, 1) in got and got[(0, 1)] >= 2
    assert not any(2 in p for p in got)


def test_substring_dup_pairs_max_postings(spark):
    # a fingerprint present in every doc is boilerplate; capping postings
    # at 2 removes it from the index and the pair counts
    boiler = "boilerplate footer shared by every single document here"
    rows = [(i, f"doc {i} body text " + boiler) for i in range(4)]
    df = spark.createDataFrame(rows, "id int, text string")
    uncapped = substring_dup_pairs(df, "text", "id", K, W,
                                   min_shared=1).count()
    capped = substring_dup_pairs(df, "text", "id", K, W, min_shared=1,
                                 max_postings=2).count()
    assert uncapped == 6           # all C(4,2) pairs share the footer
    assert capped < uncapped
