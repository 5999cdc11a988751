"""DoReMi-style domain reweighting and embedding-centroid drift."""

import math

import pytest
from pyspark.sql import functions as F

from rassengine_spark.llmops.mixture import domain_reweight


def test_hand_computed_step(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("b", 1.0), ("b", 1.0)],
        "dom string, loss double")
    out = {r.domain: r for r in domain_reweight(
        df, "dom", "loss", eta=1.0, smoothing=0.0).collect()}
    # means: a=3, b=1, overall=2 -> excess a=1, b=0
    assert out["a"].mean_loss == pytest.approx(3.0)
    assert out["b"].mean_loss == pytest.approx(1.0)
    assert out["a"].excess == pytest.approx(1.0)
    assert out["b"].excess == pytest.approx(0.0)
    wa, wb = math.e, 1.0
    assert out["a"].weight == pytest.approx(wa / (wa + wb), abs=1e-5)
    assert out["b"].weight == pytest.approx(wb / (wa + wb), abs=1e-5)


def test_weights_sum_to_one_and_smooth(spark):
    df = spark.createDataFrame(
        [(f"d{i}", float(i % 3)) for i in range(30)],
        "dom string, loss double")
    rows = domain_reweight(df, "dom", "loss",
                           eta=2.0, smoothing=0.5).collect()
    assert sum(r.weight for r in rows) == pytest.approx(1.0, abs=1e-4)
    # smoothing=1.0 -> exactly uniform regardless of losses
    uni = domain_reweight(df, "dom", "loss", smoothing=1.0).collect()
    for r in uni:
        assert r.weight == pytest.approx(1.0 / len(uni), abs=1e-6)


def test_null_losses_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 3.0)], "dom string, loss double")
    out = {r.domain: r for r in domain_reweight(df, "dom", "loss").collect()}
    assert out["a"].n_docs == 1
    with pytest.raises(ValueError):
        domain_reweight(df, "dom", "loss", smoothing=2.0)
    with pytest.raises(ValueError):
        domain_reweight(df, "dom", "loss", eta=0.0)


def test_embedding_centroid_drift_hand_computed(spark):
    from rassengine_spark.llmops.dataquality import embedding_centroid_drift
    rows = [
        # group g1: baseline along +x, current along +y -> cos 0, L2 sqrt(2)
        (0, "g1", [1.0, 0.0]), (1, "g1", [0.0, 1.0]),
        # group g2: identical windows -> cos 1, shift 0
        (2, "g2", [0.5, 0.5]), (3, "g2", [0.5, 0.5]),
        # group g3: baseline only -> dropped
        (4, "g3", [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v array<double>")
    out = {r.g: r for r in embedding_centroid_drift(
        df, "g", F.col("id") % 2 == 1, "v").collect()}
    assert set(out) == {"g1", "g2"}
    assert out["g1"].cos_centroid == pytest.approx(0.0, abs=1e-6)
    assert out["g1"].l2_shift == pytest.approx(math.sqrt(2.0), abs=1e-6)
    assert out["g2"].cos_centroid == pytest.approx(1.0, abs=1e-6)
    assert out["g2"].l2_shift == pytest.approx(0.0, abs=1e-6)
    assert out["g1"].n_base == 1 and out["g1"].n_cur == 1


def test_embedding_centroid_drift_averages(spark):
    from rassengine_spark.llmops.dataquality import embedding_centroid_drift
    # baseline centroid = mean([2,0],[0,2]) = [1,1]; current = [1,1]
    rows = [(0, [2.0, 0.0]), (2, [0.0, 2.0]), (1, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>") \
              .withColumn("g", F.lit("x"))
    r = embedding_centroid_drift(
        df, "g", F.col("id") % 2 == 1, "v").collect()[0]
    assert r.cos_centroid == pytest.approx(1.0, abs=1e-6)
    assert r.l2_shift == pytest.approx(0.0, abs=1e-6)
    assert r.n_base == 2 and r.n_cur == 1


def test_extreme_excess_clamped_no_overflow(spark):
    """Huge eta x excess saturates at the exponent clamp instead of
    wrapping the normalization sum negative (review finding)."""
    df = spark.createDataFrame(
        [("a", 1000.0)] * 3 + [("b", 0.0)] * 3, "dom string, loss double")
    rows = domain_reweight(df, "dom", "loss", eta=5.0,
                           smoothing=0.0).collect()
    ws = {r.domain: r.weight for r in rows}
    assert all(0.0 <= w <= 1.0 for w in ws.values())
    assert sum(ws.values()) == pytest.approx(1.0, abs=1e-4)
    assert ws["a"] > 0.99              # hard domain takes ~all the mass
