"""Functional tests for the learned-model plug-ins (ml/plugins.py) —
the Spark-side equivalents of the reference's live models
(app/main.py:2483-2528 cross-encoder rerank, 2613-2634 zero-shot intent).

This container ships without torch/transformers, so every test here
SKIPS cleanly (the sessionize_v2 environment-gate pattern); in an
environment with the extras installed they exercise each plug-in through
the exact seam the deterministic default uses — with_embeddings for
EmbedFn, classify_batch for the intent router, rerank_topk's mapInPandas
path for the cross-encoder, entities_to_filter for NER. The gate test
(test_ml.py::test_hf_plugins_gate_cleanly_when_absent) covers the
fail-fast side and always runs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rassengine_spark.ml import plugins

pytestmark = pytest.mark.skipif(
    not plugins.hf_available(),
    reason="optional transformers+torch stack not installed")


def test_hf_embedder_through_with_embeddings(spark):
    """Same contract as hash_ngram_embedder: (n texts) -> (n, dim)
    float32, rows L2-normalized, blank -> zero vector — checked through
    the real Arrow path, not by calling the closure directly."""
    from rassengine_spark.ml.embed import with_embeddings

    df = spark.createDataFrame(
        [(1, "severe hypertension treatment"),
         (2, "quarterly revenue grew nine percent"),
         (3, ""), (4, None)],
        "id int, text string")
    out = with_embeddings(df, "text", embed_fn=plugins.hf_embedder()) \
        .orderBy("id").collect()
    vecs = {r["id"]: np.asarray(r["embedding"], dtype=np.float32)
            for r in out}
    dim = len(vecs[1])
    assert dim >= 64                       # a real model's hidden size
    assert all(len(v) == dim for v in vecs.values())
    for i in (1, 2):
        assert abs(float(np.linalg.norm(vecs[i])) - 1.0) < 1e-3
    for i in (3, 4):                       # blank -> zero (app/main.py:227)
        assert np.all(vecs[i] == 0)
    # embeddings must carry meaning: identical text beats unrelated text
    sim_same = float(np.dot(vecs[1], vecs[1]))
    sim_diff = float(np.dot(vecs[1], vecs[2]))
    assert sim_same > sim_diff


def test_hf_zero_shot_intent_through_classify_batch():
    """str -> one of the 12 labels, through the classify_batch seam."""
    from rassengine_spark.ml.intent import INTENT_CATEGORIES, classify_batch

    labels = classify_batch(
        ["How many patients have hypertension?",
         "Compare heart surgery vs medication outcomes."],
        fn=plugins.hf_zero_shot_intent())
    assert len(labels) == 2
    assert all(lb in INTENT_CATEGORIES for lb in labels)


def test_hf_cross_encoder_through_rerank_topk(spark):
    """(query, texts) -> scores through rerank_topk's mapInPandas path:
    right row count, descending score order, ids preserved."""
    from rassengine_spark.ml.rerank import rerank_topk

    hits = spark.createDataFrame(
        [(1, "hypertension is treated with ACE inhibitors"),
         (2, "the quarterly report shows revenue growth"),
         (3, "blood pressure medication for hypertension")],
        "id int, text string")
    out = rerank_topk(hits, "how is hypertension treated?", "text", "id",
                      k=2, rerank_fn=plugins.hf_cross_encoder()).collect()
    assert len(out) == 2
    assert out[0]["rerank_score"] >= out[1]["rerank_score"]
    assert {r["id"] for r in out} <= {1, 2, 3}
    # relevance sanity: the finance doc should not win
    assert out[0]["id"] in (1, 3)


def test_hf_token_ner_through_entities_to_filter():
    """str -> list[Entity] feeding entities_to_filter (P2) unchanged."""
    from rassengine_spark.ml.ner import entities_to_filter

    tag = plugins.hf_token_ner("dslim/bert-base-NER")
    ents = tag("John Doe was seen at Boston General on 2024-01-02.")
    assert isinstance(ents, list)
    for e in ents:
        assert e.text and e.label
    # entities_to_filter accepts whatever the tagger emits (None when
    # nothing maps to a known filter field is a valid outcome)
    entities_to_filter(ents)
