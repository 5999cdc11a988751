"""MLlib ANN tier: KMeans IVF quantizer and BRP-LSH top-k agree with exact
brute force on well-separated normalized vectors."""

import math

from pyspark.sql import functions as F

from rassengine_spark.llmops import similarity as SIM
from rassengine_spark.llmops.mllib_ann import brp_lsh_topk, ivf_centroids_kmeans


def _norm(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def corpus(spark):
    # two tight clusters on the unit sphere + ids
    rows = [(i, _norm([1.0, 0.05 * i, 0.0])) for i in range(10)]
    rows += [(100 + i, _norm([0.0, 0.05 * i, 1.0])) for i in range(10)]
    return spark.createDataFrame(rows, "vec_id int, v array<double>")


def queries(spark):
    return spark.createDataFrame(
        [(0, _norm([1.0, 0.1, 0.0])), (1, _norm([0.0, 0.1, 1.0]))],
        "qid int, v array<double>")


def test_kmeans_centroids_feed_ivf(spark):
    c = corpus(spark)
    cents = ivf_centroids_kmeans(c, "v", n_cells=2, seed=7)
    assert len(cents) == 2 and len(cents[0]) == 3
    ivf = SIM.ivf_topk(c, queries(spark), "v", "vec_id", "qid",
                       k=3, n_probe=1, centroids=cents)
    exact = SIM.brute_force_topk(c, queries(spark), "v", "vec_id", "qid",
                                 k=3)
    rec = {r["query_id"]: r["recall"]
           for r in SIM.recall_at_k(ivf, exact).collect()}
    # learned cells align with the two true clusters -> perfect recall
    # even probing a single cell
    assert rec == {0: 1.0, 1: 1.0}


def test_brp_lsh_topk_matches_bruteforce_order(spark):
    c, q = corpus(spark), queries(spark)
    got = brp_lsh_topk(c, q, "v", "vec_id", "qid", k=3,
                       bucket_length=4.0, num_tables=5)
    exact = SIM.brute_force_topk(c, q, "v", "vec_id", "qid", k=3)
    # normalized vectors: euclidean rank == cosine rank
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    for r in exact.collect():
        ranked = dict(by_q[r["query_id"]])
        assert ranked[r["rank"]] == r["id"]
