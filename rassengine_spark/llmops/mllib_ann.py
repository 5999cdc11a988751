"""MLlib-backed ANN components: a learned IVF quantizer (KMeans) and a
BucketedRandomProjectionLSH similarity join — the "MLlib + DataFrame for
batch indexing" tier the project baseline names (BASELINE.json), next to
the engine-exact deterministic variants in similarity.py.

Division of labor:

- similarity.py's md5-sampled quantizer / integer hyperplanes are
  DETERMINISTIC and engine-exact — they carry the DuckDB oracles.
- These MLlib variants trade that determinism for learned quality: KMeans
  cells follow the data distribution (tighter cells -> better recall at
  the same n_probe), and BRP-LSH amortizes bucketing across `numHashTables`
  hash tables with a tunable `bucketLength`. Both slot into the SAME
  downstream operators (`ivf_topk(centroids=...)`; top-k output shape),
  so callers switch tiers without replanning.

Fit cost at 100 TB: KMeans fits on a SAMPLE (quantizers don't need the
full corpus — pass e.g. a 1% hash_sample), then assignment is the usual
centroid-literal projection. The LSH model "fit" is just drawing random
hyperplanes — O(1) — and transform is a per-row projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ivf_centroids_kmeans(corpus: DataFrame, vec_col: str,
                         n_cells: int = 8, seed: int = 42,
                         max_iter: int = 20) -> list[list[float]]:
    """Learned IVF coarse quantizer: KMeans cluster centers as plain
    Python lists, ready for `similarity.ivf_topk(centroids=...)`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>"))
        .alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def brp_lsh_topk(corpus: DataFrame, queries: DataFrame, vec_col: str,
                 id_col: str, query_id_col: str, k: int = 5,
                 bucket_length: float = 2.0, num_tables: int = 3,
                 threshold: float = float("inf"),
                 seed: int = 42) -> DataFrame:
    """Per-query top-k via MLlib BucketedRandomProjectionLSH
    `approxSimilarityJoin`: (query_id, id, dist, rank), dist = euclidean.

    For L2-NORMALIZED vectors (the engine's invariant, S8) euclidean rank
    order == cosine rank order (d² = 2 - 2·cos), so this is a drop-in ANN
    tier for the same retrieval semantics. Candidates only form inside
    colliding hash buckets; `threshold` additionally bounds the join
    (pass a finite distance to prune further at scale)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("id"),
                      array_to_vector(F.col(vec_col).cast("array<double>"))
                      .alias("features"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       array_to_vector(F.col(vec_col).cast("array<double>"))
                       .alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed)
    model = lsh.fit(c)
    joined = (model.approxSimilarityJoin(c, q, threshold, "dist")
              .select(F.col("datasetB.query_id").alias("query_id"),
                      F.col("datasetA.id").alias("id"),
                      F.round(F.col("dist"), 6).alias("dist")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("id").asc())
    return (joined.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
