"""Graph centrality over co-occurrence edges: distributed PageRank in
integer micro-units.

Complements the dup-cluster tier (llmops/dedup.py::dup_clusters — the
other iterative graph op): where connected components answers "which docs
are the same", PageRank answers "which nodes matter" — the authority
score a crawl-curation pipeline hangs host/document quality on.

Engine-exactness: the classic float formulation sums FP contributions in
shuffle order — not reproducible across engines. Here ranks live in
integer micro-units (1e6 == 1.0): per-node contribution is r div deg
(integral division), the damped update is 150000 + (85·Σ) div 100, and
integer sums are order-free, so every iteration is bit-exact in any
engine and the SQL oracle unrolls the same iterations verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_micro(edges: DataFrame, iters: int = 3,
                   damping_pct: int = 85) -> DataFrame:
    """(node, rank_micro) after `iters` synchronous PageRank rounds over
    a directed edge list (src, dst) in which every node has at least one
    out-edge (symmetric co-occurrence graphs satisfy this by
    construction; feed dangling nodes a self-loop otherwise — with
    dangling mass unhandled, their rank resets to the teleport term).

    Plan shape at 100 TB: per round, one broadcast-free join of the edge
    list against the |V|-row rank frame on src (both shuffle-partitioned
    on the same key, so AQE reuses the layout) and one hash-aggregate on
    dst — the standard distributed PageRank shape; no sorts, no
    collects, no per-node windows. Hot destinations (celebrity nodes)
    are plain aggregate skew — map-side combine absorbs them. A fixed
    small `iters` keeps lineage linear; checkpointing is unnecessary."""
    # the edge list feeds every round plus the degree pass (iters + 2
    # consumers); without pinning, an upstream co-occurrence self-join
    # re-executes per consumer. Lazy localCheckpoint over cache(): blocks
    # release on GC instead of pinning until unpersist (NOTES pattern);
    # the executor-loss caveat is acceptable for a short fixed loop.
    edges = edges.select(F.col("src").cast("long"),
                         F.col("dst").cast("long")) \
                 .localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")) \
               .localCheckpoint(eager=False)
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1000000).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (ranks.join(deg, ranks.node == deg.src)
                        .select(F.col("src"),
                                F.expr("r div deg").alias("c")))
        sums = (edges.join(contrib, "src")
                     .groupBy("dst")
                     .agg(F.sum("c").alias("s")))
        ranks = (ranks.join(sums, ranks.node == sums.dst, "left")
                      .select(F.col("node"),
                              (F.lit(150000).cast("long")
                               + F.expr(f"{damping_pct} * coalesce(s, 0)"
                                        " div 100")).alias("r")))
    return ranks.select("node", F.col("r").alias("rank_micro"))


def cooccurrence_edges(df: DataFrame, group_col: str,
                       item_col: str,
                       max_group_size: int | None = None) -> DataFrame:
    """Distinct directed (src, dst) pairs of items sharing a group —
    the symmetric co-occurrence graph (both directions materialize, so
    every node with any edge has out-degree >= 1, as pagerank_micro
    requires). Scale: the self-join shuffles on the group key; a group
    of g items emits g·(g−1) pairs. `max_group_size` caps that g² skew:
    groups larger than the cap are dropped BEFORE the self-join (one
    count aggregate + semi-join — the LSH max_bucket_size trade: a
    10^6-item pathological group is 10^12 pairs, and such groups are
    boilerplate, not signal). None = exact graph (oracle-checkable)."""
    a = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("src"))
    if max_group_size is not None:
        ok = (a.groupBy("g").agg(F.count(F.lit(1)).alias("_gs"))
               .filter(F.col("_gs") <= max_group_size).select("g"))
        a = a.join(ok, "g", "left_semi")
    b = a.select("g", F.col("src").alias("dst"))
    # distinct the src<dst half then mirror: the dedup shuffle carries
    # half the pairs and the union is shuffle-free
    half = (a.join(b, "g")
             .filter(F.col("src") < F.col("dst"))
             .select("src", "dst")
             .distinct())
    return half.union(half.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
