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
                   damping_pct: int = 85,
                   checkpoint_every: int = 0) -> DataFrame:
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
    are plain aggregate skew — map-side combine absorbs them.

    `checkpoint_every` (r09): the rank frame feeds each round TWICE
    (contrib + the left join), so an unpinned loop doubles the logical
    tree per round — the hypothesis was that a lazy localCheckpoint of
    the rank frame every k rounds would cut the 2^iters analysis cost.
    MEASURED OTHERWISE and left DISABLED (0): under AQE a lazy
    localCheckpoint still executes the plan's shuffle stages when the
    RDD is materialized at construction, so each pin converts deferred,
    well-pipelined execution into extra up-front driver jobs. Warm
    interleaved 3-rep A/B at sf0.1/32c (plan+exec seconds):
    ck=0 5.44/4.67/5.92, ck=1 6.39/6.63/7.68, ck=2 6.09/6.47/6.14 —
    the pre-r09 shape wins at iters=3. Values are identical under any
    setting (pins change plans, never data); the knob stays for larger
    iteration counts where tree doubling eventually dominates."""
    # the edge list feeds every round plus the degree pass (iters + 2
    # consumers); without pinning, an upstream co-occurrence self-join
    # re-executes per consumer. Lazy localCheckpoint over cache(): blocks
    # release on GC instead of pinning until unpersist (NOTES pattern);
    # the executor-loss caveat is acceptable for a short fixed loop.
    # r09 (guide §2.4): pre-partition the pinned edges by the round join
    # key — localCheckpoint preserves outputPartitioning in the
    # LogicalRDD, so the degree aggregate and EVERY round's edges-side
    # join exchange vanish (only the |V|-row contrib frame shuffles per
    # round). Partition count from the session conf, not the local core
    # count. Warm interleaved 3-rep A/B at sf0.1/32c (exec seconds):
    # unpartitioned 2.40/2.29/2.31, pre-partitioned 1.67/1.60/1.59 —
    # values identical (integer ops are partitioning-independent; the
    # probe compared full sorted outputs).
    npart = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.select(F.col("src").cast("long"),
                         F.col("dst").cast("long")) \
                 .repartition(npart, "src") \
                 .localCheckpoint(eager=False)
    # deg rides ON the rank frame (it never changes), so each round is
    # two joins (edges x contrib, ranks x sums) instead of three — the
    # ranks x deg re-join per round was pure overhead
    ranks = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                  .select(F.col("src").alias("node"),
                          F.lit(1000000).cast("long").alias("r"), "deg")
                  .localCheckpoint(eager=False))
    for i in range(iters):
        contrib = ranks.select(F.col("node").alias("src"),
                               F.expr("r div deg").alias("c"))
        sums = (edges.join(contrib, "src")
                     .groupBy("dst")
                     .agg(F.sum("c").alias("s")))
        ranks = (ranks.join(sums, ranks.node == sums.dst, "left")
                      .select(F.col("node"),
                              (F.lit(150000).cast("long")
                               + F.expr(f"{damping_pct} * coalesce(s, 0)"
                                        " div 100")).alias("r"),
                              "deg"))
        if (checkpoint_every and (i + 1) % checkpoint_every == 0
                and i + 1 < iters):
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_micro"))


def _group_pair_rows(df: DataFrame, group_col: str, item_col: str,
                     max_group_size: int | None = None) -> DataFrame:
    """One (src, dst) row per (group, unordered DISTINCT item pair) with
    src < dst — the shared candidate generator of cooccurrence_edges and
    basket_edges. Pairs are generated IN-GROUP: collect_set per group
    (map-side partial aggregation dedups (group, item) rows before the
    exchange), then two codegen generators expand each sorted item array
    into its ordered pairs. One shuffle of (g, i) total — the classic
    distinct + self-join formulation this replaces cost a second
    distinct exchange plus a join whose build side was the corpus itself
    (at bench scale the planner broadcast 600k rows; at real scale it
    degrades to shuffling the corpus twice). A group of g distinct items
    still emits g·(g−1)/2 rows; `max_group_size` caps that g² skew by
    dropping larger groups right after the aggregate (a 10^6-item
    pathological group is 10^12 pairs, and such groups are boilerplate,
    not signal). NULL items never pair (collect_set drops them), and NULL
    group rows are filtered out BEFORE the aggregate: the classic
    distinct+self-join formulation this generator replaced (and the
    DuckDB oracles' JOIN ... ON a.key = b.key) drop NULL join keys, so
    pairing NULL-group rows would silently diverge from the oracle the
    first time a nullable group column arrives (ADVICE r08; TPC-H keys
    are non-null, so current entries are value-identical either way)."""
    grp = (df.select(F.col(group_col).alias("g"), F.col(item_col).alias("i"))
             .filter(F.col("g").isNotNull())
             .groupBy("g")
             .agg(F.array_sort(F.collect_set("i")).alias("items")))
    if max_group_size is not None:
        grp = grp.filter(F.size("items") <= max_group_size)
    return (grp.select(F.posexplode("items").alias("k", "src"), "items")
               .select("src",
                       F.explode(F.expr(
                           "slice(items, k + 2, size(items) - k - 1)"))
                       .alias("dst")))


def cooccurrence_edges(df: DataFrame, group_col: str,
                       item_col: str,
                       max_group_size: int | None = None) -> DataFrame:
    """Distinct directed (src, dst) pairs of items sharing a group —
    the symmetric co-occurrence graph (both directions materialize, so
    every node with any edge has out-degree >= 1, as pagerank_micro
    requires). Pair generation is in-group (_group_pair_rows: one
    (g, i) shuffle + generators, no self-join); `max_group_size` drops
    groups with more than that many DISTINCT items before expansion.
    Distinct items, not raw rows, drive both the cap and the pair set,
    so duplicated (group, item) rows never evict a small group.
    None = exact graph (oracle-checkable)."""
    # distinct the src<dst half then mirror: the dedup shuffle carries
    # half the pairs and the union is shuffle-free
    half = _group_pair_rows(df, group_col, item_col, max_group_size) \
        .distinct()
    return half.union(half.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))


def basket_edges(df: DataFrame, group_col: str, item_col: str,
                 min_support: int = 2,
                 support_frac: float | None = None) -> DataFrame:
    """Support-pruned co-occurrence pairs (src, dst, support): item pairs
    sharing at least threshold groups, where threshold =
    max(min_support, ceil(support_frac * n_groups)).

    The fraction is the scale knob (VERDICT r4 #3, NOTES §19): a FIXED
    absolute support stops pruning as co-occurrence densifies — with a
    bounded item catalog, every pair's count grows with the basket
    count, so at 1000x the corpus all noise clears any constant bar and
    the pair table (and every triangle/lift consumer) explodes. Tying
    the bar to n_groups keeps prune selectivity stable: a pair must
    appear in a fixed FRACTION of baskets, which noise does not do at
    any scale. n_groups rides in as a 1-row broadcast cross-join (no
    eager count at plan-build); pairs are generated in-group
    (_group_pair_rows), so blowup is items-per-group², never corpus².

    support_frac=None keeps the absolute threshold (exact,
    oracle-checkable at fixed scale; the basket_part_lift /
    basket_part_triangles entries)."""
    pairs = (_group_pair_rows(df, group_col, item_col)
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("support")))
    if support_frac is None:
        return pairs.filter(F.col("support") >= min_support)
    ng = df.agg(F.countDistinct(F.col(group_col)).alias("_ng"))
    thr = F.greatest(F.lit(min_support).cast("long"),
                     F.ceil(F.lit(float(support_frac)) * F.col("_ng")))
    return (pairs.crossJoin(F.broadcast(ng))
                 .filter(F.col("support") >= thr)
                 .drop("_ng"))


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """(node, n_tri) per triangle-participating node over an undirected
    graph (input edge list may carry either or both directions; it is
    canonicalized first) — the local-clustering member of the graph
    family (pagerank = authority, connected components = identity,
    triangles = community density).

    Scale plan (the classic degree-orientation): every undirected edge
    is oriented from the smaller (degree, node) endpoint to the larger,
    making the orientation a TOTAL order — each triangle then appears as
    exactly one wedge (a→b, a→c with b before c) whose closing edge
    (b→c) carries the same orientation, so one self-join on the wedge
    apex plus one equi-join on the closing pair counts every triangle
    once. Post-orientation out-degree is bounded by O(sqrt(m)) on any
    graph, so wedge count is O(m^1.5) worst case instead of Σdeg² —
    the difference between celebrity nodes exploding the join and not.
    All joins are id-keyed shuffles; no windows, no collects. The
    id-ordered formulation (a<b<c) counts identically — that is what
    the SQL oracle uses."""
    # pin the canonical edge frame: it feeds deg (twice via the union),
    # the degree joins, and through `o` the wedge/closing consumers —
    # without the pin Catalyst re-plans the WHOLE upstream (including an
    # expensive support-pruning aggregate when basket_edges feeds this)
    # once per consumer: measured 274 exchanges / 8x duplicated pair aggs
    # on basket_part_triangles_frac vs ~15 pinned (the pagerank edge-pin
    # lesson)
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                        F.greatest(F.col(src), F.col(dst)).alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct()
                 .localCheckpoint(eager=False))
    deg = (und.select(F.col("u").alias("n"))
              .unionAll(und.select(F.col("v").alias("n")))
              .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    d_u = deg.select(F.col("n").alias("u"), F.col("d").alias("_du"))
    d_v = deg.select(F.col("n").alias("v"), F.col("d").alias("_dv"))
    keyed = und.join(d_u, "u").join(d_v, "v")
    fwd = (F.col("_du") < F.col("_dv")) | \
          ((F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v")))
    # o feeds three consumers (wedge sides + closing edges): pin it too
    o = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("_dv")).otherwise(F.col("_du")).alias("_db")) \
        .localCheckpoint(eager=False)
    # wedge (a->b, a->c) once per unordered pair: b strictly before c in
    # the SAME (degree, node) total order the orientation uses
    w1 = o.select(F.col("a"), F.col("b"), F.col("_db"))
    w2 = o.select(F.col("a"), F.col("b").alias("c"),
                  F.col("_db").alias("_dc"))
    wedges = (w1.join(w2, "a")
                .filter((F.col("_db") < F.col("_dc"))
                        | ((F.col("_db") == F.col("_dc"))
                           & (F.col("b") < F.col("c"))))
                .select("a", "b", "c"))
    closing = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    nodes = (tri.select(F.col("a").alias("node"))
                .unionAll(tri.select(F.col("b").alias("node")))
                .unionAll(tri.select(F.col("c").alias("node"))))
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def label_propagation(edges: DataFrame, iters: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, label) after `iters` SYNCHRONOUS label-propagation rounds
    (Raghavan et al. 2007, public algorithm) over an undirected edge
    list — community detection, the soft sibling of connected
    components: CC says "reachable at all", LPA's majority vote says
    "densely reachable", splitting bridged clumps CC merges.

    Determinism (classic LPA is run-order dependent; this one is not):
    labels start as node ids; every round each node votes over its
    neighbors' labels PLUS its own current label (the self-vote damping
    that keeps synchronous updates from oscillating on bridged cliques
    — pinned by the two-clique unit test) and adopts the label with the
    HIGHEST count, ties broken by SMALLEST label — a pure arg-max over
    (count desc, label asc), bit-exact in any engine, so the SQL oracle
    unrolls the same rounds verbatim. The tiebreak negates the COUNT
    (always BIGINT), never the label, so non-numeric node-id/label
    types order correctly instead of silently casting to NULL.
    Isolated nodes are absent from an edge list by construction.

    Plan at 100 TB: per round, one join of the edge list against the
    |nodes|-row label table (labels are the SMALL side once the graph
    outgrows memory — shuffle keys on the node id) + one (node, label)
    hash-aggregate + one arg-max aggregate.

    r09: NO per-round localCheckpoint of the label frame. Unlike
    pagerank's rank frame (2 consumers per round, tree doubling), labels
    feed exactly ONE consumer per round — lineage is LINEAR in iters, so
    the pin bought nothing and cost plenty: under AQE each pin executes
    its round's stages at plan-construction time as sequential driver
    jobs. Warm interleaved 3-rep A/B at sf0.1/32c (plan+exec seconds):
    per-round pins 2.46/2.30/2.23, unpinned 2.18/2.17/2.17 — identical
    outputs (full sorted compare). Pre-partitioning sym by `d` (the
    pagerank edges fix) was ALSO probed and measured WORSE here
    (2.44/2.74/2.52): sym is consumed by round joins AND the label-seed
    distinct, and the extra up-front exchange outweighs the per-round
    saving on a 3-round loop — so sym keeps its natural partitioning."""
    both = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
            .union(edges.select(F.col(dst).alias("s"),
                                F.col(src).alias("d"))))
    # self-loops carry the self-vote through the same join
    sym = (both.union(both.select("s", F.col("s").alias("d")))
           .distinct()
           .localCheckpoint(eager=False))
    labels = (sym.select(F.col("s").alias("node")).distinct()
              .select("node", F.col("node").alias("lbl")))
    for _ in range(iters):
        nbr = (sym.join(labels.withColumnRenamed("node", "d"), "d")
               .select(F.col("s").alias("node"), "lbl"))
        cnt = nbr.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        # arg-max by (count desc, label asc) as a single struct MIN:
        # negate the COUNT (always BIGINT — safe), never the label, so
        # string/any orderable node-id types tie-break correctly
        # instead of casting to NULL.
        labels = (cnt.groupBy("node")
                  .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                      F.col("lbl")))
                       .alias("m"))
                  .select("node", F.col("m.lbl").alias("lbl")))
    return labels.select("node", F.col("lbl").alias("label"))
