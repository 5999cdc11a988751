"""Integer-micro PageRank (operators/graph.py) vs a single-threaded
reference with identical integer arithmetic."""

from rassengine_spark.operators.graph import cooccurrence_edges, pagerank_micro


def _reference(edges, iters=3, damping_pct=85):
    from collections import defaultdict
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    r = {n: 1000000 for n in deg}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {n: 150000 + damping_pct * s.get(n, 0) // 100 for n in r}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank_micro
            for r in pagerank_micro(df, **kw).collect()}


def test_pagerank_matches_reference(spark):
    # a small asymmetric-degree graph (made symmetric edge-wise)
    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (1, 5), (5, 6)]
    edges = und + [(b, a) for a, b in und]
    assert _run(spark, edges) == _reference(edges)


def test_pagerank_star_center_dominates(spark):
    und = [(0, i) for i in range(1, 9)]
    edges = und + [(b, a) for a, b in und]
    got = _run(spark, edges)
    assert got == _reference(edges)
    assert got[0] > max(got[i] for i in range(1, 9))


def test_pagerank_mass_conservation_bound(spark):
    # truncating integer division only LOSES mass: total rank can never
    # exceed n * 1e6 (teleport + damping preserve the invariant)
    und = [(i, (i * 3 + 1) % 11) for i in range(11) if i != (i * 3 + 1) % 11]
    edges = list({(a, b) for a, b in und} | {(b, a) for a, b in und})
    got = _run(spark, edges, iters=5)
    assert sum(got.values()) <= len(got) * 1000000


def test_cooccurrence_edges_symmetric(spark):
    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 10), (3, 13)]
    df = spark.createDataFrame(rows, "g long, item long")
    got = {(r.src, r.dst)
           for r in cooccurrence_edges(df, "g", "item").collect()}
    assert got == {(10, 11), (11, 10), (10, 12), (12, 10), (11, 12),
                   (12, 11)}   # order-2 dup collapses; singleton drops
    # every edge present both ways -> every node has out-degree
    assert {a for a, _ in got} == {b for _, b in got}


def test_cooccurrence_edges_null_group_rows_never_pair(spark):
    """NULL group keys must behave like the join formulation (and the
    DuckDB oracles): dropped, not aggregated into one mega-group
    (ADVICE r08 — _group_pair_rows filters them before the groupBy)."""
    rows = [(1, 10), (1, 11), (None, 20), (None, 21), (None, 22)]
    df = spark.createDataFrame(rows, "g long, item long")
    got = {(r.src, r.dst)
           for r in cooccurrence_edges(df, "g", "item").collect()}
    assert got == {(10, 11), (11, 10)}


def test_triangle_counts_reference(spark):
    """Degree-oriented count == brute-force enumeration on a known graph:
    K4 on {1,2,3,4} (4 triangles, 3 per node) + a pendant edge + an
    isolated edge (no triangles)."""
    from rassengine_spark.operators.graph import triangle_counts
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (10, 11)]
    # feed BOTH directions plus duplicates: canonicalization is part of
    # the contract
    edges = und + [(b, a) for a, b in und] + und[:3]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_random_vs_bruteforce(spark):
    import itertools
    import random
    from rassengine_spark.operators.graph import triangle_counts
    rng = random.Random(5)
    nodes = list(range(18))
    und = sorted({tuple(sorted(rng.sample(nodes, 2)))
                  for _ in range(40)})
    df = spark.createDataFrame(und, "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    es = set(und)
    want: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_basket_edges_support_fraction(spark):
    """threshold = max(min_support, ceil(frac * n_groups)): with 10
    groups and frac=0.25 the bar is ceil(2.5)=3, so the support-2 pair
    drops and the support-3 pair survives; with frac=None the absolute
    floor of 2 keeps both. Duplicated (group,item) rows don't inflate
    support (pre-distinct)."""
    from rassengine_spark.operators.graph import basket_edges
    rows = []
    for g in range(1, 4):                     # (1,2) support 3
        rows += [(g, 1), (g, 2)]
    rows += [(4, 3), (4, 4), (5, 3), (5, 4), (5, 4)]   # (3,4) support 2
    rows += [(6, 9), (7, 9), (8, 9), (9, 9), (10, 9)]  # pad to 10 groups
    df = spark.createDataFrame(rows, "g long, item long")
    frac = {(r.src, r.dst): r.support
            for r in basket_edges(df, "g", "item", min_support=2,
                                  support_frac=0.25).collect()}
    assert frac == {(1, 2): 3}
    absolute = {(r.src, r.dst): r.support
                for r in basket_edges(df, "g", "item",
                                      min_support=2).collect()}
    assert absolute == {(1, 2): 3, (3, 4): 2}


def test_cooccurrence_edges_group_size_cap(spark):
    """max_group_size drops oversized groups BEFORE the self-join (the
    g² skew cap): the size-3 group's pairs vanish, the size-2 group
    survives, and None keeps the exact graph."""
    rows = [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21),
            # duplicated (group, item) rows must NOT evict group 2: the
            # cap counts DISTINCT items (pair blowup is item-driven)
            (2, 20), (2, 21), (2, 20)]
    df = spark.createDataFrame(rows, "g long, item long")
    capped = {(r.src, r.dst)
              for r in cooccurrence_edges(df, "g", "item",
                                          max_group_size=2).collect()}
    assert capped == {(20, 21), (21, 20)}
    full = {(r.src, r.dst)
            for r in cooccurrence_edges(df, "g", "item").collect()}
    assert {(10, 11), (11, 12), (20, 21)} <= full


def test_lpa_two_cliques_with_bridge(spark):
    """Two 3-cliques joined by one bridge edge: CC merges them, LPA
    keeps two communities (each labeled by its smallest member)."""
    from rassengine_spark.operators.graph import label_propagation
    cl1 = [(1, 2), (1, 3), (2, 3)]
    cl2 = [(10, 11), (10, 12), (11, 12)]
    edges = spark.createDataFrame(cl1 + cl2 + [(3, 10)],
                                  "src long, dst long")
    got = {r.node: r.label for r in
           label_propagation(edges, iters=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10


def test_lpa_deterministic_tiebreak(spark):
    """A node with two equally-voted neighbor labels adopts the
    smallest one, every run."""
    from rassengine_spark.operators.graph import label_propagation
    edges = spark.createDataFrame([(5, 1), (5, 2)], "src long, dst long")
    for _ in range(3):
        got = {r.node: r.label for r in
               label_propagation(edges, iters=1).collect()}
        # node 5 votes {5, 1, 2} once each -> smallest wins
        assert got[5] == 1
        # 1 votes {1, 5} -> 1; 2 votes {2, 5} -> 2
        assert got[1] == 1 and got[2] == 2


def test_lpa_string_node_ids(spark):
    """Non-numeric node ids: the tiebreak negates the COUNT, never the
    label, so string ids order lexicographically instead of casting to
    NULL and corrupting the arg-max (ADVICE r06)."""
    from rassengine_spark.operators.graph import label_propagation
    cl1 = [("a", "b"), ("a", "c"), ("b", "c")]
    cl2 = [("x", "y"), ("x", "z"), ("y", "z")]
    edges = spark.createDataFrame(cl1 + cl2 + [("c", "x")],
                                  "src string, dst string")
    got = {r.node: r.label for r in
           label_propagation(edges, iters=3).collect()}
    assert None not in got.values()
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"
    # equal-vote tie adopts the SMALLEST label lexicographically
    tie = spark.createDataFrame([("m", "a"), ("m", "b")],
                                "src string, dst string")
    got2 = {r.node: r.label for r in
            label_propagation(tie, iters=1).collect()}
    assert got2["m"] == "a"


def test_lpa_labels_are_member_ids(spark):
    from rassengine_spark.operators.graph import label_propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src long, dst long")
    rows = label_propagation(edges, iters=2).collect()
    nodes = {r.node for r in rows}
    assert {r.label for r in rows} <= nodes     # labels are node ids
    assert nodes == set(range(1, 7))
