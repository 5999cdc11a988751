"""Sketch aggregates with driver-checkable guarantees.

`sketch_daily_rollup` exposes raw sketch outputs (rows-only: the values
are algorithm-specific), and tests/test_sketches.py pins error bounds in
pytest. This module closes the remaining evidence gap: it wraps a sketch
in its own published guarantee, evaluated with INTEGER arithmetic, so the
result is a deterministic boolean row an SQL oracle can assert — sketch
correctness becomes driver-stampable even though sketch values aren't
SQL-reproducible. The booleans are also robust to sketch
nondeterminism: any merge order that honors the rank-error contract
yields the same TRUEs, so partitioning changes can't flake the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_sketch_bounds(df: DataFrame, value_col: str, key_col: str,
                           qs: tuple[int, ...] = (50, 95, 99),
                           accuracy: int = 100) -> DataFrame:
    """Per-key approximate percentiles (percentile_approx — the
    Greenwald-Khanna-family quantile sketch, fixed memory one-pass)
    checked against the sketch's own rank-error guarantee: the returned
    value is an element of the group whose rank interval
    [count(< v) + 1, count(<= v)] must intersect
    [ceil(q·n) − tol, ceil(q·n) + tol], tol = n div accuracy + 1
    (the published ε = 1/accuracy rank error, +1 slack for the rank
    convention at ties). Everything is bigint arithmetic — count
    comparisons, ceil via (n·q + 99) div 100 — so `ok_p*` booleans are
    engine-exact and an oracle asserts them as literal TRUE alongside
    the exact group count.

    Plan shape at 100 TB: one sketch aggregate (fixed memory per key),
    the |keys|-row result broadcast back for one conditional-count
    aggregate — two shuffles on the group key, no sort, no per-group
    collection. The rank-verification join is the check's cost, not the
    sketch's; production rollups run the sketch aggregate alone."""
    fracs = [q / 100 for q in qs]
    apx = df.groupBy(key_col).agg(
        F.count(value_col).alias("n"),
        F.percentile_approx(value_col, fracs, accuracy).alias("_ap"))
    # null-SAFE join key: a NULL group exists in both the aggregate and
    # a GROUP BY oracle, but a plain equi-join would silently drop it
    apx = apx.withColumnRenamed(key_col, "_k")
    j = df.join(F.broadcast(apx),
                F.col(key_col).eqNullSafe(F.col("_k"))).drop("_k")
    aggs = []
    v = F.col(value_col)
    for i, q in enumerate(qs):
        a = F.element_at(F.col("_ap"), i + 1)
        aggs += [F.sum(F.when(v < a, 1).otherwise(0)).alias(f"_lo{q}"),
                 F.sum(F.when(v <= a, 1).otherwise(0)).alias(f"_hi{q}")]
    g = j.groupBy(key_col, "n").agg(*aggs)
    n = F.col("n")
    # integer/100 division is exactly rounded and >1/100 away from any
    # non-multiple integer, so floor over the double quotient is exact
    tol = F.floor(n / accuracy).cast("long") + 1
    out = [F.col(key_col), n]
    for q in qs:
        t = F.floor((n * q + 99) / 100).cast("long")     # ceil(q·n)
        ok = ((F.col(f"_lo{q}") + 1 <= t + tol)
              & (F.col(f"_hi{q}") >= t - tol))
        out.append(ok.alias(f"ok_p{q}"))
    return g.select(*out)


def distinct_sketch_bounds(df: DataFrame, value_col: str, key_col: str,
                           rsd: float = 0.05,
                           sigmas: float = 4.0) -> DataFrame:
    """Per-key HLL++ distinct count (approx_count_distinct) checked
    against the exact distinct count in the same pass: emits the exact
    count (hash-comparable) and an `err_ok` boolean asserting
    |approx − exact| <= sigmas·rsd·exact + 1 (HLL++'s relative standard
    deviation with wide-sigma slack, +1 for tiny groups). The relative
    error bound is probabilistic, but the corpus is fixed, so the
    realized boolean is deterministic — at 4 sigma the floor holds with
    margin on any data the sketch isn't pathologically wrong about.
    One hash-aggregate computes sketch AND exact twin together; the
    exact side is the verification cost, production rollups run the
    sketch alone (fixed memory per key vs a distinct-set per key)."""
    g = df.groupBy(key_col).agg(
        F.approx_count_distinct(value_col, rsd).alias("_a"),
        F.countDistinct(value_col).alias("n_distinct"))
    # integer comparison: |a - n| * 100 <= sigmas*rsd*100 * n + 100
    tol_pct = int(round(sigmas * rsd * 100))
    ok = (F.abs(F.col("_a") - F.col("n_distinct")) * 100
          <= F.col("n_distinct") * tol_pct + 100)
    return g.select(key_col, "n_distinct", ok.alias("err_ok"))


def count_min_estimates(df: DataFrame, item_col: str, key_col: str,
                        width: int = 256, depth: int = 2,
                        top: int = 5) -> DataFrame:
    """Count-Min sketch per key, evaluated ENGINE-EXACTLY — the fourth
    stamped sketch family (quantile rank error, HLL relative error, MG
    undercount, and here CM's overcount mirror: est >= true always,
    est - true bounded by bucket collisions). With deterministic md5 row
    hashes the whole sketch state is plain relational algebra: counters
    are hash-aggregates on bucket_j = md5(j # item) % width and
    est(x) = min_j counter_j[bucket_j(x)] — so unlike the other three
    families the estimates THEMSELVES reproduce in SQL and value-hash
    compare; no bound boolean is needed.

    Output: per key, the exact top-`top` items (count desc, item asc)
    with (n_exact, est). Plan at 100 TB: the d x width counter table is
    ONE hash-aggregate over a depth-exploded scan (fixed d·width longs
    per key however many distinct items stream by — the case exact
    aggregation can't bound); the exact side and the top-k probe join
    are the verification cost, production runs the counter aggregate
    alone."""
    from pyspark.sql.window import Window

    base = (df.select(F.col(key_col).alias("_k"),
                      F.col(item_col).cast("string").alias("_it"))
              .filter(F.col("_it").isNotNull()))

    def bucket(j_col, item_col_):
        return (F.conv(F.substring(
            F.md5(F.concat(j_col.cast("string"), F.lit("#"), item_col_)),
            1, 15), 16, 10).cast("bigint") % width).cast("int")

    expl = base.select(
        "_k", "_it",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"))
    counters = (expl.groupBy("_k", "_j",
                             bucket(F.col("_j"), F.col("_it")).alias("_b"))
                    .agg(F.count(F.lit(1)).alias("_c")))
    exact = base.groupBy("_k", "_it").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("_k").orderBy(F.desc("n_exact"), F.asc("_it"))
    topk = (exact.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= top).drop("_rn"))
    probes = topk.select(
        "_k", "_it", "n_exact",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"))
    probes = probes.withColumn("_b", bucket(F.col("_j"), F.col("_it")))
    est = (probes.join(counters, ["_k", "_j", "_b"])
                 .groupBy("_k", "_it", "n_exact")
                 .agg(F.min("_c").alias("est")))
    return (est.select(F.col("_k").alias(key_col),
                       F.col("_it").alias("item"), "n_exact", "est")
               .orderBy(key_col, F.desc("n_exact"), F.asc("item")))


def heavy_hitters_mg(df: DataFrame, item_col: str, k: int = 64,
                     top: int = 10) -> DataFrame:
    """Misra-Gries heavy hitters with the DETERMINISTIC error bound —
    the third stamped sketch family (quantile rank error, HLL relative
    error, and here frequency undercount). Per partition, an MG summary
    of k counters (fixed memory however many distinct items stream by —
    the case exact hash aggregation can't bound, e.g. n-grams at 100 TB);
    summaries merge by summing estimates, and the classic analysis gives
    true − Σest <= N/(k+1) with Σest <= true, INDEPENDENT of the
    partitioning. The output keeps only partitioning-independent values:
    the exact top-`top` items (count desc, item asc — deterministic
    rows that hash-compare) and `mg_ok`, the integer-arithmetic bound
    check (true − est)·(k+1) <= N.

    Plan: one Arrow pass for the summaries (zero shuffle), a |items
    surviving MG| <= k·partitions aggregate, the exact top-k via
    TakeOrdered, and a broadcast join — the exact side is the
    verification cost; production runs the MG pass alone."""
    from typing import Iterator

    import pandas as pd

    from ..util import spread

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for it in pdf["item"]:
                if it is None:
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters),
                            "est": pd.Series(list(counters.values()),
                                             dtype="object")})

    item_type = df.schema[item_col].dataType.simpleString()
    # spread(): a single-file input otherwise streams every item through
    # ONE Python worker; extra partitions only add MG summaries, and the
    # bound is partitioning-independent by design
    items = spread(df.select(F.col(item_col).alias("item")))
    mg = (items.mapInPandas(run, schema=f"item {item_type}, est long")
               .groupBy("item").agg(F.sum("est").alias("est")))
    exact = (items.filter(F.col("item").isNotNull())
                  .groupBy("item")
                  .agg(F.count(F.lit(1)).alias("n_exact")))
    n_total = exact.agg(F.sum("n_exact").alias("_N"))
    topk = (exact.orderBy(F.desc("n_exact"), F.asc("item")).limit(top)
                 .join(mg, "item", "left")
                 .crossJoin(F.broadcast(n_total)))
    est = F.coalesce(F.col("est"), F.lit(0))
    ok = ((est <= F.col("n_exact"))
          & ((F.col("n_exact") - est) * (k + 1) <= F.col("_N")))
    # re-sort after the join: the limit's order does not survive it, and
    # the docstring promises deterministic (count desc, item asc) rows
    return (topk.select("item", "n_exact", ok.alias("mg_ok"))
                .orderBy(F.desc("n_exact"), F.asc("item")))
