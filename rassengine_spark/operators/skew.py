"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB a handful of hot keys (boilerplate text buckets, a whale tenant's
``user_id``, an ubiquitous ``event_type``) can pin a whole aggregation on one
reducer. Salting splits each key into ``num_salts`` sub-keys for the first
(partial) aggregation so the hot key's rows spread across reducers, then a
second, tiny aggregation over per-(key, salt) partials produces the exact
result. Exact for any algebraic aggregate (count/sum/min/max) — the partials
compose losslessly.

Note Spark already gives two layers of protection — map-side partial
aggregation and AQE skew handling — so salting is the explicit third lever
when a single reduce key still overwhelms one task (e.g. the partial agg is
defeated by high per-partition key cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               num_salts: int = 16, salt_source: str | Column | None = None
               ) -> DataFrame:
    """Exact grouped aggregation with salted first phase.

    ``aggs`` maps output column -> "fn(col)" with fn in
    {count, sum, min, max}. ``salt_source``: any column whose hash spreads a
    key's rows (defaults to a deterministic per-row hash of all columns —
    avoid rand(): non-deterministic under task retry, which can double-count
    rows on speculative re-execution).
    """
    if salt_source is None:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(num_salts))
    else:
        src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(src), F.lit(num_salts))

    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(", 1)
        fn = fn.strip().lower()
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {spec}")

    partial = (df.withColumn("__salt", salt)
                 .groupBy(*key_cols, "__salt")
                 .agg(*partial_exprs))
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(big: DataFrame, dim: DataFrame, key_cols: list[str],
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Exact equi-join with the big side's hot keys spread over
    ``num_salts`` reducers: the big side gains a deterministic per-row
    salt, the dim side REPLICATES once per salt value (a sequence
    explode — dim rows x num_salts, fine when the dim is merely
    too-big-to-broadcast), and the join keys on (key..., salt). One hot
    key's rows land on num_salts tasks instead of one.

    This is the explicit third lever when AQE's skew-join split cannot
    help — AQE splits oversized SHUFFLE PARTITIONS, but a single key's
    rows still sort-merge through one task per key on the build of some
    join plans, and AQE never engages under bucketed/pre-shuffled
    inputs. Exactness: every big row meets every matching dim row
    exactly once (the dim copy carrying that row's salt). Salt is
    xxhash64 of the big row's columns — NOT rand(), which double-counts
    under speculative re-execution (the salted_agg rule).

    ``how``: inner or left (the big side preserved); right/outer would
    need dim-side dedup of the replicas — out of contract."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side "
                         "preserved); use the plain join otherwise")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(num_salts))
    b = big.withColumn("__salt", salt)
    d = (dim.withColumn("__salt",
                        F.explode(F.sequence(F.lit(0),
                                             F.lit(num_salts - 1))))
            .withColumn("__salt", F.col("__salt").cast(
                b.schema["__salt"].dataType.simpleString())))
    out = b.join(d, [*key_cols, "__salt"], how)
    return out.drop("__salt")
