"""Deterministic corpus splitting / sampling for training-data pipelines.

Every assignment is a pure per-row expression of a stable key — no
randomness, no shuffle, reproducible bit-for-bit in any engine (md5-based,
like the dedup hashes). At 100 TB these fuse into the scan as one codegen
projection; a seeded `rand()` would be neither cross-engine reproducible nor
stable under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import hash60

# hash60 range: 15 hex chars = 60 bits
_HASH_SPACE = 1 << 60


def split_assign(key: Column, weights: dict[str, float],
                 seed: str = "split") -> Column:
    """Stable split label ('train'/'val'/'test'/...) from a key column.

    The salted 60-bit hash of the key is mapped onto [0,1); cumulative
    weight bins assign the label, so expected fractions match `weights`
    (normalized). Same key -> same split, forever, on any engine."""
    total = sum(weights.values())
    u = hash60(F.concat(F.lit(seed + "/"), key.cast("string")))
    frac = u.cast("double") / F.lit(float(_HASH_SPACE))
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt / total
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = items[-1][0]
    return expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)


def with_split(df: DataFrame, key_col: str,
               weights: dict[str, float] | None = None,
               seed: str = "split") -> DataFrame:
    """Attach a `split` column. Default 98/1/1 train/val/test."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn("split", split_assign(F.col(key_col), weights, seed))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                seed: str = "sample") -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose salted key-hash lands
    below the threshold. Unlike df.sample(), membership is a property of the
    key — stable across runs, partitionings, and engines, and sampling the
    same key space twice with the same seed yields nested samples for
    fraction' < fraction."""
    u = hash60(F.concat(F.lit(seed + "/"), F.col(key_col).cast("string")))
    return df.filter(u.cast("double") / F.lit(float(_HASH_SPACE))
                     < F.lit(float(fraction)))


def stratified_take(df: DataFrame, strata_col: str, key_col: str,
                    n_per_stratum: int) -> DataFrame:
    """Deterministic N rows per stratum: rank by salted key-hash inside each
    stratum (a pseudo-random but reproducible order) and keep the first N.
    One shuffle on the stratum key; WindowGroupLimit prunes per-partition
    before the shuffle at scale."""
    u = hash60(F.concat(F.lit("strata/"), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= n_per_stratum).drop("_rn"))
