"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join.

Neither exists in the reference (its "temporal" queries are date-range
filters, app/main.py:1866-1918); both are table stakes for event-stream
analytics over the same data, so they are implemented here as compositions
of existing DataFrame ops — no UDFs, no pair blowup:

- as-of join: the naive plan (equi-join on key + ts inequality + argmax)
  materializes |probe| x |build-per-key| rows before pruning. This plan
  UNIONs the two sides, sorts once per key partition, and carries the most
  recent build row forward with a running `last(ignoreNulls)` window —
  one shuffle on the key, linear in |probe| + |build| at any scale.
- interval join: the naive plan is a broadcast-nested-loop on the range
  predicate (quadratic). This plan buckets time into fixed-width buckets,
  explodes each interval into the buckets it overlaps (bounded fan-out:
  interval_width / bucket + 1), and equi-joins on (key, bucket) with the
  exact range predicate as a residual filter. Shuffle keys are
  (key, bucket), so skew is bounded by bucket width, and AQE handles the
  rest. Each probe row lives in exactly one bucket, so no dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from rassengine_spark.util import micros


def asof_join(probe: DataFrame, build: DataFrame, on: list[str],
              probe_ts: str, build_ts: str,
              build_cols: dict[str, str],
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """For each probe row, attach the nearest build row with equal `on`
    keys at-or-before (`direction='backward'`, DuckDB `ASOF JOIN`
    semantics) or at-or-after (`direction='forward'`) its timestamp —
    optionally within `tolerance_seconds`. Probe rows with no match are
    dropped (inner as-of).

    build_cols maps build column -> output alias. Probe columns all pass
    through. At equal timestamps the build row is visible to the probe row
    (inclusive match). Same plan both directions: one shuffle on the key,
    one sorted window pass, linear in |probe| + |build| (the forward pass
    just flips the sort and carries the next build row backward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    probe_cols = probe.columns
    p = probe.withColumn("_t", F.col(probe_ts)) \
             .withColumn("_side", F.lit(1)) \
             .withColumn("_b", F.lit(None).cast(
                 "struct<" + ",".join(
                     f"{a}:{build.schema[c].dataType.simpleString()}"
                     for c, a in build_cols.items()) + ">"))
    b = build.select(
        *on,
        F.col(build_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(a)
                   for c, a in build_cols.items()]).alias("_b"))
    for c in probe_cols:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    u = p.unionByName(b.select(p.columns))
    # backward: ascending time, build-before-probe on ties, carry last
    # build struct forward. forward: descending time (same tie rule), so
    # "last" is the nearest at-or-after build row.
    order = (F.col("_t").asc() if direction == "backward"
             else F.col("_t").desc())
    w = (Window.partitionBy(*on).orderBy(order, F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("_m", F.last("_b", ignorenulls=True).over(w)) \
               .withColumn("_mt", F.last(F.when(F.col("_side") == 0,
                                                F.col("_t")),
                                         ignorenulls=True).over(w))
    out = matched.filter((F.col("_side") == 1) & F.col("_m").isNotNull())
    if tolerance_seconds is not None:
        gap = (micros(F.col("_t")) - micros(F.col("_mt"))
               if direction == "backward"
               else micros(F.col("_mt")) - micros(F.col("_t")))
        out = out.filter(gap <= int(tolerance_seconds) * 1_000_000)
    return out.select(*probe_cols,
                      *[F.col(f"_m.{a}").alias(a)
                        for a in build_cols.values()])


def interval_join(probe: DataFrame, intervals: DataFrame, on: list[str],
                  probe_ts: str, start_col: str, end_col: str,
                  bucket_seconds: int) -> DataFrame:
    """Pairs (probe row, interval row) where keys match and
    start <= probe_ts < end (half-open). `bucket_seconds` should be on the
    order of the typical interval width: fan-out per interval is
    ceil(width / bucket) + 1 exploded rows.
    """
    bus = F.lit(int(bucket_seconds) * 1_000_000)
    # explicit aliases: probe and intervals usually derive from the SAME
    # source table (two filters of one event stream), so pr[k] and iv[k]
    # share an expression id — Spark resolves the self-join anyway but
    # WARNs "trivially true equals predicate" on every run, which buries
    # real accidental-cross-join warnings in bench logs
    iv = intervals.withColumn(
        "_bk",
        F.explode(F.sequence(
            F.floor(micros(F.col(start_col)) / bus),
            # end is exclusive: the last covered microsecond is end - 1
            F.floor((micros(F.col(end_col)) - 1) / bus)))).alias("_iv")
    pr = probe.withColumn(
        "_bk", F.floor(micros(F.col(probe_ts)) / bus)).alias("_pr")
    def _pr(c: str):
        return F.col(f"_pr.`{c}`")

    def _iv(c: str):
        return F.col(f"_iv.`{c}`")

    cond = ([_pr(k) == _iv(k) for k in on] + [_pr("_bk") == _iv("_bk")])
    joined = pr.join(iv, cond).where(
        (_pr(probe_ts) >= _iv(start_col)) & (_pr(probe_ts) < _iv(end_col)))
    out_cols = ([_pr(c) for c in probe.columns]
                + [_iv(c) for c in intervals.columns if c not in on])
    return joined.select(*out_cols)
