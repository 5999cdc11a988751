"""Domain mixture reweighting for pretraining data — one exponentiated-
gradient step of the DoReMi scheme (Xie et al. 2023, public paper):
domains whose mean loss exceeds the overall (reference) mean get their
sampling weight multiplied by exp(eta * excess), then the distribution
is renormalized and smoothed with uniform mass. Iterating (re-sample
with the new weights, re-score, re-step) reproduces the Group-DRO inner
loop; a single step is already the standard "upweight the domains the
model finds hard" heuristic.

Determinism contract (the repo's integer-micro convention):

- per-example losses enter as round(loss * 1e6) BIGINT terms, so every
  per-domain and overall sum is an order-free exact integer — no
  float-summation order sensitivity anywhere.
- the only floating-point steps are one division per mean, one exp per
  domain (itself re-quantized to micro units before the cross-domain
  normalization sum, which is again an exact integer sum), and the
  final smoothed weight expression — each a fixed small expression tree
  mirrored verbatim in the DuckDB oracle.

Shapes at 100 TB: one hash-aggregate over the scored corpus (map-side
combined) down to |domains| rows, then purely domain-level arithmetic —
the domain table is driver-scale metadata. No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
# exp clamp: exp(20)*1e6 ~ 4.85e14, so even 10^4 domains sum far below
# 2^63 — without it a large eta*excess saturates the long cast at
# Long.MaxValue and the normalization sum silently wraps negative
# (review finding). Domains at the clamp share the max unnormalized
# weight, which is the intended "this domain is maximally hard" signal.
MAX_EXPONENT = 20.0


def domain_reweight(scored: DataFrame, domain_col: str, loss_col: str,
                    eta: float = 1.0, smoothing: float = 0.2,
                    round_to: int = 6) -> DataFrame:
    """(domain, n_docs, mean_loss, excess, weight) — one EG step.

        excess_d = max(mean_loss_d - mean_loss_overall, 0)
        w_d ∝ exp(eta * excess_d)
        weight_d = (1 - smoothing) * w_d / Σ w + smoothing / K

    Rows with null loss are dropped (un-scorable docs don't vote).
    Weights sum to 1 up to the final rounding."""
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    if eta <= 0.0:
        raise ValueError(f"eta must be positive, got {eta}")
    loss_micro = F.round(F.col(loss_col).cast("double") * MICRO, 0) \
                  .cast("long")
    per_d = (scored.filter(F.col(loss_col).isNotNull())
             .groupBy(F.col(domain_col).alias("domain"))
             .agg(F.sum(loss_micro).alias("_sm"),
                  F.count(F.lit(1)).alias("n_docs")))
    overall = per_d.agg(
        F.sum("_sm").alias("_sm_all"), F.sum("n_docs").alias("_n_all"),
        F.count(F.lit(1)).alias("_k"))
    j = per_d.crossJoin(F.broadcast(overall))
    # micro-unit integer means back to loss units: two divisions, fixed
    # order, mirrored in the oracle
    mean_d = (F.col("_sm").cast("double")
              / F.col("n_docs").cast("double")) / float(MICRO)
    mean_all = (F.col("_sm_all").cast("double")
                / F.col("_n_all").cast("double")) / float(MICRO)
    excess = F.greatest(mean_d - mean_all, F.lit(0.0))
    expo = F.least(eta * excess, F.lit(MAX_EXPONENT))
    wu_micro = F.round(F.exp(expo) * MICRO, 0).cast("long")
    stepped = j.select("domain", "n_docs", "_k",
                       mean_d.alias("_mean"), excess.alias("_ex"),
                       wu_micro.alias("_wu"))
    tot = stepped.agg(F.sum("_wu").alias("_wu_tot"))
    out = stepped.crossJoin(F.broadcast(tot))
    frac = F.col("_wu").cast("double") / F.col("_wu_tot").cast("double")
    weight = ((1.0 - smoothing) * frac
              + smoothing / F.col("_k").cast("double"))
    return out.select(
        "domain", "n_docs",
        F.round(F.col("_mean"), round_to).alias("mean_loss"),
        F.round(F.col("_ex"), round_to).alias("excess"),
        F.round(weight, round_to).alias("weight"))
