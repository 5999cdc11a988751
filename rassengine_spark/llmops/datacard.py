"""Corpus data-card: the per-slice profile table published alongside a
training dataset (counts, token volume, length stats, exact-dup rate per
language × source slice plus every rollup margin).

Shape at 100 TB: ONE pass computes the per-row features (token count via a
codegen split, a window-marked exact-dup flag), then a single
ROLLUP aggregation emits every grain — per (lang, source), per lang, and
the corpus total — from one shuffle instead of three jobs. The dup flag
costs one extra hash-shuffle on md5(text) (the same key exact dedup
shuffles on); everything else is map-side.

The reference engine has no corpus-profiling surface; this extends the
training-data toolset (BASELINE.json north-star ops) like dedup.py /
text_analysis.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.chunker import words_of


def datacard(df: DataFrame, text_col: str, slice_cols: list[str],
             round_to: int = 4) -> DataFrame:
    """ROLLUP profile over `slice_cols`: one row per grain combination with

    - gid           — grouping_id (0 = finest grain, max = corpus total)
    - n_docs        — documents in the slice
    - n_dup_docs    — documents whose exact text occurs more than once in
                      the WHOLE corpus (global dup rate per slice, the
                      number exact dedup would remove plus the keepers)
    - tot_tokens    — whitespace tokens (the pretraining budget number)
    - avg_tokens / avg_chars — rounded means

    The means are derived from the exact integer sums, not F.avg: a double
    AVG accumulates in partition order, so the 4th decimal can differ per
    engine/partitioning. round_half_up(s/n, d) == (2*s*10^d + n) div (2n)
    scaled back down — pure integer arithmetic, then ONE double division by
    10^d, identical on every engine.
    """
    w = Window.partitionBy(F.md5(F.col(text_col)))
    per_row = df.select(
        *[F.col(c) for c in slice_cols],
        F.size(words_of(F.col(text_col))).alias("_toks"),
        F.length(F.col(text_col)).alias("_chars"),
        (F.count(F.lit(1)).over(w) > 1).cast("int").alias("_dup"))
    gcols = [F.col(c) for c in slice_cols]
    agg = (per_row.rollup(*gcols)
           .agg(F.grouping_id().alias("gid"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_dup").alias("n_dup_docs"),
                F.sum("_toks").alias("tot_tokens"),
                F.sum("_chars").alias("_tot_chars")))
    scale = 10 ** round_to

    def _mean(tot: str):
        return (F.expr(f"({tot} * {2 * scale}L + n_docs) div (2 * n_docs)")
                / F.lit(float(scale)))

    return agg.select(
        *slice_cols, "gid", "n_docs", "n_dup_docs", "tot_tokens",
        _mean("tot_tokens").alias("avg_tokens"),
        _mean("_tot_chars").alias("avg_chars"))
