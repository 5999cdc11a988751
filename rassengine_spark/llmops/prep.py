"""End-to-end training-corpus preparation: the composed pipeline a
pretraining data job actually runs, built from the operators in this
package — each stage is individually oracle-checked by the driver contract;
this module owns only the composition and the stage accounting.

    raw docs
      0a. unicode cleanup       (opt-in: text_analysis.unicode_clean —
                                 NFC + control/zero-width strip, so dedup
                                 sees canonical bytes)
      0b. corpus line dedup     (opt-in: text_analysis.line_dedup —
                                 C4-style boilerplate removal)
      1. exact dedup            (dedup.exact_dedup — hash shuffle)
      2. near-dup clusters      (dedup.minhash_lsh_pairs -> dup_clusters;
                                 one keeper per cluster survives)
      3. eval decontamination   (decontam vocabulary join, train side
                                 scrubbed of docs overlapping the eval set)
      4. quality filter         (text_analysis.quality_features composite)
      5. PII redaction          (text_analysis.pii_redact projection)
      6. split assignment       (splits.with_split deterministic hash bins)
    -> training corpus + per-stage row counts

Scale notes: stages 1-3 are the shuffle-bearing ones (content-hash agg, LSH
band join + connected components, gram-vocabulary join); 4-6 are scan-fused
projections/filters. The stage report forces one count job per stage —
pass ``count_stages=False`` to fuse the whole pipeline into the final
write when accounting isn't needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import ngram_overlap_fast
from .dedup import dup_clusters, exact_dedup, minhash_lsh_pairs
from .splits import with_split
from .text_analysis import pii_redact, quality_features_fast


def prepare_training_corpus(
        docs: DataFrame, eval_df: DataFrame | None = None, *,
        text_col: str = "text", id_col: str = "doc_id",
        near_dup_threshold: float = 0.5,
        keeper: str = "min_id",
        decontam_n: int = 8, decontam_threshold: float = 0.8,
        min_quality: float = 0.66,
        redact: bool = True,
        unicode_normalize: bool = False,
        drop_boilerplate_lines: bool = False,
        strip_boilerplate_sources: str | None = None,
        boilerplate_min_docs: int = 2,
        boilerplate_min_frac_ppm: int = 500_000,
        substring_min_shared: int | None = None,
        substring_max_postings: int | None = 100,
        dsir_target: DataFrame | None = None,
        dsir_keep_pct: int = 25,
        split_weights: dict[str, float] | None = None,
        count_stages: bool = True,
        materialize: bool = False,
) -> tuple[DataFrame, list[tuple[str, int]]]:
    """Run the full prep pipeline; returns (corpus, stage_report) where
    stage_report = [(stage_name, rows_after), ...] (empty when
    ``count_stages=False``).

    ``materialize=True`` localCheckpoints the corpus after the dedup
    stages: the deduped frame feeds FOUR consumers (LSH pairs, the
    anti-join probe side, the decontam gram pass, the quality filter), so
    without it the exact-dedup window re-executes once per consumer.
    Storing one corpus copy on executors to save three corpus recomputes
    is the right trade whenever the upstream scan+window isn't trivially
    cheap; left off by default so callers opt into the storage cost."""
    if keeper not in ("min_id", "longest"):
        raise ValueError(f"keeper must be 'min_id' or 'longest', "
                         f"got {keeper!r}")
    report: list[tuple[str, int]] = []

    def mark(stage: str, df: DataFrame) -> DataFrame:
        if count_stages:
            report.append((stage, df.count()))
        return df

    def pin(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if materialize else df

    df = mark("input", docs)

    # 0a. Unicode canonicalization BEFORE dedup: decomposed vs composed
    # spellings of the same text must hash identically
    if unicode_normalize:
        from .text_analysis import unicode_clean
        cleaned = unicode_clean(df, text_col, id_col) \
            .select(F.col("id").alias(id_col),
                    F.col("clean").alias(text_col))
        keep = [c for c in df.columns if c not in (id_col, text_col)]
        if keep:
            cleaned = cleaned.join(df.select(id_col, *keep), id_col)
        df = mark("unicode_clean", cleaned)

    # 0b. corpus-level boilerplate line removal (C4 pass) before
    # doc-level dedup: shared headers/footers otherwise glue distinct
    # docs into near-dup clusters
    if drop_boilerplate_lines:
        from .text_analysis import line_dedup
        deduped = line_dedup(df, text_col, id_col) \
            .select(F.col("id").alias(id_col),
                    F.col("text").alias(text_col))
        keep = [c for c in df.columns if c not in (id_col, text_col)]
        if keep:
            deduped = deduped.join(df.select(id_col, *keep), id_col)
        df = mark("line_dedup", deduped)

    # 0c. per-source boilerplate removal (CCNet/RefinedWeb per-domain
    # pass): lines frequent WITHIN a source drop from every doc of that
    # source — catches domain headers/footers the corpus-global pass
    # only dedups to one survivor. Opt-in via the source column name.
    if strip_boilerplate_sources:
        from .boilerplate import (boilerplate_lines_by_source,
                                  strip_boilerplate_by_source)
        src_col = strip_boilerplate_sources
        # three consumers of the upstream frame (flag aggregation, strip
        # scan, ride-along rejoin) — pin like the dedup-stage fan-out
        df = pin(df)
        flags = (boilerplate_lines_by_source(
                     df, text_col, id_col, src_col,
                     min_docs=boilerplate_min_docs,
                     min_frac_ppm=boilerplate_min_frac_ppm)
                 .filter(F.col("flagged")))
        stripped = strip_boilerplate_by_source(
            df, text_col, id_col, src_col, flags) \
            .select(F.col("id").alias(id_col),
                    F.col("text").alias(text_col))
        keep = [c for c in df.columns if c not in (id_col, text_col)]
        if keep:
            stripped = stripped.join(df.select(id_col, *keep), id_col)
        df = mark("boilerplate_by_source", stripped)

    # 1. exact dedup — keep min-id per byte-identical text
    df = mark("exact_dedup", pin(exact_dedup(df, text_col, id_col)))

    # 2. near-dup clusters — keeper per MinHash-LSH cluster. Default
    # policy 'min id survives' (node != root rows anti-joined away);
    # keeper="longest" picks the longest member instead (the common
    # practical policy — the fullest page survives, boilerplate-trimmed
    # fragments drop) via the same cluster_keepers argmax every scoring
    # rides. Docs in no cluster survive untouched either way.
    pairs = minhash_lsh_pairs(df, text_col, id_col,
                              threshold=near_dup_threshold)
    clusters = dup_clusters(pairs)
    if keeper == "longest":
        from .dedup import cluster_keepers
        scores = df.select(F.col(id_col),
                           F.length(F.coalesce(F.col(text_col),
                                               F.lit(""))).alias("_len"))
        keepers = (cluster_keepers(clusters, scores, id_col=id_col,
                                   score_col="_len")
                   .select(F.col("keeper").alias("node")))
        # clusters already has exactly one row per node — no distinct
        losers = (clusters.select("node")
                  .join(keepers, "node", "left_anti")
                  .select(F.col("node").alias(id_col)))
    else:
        losers = (clusters
                  .filter(F.col("node") != F.col("root"))
                  .select(F.col("node").alias(id_col)))
    df = mark("near_dedup", pin(df.join(losers, id_col, "left_anti")))

    # 2b. opt-in exact-substring pass: winnowing pairs catch copies the
    # LSH threshold misses (long verbatim passages inside otherwise-
    # different docs — boundary-free, a guarantee not an estimate);
    # min-id keeper per pair, transitively via the loser side
    if substring_min_shared is not None:
        from .dedup import substring_dup_pairs
        sub_pairs = substring_dup_pairs(
            df, text_col, id_col, min_shared=substring_min_shared,
            max_postings=substring_max_postings)
        sub_losers = sub_pairs.select(F.col("id_b").alias(id_col)) \
                              .distinct()
        df = mark("substring_dedup",
                  pin(df.join(sub_losers, id_col, "left_anti")))

    # 3. decontamination — scrub TRAIN docs that overlap the eval set:
    # per-train-doc n-gram overlap against the eval vocabulary (roles of
    # ngram_overlap swapped relative to eval-side flagging), drop docs at
    # or above the threshold.
    if eval_df is not None:
        overlap = ngram_overlap_fast(df, eval_df, text_col, id_col,
                                     n=decontam_n)
        # pin the tainted-id frame (tiny): the post-decontam df feeds
        # both the quality Arrow pass and its own semi-join left side,
        # and each consumer otherwise re-runs the whole overlap gram
        # pass living in tainted's lineage
        tainted = pin(overlap
                      .filter(F.col("overlap_frac") >= decontam_threshold)
                      .select(id_col))
        df = mark("decontam", df.join(tainted, id_col, "left_anti"))

    # 4. quality filter — composite heuristic score threshold (Arrow
    # stats pass; bit-identical to the expression form)
    quality = (quality_features_fast(df, text_col, id_col)
               .filter(F.col("quality") >= min_quality)
               .select(F.col("id").alias(id_col)))
    df = mark("quality", df.join(quality, id_col, "left_semi"))

    # 4b. opt-in DSIR selection (llmops/dsir.py): keep only the most
    # target-like fraction by hashed-bigram importance — domain-targeted
    # curation AFTER the generic quality floor (quality drops garbage,
    # DSIR then shapes the mixture toward `dsir_target`). Off by default
    # so the composed oracle is unchanged.
    if dsir_target is not None:
        from .dsir import select_target_like
        keep = select_target_like(df, dsir_target, text_col, id_col,
                                  keep_fraction_pct=dsir_keep_pct) \
            .select(F.col("id").alias(id_col))
        df = mark("dsir_select", df.join(keep, id_col, "left_semi"))

    # 5. PII redaction — in-place projection on the text column
    if redact:
        df = df.withColumn(text_col, pii_redact(F.col(text_col)))

    # 6. split assignment — deterministic hash bins on the id
    df = mark("split", with_split(df, id_col, split_weights))
    return df, report
