"""Train/eval decontamination: n-gram overlap between an evaluation set and
a training corpus.

The standard LLM-benchmark hygiene check (cf. GPT-3 / PaLM appendix
methodology, public papers): an eval document is *contaminated* when a large
fraction of its word n-grams also appear anywhere in the training corpus.

Spark-first shape, designed for a 100-TB train side:

- both sides explode to (doc, n-gram) rows, but the join key is the salted
  60-bit md5 of the gram (``dedup.hash60``) — an 8-byte bigint instead of a
  ~50-byte string, so the shuffle is narrow and codegen compares ints;
- the train side is reduced to DISTINCT gram hashes before the join (one
  shuffle with map-side combine; the distinct set is the *vocabulary* of
  n-grams, far smaller than the corpus);
- eval grams LEFT-join the train vocabulary (each build-side key is unique,
  so the join can never blow up a probe row) and a single per-doc aggregate
  produces total / matched counts in one pass.

md5-based hashing keeps the operator bit-identical across engines (Spark,
DuckDB, Python) — the same reason dedup.py uses it — so the whole pipeline
is oracle-checkable.

Reference scope note: the reference engine (RASSEngine) has no
decontamination operator; this extends the corpus toolset the same way
dedup.py does (BASELINE.json north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, word_shingles


def ngram_overlap(eval_df: DataFrame, train_df: DataFrame,
                  text_col: str, id_col: str, n: int = 8) -> DataFrame:
    """Per eval doc: (id, n_grams, n_matched, overlap_frac).

    ``n_grams`` counts the doc's DISTINCT word n-grams (texts shorter than
    n words contribute their single whole-text shingle); ``n_matched`` of
    those occur somewhere in ``train_df``; ``overlap_frac`` is their ratio
    rounded to 6dp.
    """
    ev = (eval_df
          .select(F.col(id_col),
                  F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
          .select(id_col, hash60(F.col("gram")).alias("gh")))
    vocab = (train_df
             .select(F.explode(word_shingles(F.col(text_col), n))
                     .alias("gram"))
             .select(hash60(F.col("gram")).alias("gh"))
             .distinct()
             .withColumn("hit", F.lit(1)))
    per_doc = (ev.join(vocab, "gh", "left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.count("hit").alias("n_matched")))
    return per_doc.withColumn(
        "overlap_frac",
        F.round(F.col("n_matched").cast("double") / F.col("n_grams"), 6))


def flag_contaminated(eval_df: DataFrame, train_df: DataFrame,
                      text_col: str, id_col: str, n: int = 8,
                      threshold: float = 0.8) -> DataFrame:
    """ngram_overlap + boolean ``contaminated`` (overlap_frac >= threshold).

    Filter on the flag to drop tainted eval docs, or anti-join the flagged
    ids back onto the *train* side to scrub the training corpus instead.
    """
    return (ngram_overlap(eval_df, train_df, text_col, id_col, n)
            .withColumn("contaminated",
                        F.col("overlap_frac") >= F.lit(threshold)))
