"""Trainer evaluation jobs: deterministic holdout split + per-class and
overall metrics of the (rule) intent router over the synthetic corpus.

Reference: both trainers hold out a tail split of the generated corpus and
report accuracy / weighted F1 (app/train_intent.py:148-183 — 1600/400
split, ``compute_metrics``; app/train_ner.py:886-902). The learned models
can't run here, but the eval HARNESS is the engine surface: the same job
evaluates any ``str -> intent`` scorer expressible as a Column (the rule
router by default; an HF classifier via its pandas_udf seam scores into
the same shape).

Engine-exact by construction: the corpus is md5-deterministic
(ml/synth.py), the holdout is a modulo split (the SQL-reproducible analog
of the trainers' shuffled tail), predictions come from the expression
router (ml/intent.py intent_expr — parity-pinned against
classify_intent), and every metric is derived from INTEGER counts with
half-up integer division at 4 dp (never a double fold).

Scale: metrics are one conditional aggregation over (labels x holdout) —
labels is a 12-row broadcast, so this is a single scan with map-side
partial aggregation no matter the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .intent import INTENT_CATEGORIES, intent_case_sql, intent_expr
from .synth import intent_corpus, intent_corpus_sql

# round(num/den, 4) with HALF_UP via pure integer arithmetic (exact on any
# engine); 0.0 for an empty denominator (label never true/predicted)
# 0.0D / 10000.0D: Spark SQL parses bare decimal literals as DECIMAL, and
# BIGINT / DECIMAL is DECIMAL — the D suffix keeps the result a true DOUBLE
_RATIO4 = ("CASE WHEN {den} = 0 THEN 0.0D "
           "ELSE (({num} * 20000 + {den}) div (2 * ({den}))) / 10000.0D END")


def intent_eval(spark: SparkSession, n: int = 2000,
                holdout_mod: int = 5) -> DataFrame:
    """(label, n_true, n_pred, tp, precision, recall, f1) per intent class
    plus one 'OVERALL' row (accuracy in precision/recall/f1, n_correct in
    tp) over the qid % holdout_mod == holdout_mod-1 holdout (20% — the
    reference's 1600/400 split, app/train_intent.py:181-183)."""
    ev = (intent_corpus(spark, n)
          .filter(F.col("qid") % holdout_mod == holdout_mod - 1)
          .select("intent", intent_expr(F.col("query")).alias("pred")))
    labels = spark.createDataFrame([(c,) for c in INTENT_CATEGORIES],
                                   "label string")
    per = (ev.crossJoin(F.broadcast(labels))
             .groupBy("label")
             .agg(F.sum((F.col("intent") == F.col("label")).cast("long"))
                  .alias("n_true"),
                  F.sum((F.col("pred") == F.col("label")).cast("long"))
                  .alias("n_pred"),
                  F.sum(((F.col("intent") == F.col("label"))
                         & (F.col("pred") == F.col("label"))).cast("long"))
                  .alias("tp")))
    overall = (ev.agg(F.count(F.lit(1)).alias("n_true"),
                      F.count(F.lit(1)).alias("n_pred"),
                      F.sum((F.col("intent") == F.col("pred")).cast("long"))
                      .alias("tp"))
               .select(F.lit("OVERALL").alias("label"),
                       "n_true", "n_pred", "tp"))
    return (per.unionByName(overall)
            .select("label", "n_true", "n_pred", "tp",
                    F.expr(_RATIO4.format(num="tp", den="n_pred"))
                    .alias("precision"),
                    F.expr(_RATIO4.format(num="tp", den="n_true"))
                    .alias("recall"),
                    F.expr(_RATIO4.format(num="2 * tp",
                                          den="n_true + n_pred"))
                    .alias("f1")))


def intent_eval_sql(n: int = 2000, holdout_mod: int = 5) -> str:
    """DuckDB twin of intent_eval — same corpus, split, router, and
    integer-exact metric arithmetic (// is DuckDB integer division)."""
    def ratio4(num: str, den: str) -> str:
        # DuckDB SUM() yields HUGEINT, and HUGEINT / DECIMAL-literal is
        # DECIMAL (trailing-zero rendering) — cast to BIGINT so the final
        # division is BIGINT / DECIMAL -> DOUBLE, like the Spark side
        n, d = f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)"
        return (f"CASE WHEN {d} = 0 THEN 0.0 "
                f"ELSE (({n} * 20000 + {d}) // (2 * ({d}))) / 10000.0 "
                f"END")

    lbl = " , ".join(f"('{c}')" for c in INTENT_CATEGORIES)
    return f"""
WITH corpus AS ({intent_corpus_sql(n)}),
ev AS (
  SELECT intent, {intent_case_sql("query")} AS pred
  FROM corpus WHERE qid % {holdout_mod} = {holdout_mod - 1}),
lbl AS (SELECT * FROM (VALUES {lbl}) t(label)),
per AS (
  SELECT l.label,
         SUM(CASE WHEN e.intent = l.label THEN 1 ELSE 0 END) AS n_true,
         SUM(CASE WHEN e.pred = l.label THEN 1 ELSE 0 END) AS n_pred,
         SUM(CASE WHEN e.intent = l.label AND e.pred = l.label
                  THEN 1 ELSE 0 END) AS tp
  FROM lbl l CROSS JOIN ev e GROUP BY l.label
  UNION ALL
  SELECT 'OVERALL', COUNT(*), COUNT(*),
         SUM(CASE WHEN intent = pred THEN 1 ELSE 0 END)
  FROM ev)
SELECT label, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
       {ratio4('tp', 'n_pred')} AS precision,
       {ratio4('tp', 'n_true')} AS recall,
       {ratio4('2 * tp', 'n_true + n_pred')} AS f1
FROM per
"""
