"""Second-stage reranking over first-stage retrieval candidates.

The reference ranks once (OpenSearch BM25 / kNN scores) and hands the top-k
straight to the LLM (app/main.py:2894-2921). Production RAG stacks insert a
rerank stage between retrieval and generation: a cheap first stage scans the
corpus for ~10-100 candidates, an expensive scorer (cross-encoder) re-orders
only those. This module supplies that seam with the engine's usual split:

- deterministic default — query-term Jaccard overlap as a pure Column
  expression (codegen, oracle-checkable), good enough to pin the pipeline
  shape and the tests;
- pluggable `RerankFn` — `(query, texts) -> scores`, applied via one Arrow
  batch pass; `ml.plugins.hf_cross_encoder` provides the real model behind
  the same contract (import-gated like the other plug-ins).

Scale shape: the rerank input is the OUTPUT of first-stage top-k — tens of
rows regardless of corpus size — so the expensive scorer touches O(k) texts
per query. The first stage already paid the corpus scan; this stage's cost
is model inference, not data movement.
"""

from __future__ import annotations

from typing import Callable, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import terms_of, tokenize

RerankFn = Callable[[str, List[str]], List[float]]


def term_jaccard_expr(text_col: Column, query: str,
                      round_to: int = 6) -> Column:
    """Deterministic rerank score: Jaccard between the query's distinct
    terms and the document's distinct terms."""
    qterms = sorted(set(terms_of(query)))
    if not qterms:
        return F.lit(0.0)
    toks = F.array_distinct(tokenize(F.coalesce(text_col, F.lit(""))))
    q = F.array(*[F.lit(t) for t in qterms])
    inter = F.size(F.array_intersect(toks, q)).cast("double")
    union = (F.size(toks) + F.lit(len(qterms))).cast("double") - inter
    return F.round(inter / F.greatest(union, F.lit(1.0)), round_to)


def rerank_topk(hits: DataFrame, query: str, text_col: str, id_col: str,
                k: int | None = None, rerank_fn: RerankFn | None = None,
                score_col: str = "rerank_score") -> DataFrame:
    """Re-score + re-order first-stage hits; keep top `k` (None = all).
    Ties break on the first-stage order's id for determinism."""
    if rerank_fn is None:
        scored = hits.withColumn(
            score_col, term_jaccard_expr(F.col(text_col), query))
    else:
        from pyspark.sql.types import DoubleType, StructField, StructType

        # fresh StructType: .add() would mutate the DataFrame's cached
        # schema object in place
        schema = StructType(list(hits.schema.fields)
                            + [StructField(score_col, DoubleType())])

        def run(batches):
            for pdf in batches:
                texts = ["" if t is None else str(t)
                         for t in pdf[text_col].tolist()]
                pdf = pdf.copy()
                pdf[score_col] = (list(rerank_fn(query, texts))
                                  if texts else [])
                yield pdf

        scored = hits.mapInPandas(run, schema=schema)
    ordered = scored.orderBy(F.col(score_col).desc(),
                             F.col(id_col).asc())
    return ordered.limit(k) if k is not None else ordered
