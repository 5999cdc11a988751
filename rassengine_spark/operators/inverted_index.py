"""Inverted-index (postings table) lexical search: the materialized-view
analog of the reference's Lucene inverted index (SURVEY §4 O5 — OpenSearch
gets sublinear lexical search from its index; Spark's equivalent is a
precomputed postings TABLE, not a custom Catalyst structure).

Build once per corpus version:

    postings  (term, id, tf)   — one row per distinct (doc, term)
    doclens   (id, dl)         — document token counts
    stats     (n_docs, avgdl)  — one row

Query time: the query's terms (a tiny literal list) semi-select the
postings — at 100 TB, write `postings` partitioned/bucketed by `term` and
the scan PRUNES to the query's terms instead of reading the corpus; only
docs containing >=1 query term ("candidates") are ever scored. BM25 scores
are computed from (tf, df, dl) alone, bit-compatible with the scan-based
`functions.bm25.bm25_topk`: per-term contributions fold in a DETERMINISTIC
term order (array_sort before aggregate), not shuffle arrival order, so
index-served and scan-served scores round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1
from ..functions.text import terms_of, tokenize


def build_term_index(df: DataFrame, text_col: str, id_col: str
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doclens, stats) for a corpus. One explode + one
    hash-aggregate on (term, id); doclens/stats are map-side cheap.
    Persist with operators/index_store.save_term_index (md5-bucketed
    partitioning) for term-pruned lookups at scale."""
    toks = df.select(F.col(id_col).alias("id"),
                     tokenize(F.col(text_col)).alias("_toks"))
    postings = (toks.select("id", F.explode("_toks").alias("term"))
                    .groupBy("term", "id")
                    .agg(F.count(F.lit(1)).alias("tf")))
    doclens = toks.select("id", F.size("_toks").alias("dl"))
    stats = doclens.agg(F.count(F.lit(1)).alias("n_docs"),
                        F.avg("dl").alias("avgdl"))
    return postings, doclens, stats


def bm25_topk_from_index(postings: DataFrame, doclens: DataFrame,
                         stats: DataFrame, query: str, k: int = 10,
                         k1: float = K1, b: float = B,
                         round_to: int = 6) -> DataFrame:
    """Top-k (id, score) by BM25 served ENTIRELY from the index tables —
    the corpus text is never touched. Identical scores to
    `bm25_topk(corpus, ...)` for the same corpus/query (parity-tested):
    same idf/tf/dl math, and the per-term sum folds in query-term order
    exactly like the scan form's left-to-right expression."""
    terms = terms_of(query)
    if not terms:
        raise ValueError("no tokenizable terms in query")
    order = {}            # first-occurrence order == expression fold order
    for t in terms:
        order.setdefault(t, len(order))

    p = postings.filter(F.col("term").isin(*list(order)))
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ti = F.create_map(*[x for t, i in order.items()
                        for x in (F.lit(t), F.lit(i))])

    contrib = (p.join(F.broadcast(dfreq), "term")
                .join(doclens, "id")
                .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    c = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl
                                            / F.greatest(F.col("avgdl"), F.lit(1e-12))))
    per_term = contrib.select(
        "id", F.struct(ti[F.col("term")].alias("i"),
                       c.alias("c")).alias("tc"))
    # deterministic fold, bit-identical to the scan expression even for
    # repeated query terms: collect each doc's per-distinct-term
    # contribution into a map, then accumulate one addition PER QUERY-TERM
    # OCCURRENCE in occurrence order — exactly the scan form's
    # left-to-right `score + c_t` chain ('a b a' folds ((0+c_a)+c_b)+c_a
    # on both paths). Terms the doc lacks add a literal 0.0, matching the
    # scan form's computed tf=0 contribution (also exactly 0.0).
    cmap = F.map_from_entries(F.collect_list("tc"))
    occ = F.array(*[F.lit(order[t]) for t in terms])
    raw = F.aggregate(occ, F.lit(0.0),
                      lambda acc, i: acc + F.coalesce(cmap[i], F.lit(0.0)))
    # filter on the UNROUNDED score like bm25_topk/bm25_sql do: a doc with
    # raw score in (0, 5e-7) must be emitted (as 0.0) on both paths
    return (per_term.groupBy("id")
            .agg(raw.alias("_raw"))
            .filter(F.col("_raw") > 0)
            .select("id", F.round(F.col("_raw"), round_to).alias("score"))
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(k))


def bm25_batch_topk_from_index(postings: DataFrame, doclens: DataFrame,
                               stats: DataFrame, queries: dict[str, str],
                               k: int = 10, k1: float = K1, b: float = B,
                               round_to: int = 6) -> DataFrame:
    """Per-query BM25 top-k for a BATCH of queries served from the index
    tables: (query_id, id, score, rank). The batch analog of
    bm25_topk_from_index — candidates come from ONE term-pruned postings
    read for the union of all query terms; per-(query, doc) scores fold
    each query's per-OCCURRENCE contributions in query order through the
    same map-accumulate as the single-query form, so scores are
    bit-identical to scoring each query alone. NOTHING in the plan is
    sized by |Q| or the vocabulary except two broadcasts and one literal
    map (unlike a per-doc tf-column layout, whose schema grows with the
    union term count)."""
    per_q = {qid: terms_of(q) for qid, q in queries.items()}
    per_q = {qid: ts for qid, ts in per_q.items() if ts}
    if not per_q:
        raise ValueError("no tokenizable terms in any query")
    uniq = sorted({t for ts in per_q.values() for t in ts})
    ti_of = {t: i for i, t in enumerate(uniq)}

    p = postings.filter(F.col("term").isin(uniq))
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    spark = postings.sparkSession
    qterm = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(per_q.items())
         for t in sorted(set(ts))], "query_id string, term string")

    contrib = (p.join(F.broadcast(qterm), "term")
                .join(F.broadcast(dfreq), "term")
                .join(doclens, "id")
                .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    c = idf * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * dl
                   / F.greatest(F.col("avgdl"), F.lit(1e-12))))
    ti = F.create_map(*[x for t, i in ti_of.items()
                        for x in (F.lit(t), F.lit(i))])
    per_term = contrib.select(
        "query_id", "id",
        F.struct(ti[F.col("term")].alias("i"), c.alias("c")).alias("tc"))

    # one parsed literal: query_id -> its occurrence list of term indices
    # (repeats preserved — the fold adds once per occurrence, exactly the
    # scan form's left-to-right chain)
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"
    occ_sql = "map(" + ", ".join(
        f"{q(qid)}, array({', '.join(str(ti_of[t]) for t in ts)})"
        for qid, ts in sorted(per_q.items())) + ")"
    occ = F.expr(occ_sql)[F.col("query_id")]

    cmap = F.map_from_entries(F.collect_list("tc"))
    raw = F.aggregate(occ, F.lit(0.0),
                      lambda acc, i: acc + F.coalesce(cmap[i], F.lit(0.0)))
    scored = (per_term.groupBy("query_id", "id")
              .agg(raw.alias("_raw"))
              .filter(F.col("_raw") > 0)
              .select("query_id", "id",
                      F.round(F.col("_raw"), round_to).alias("score")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "id", "score", "rank"))
