"""Product-quantization (PQ) ANN tier: the storage/compute scale path past
int8 — each vector is m uint8 codewords (m bytes vs 4·d float32 / 8·d
double: 64x for d=64, m=8), and query scoring is m table lookups per
vector instead of d multiplies (ADC — asymmetric distance computation;
Jégou et al., "Product Quantization for Nearest Neighbor Search", public).

Same engine-exactness discipline as the IVF tier (similarity.py):

- codebooks are the md5-ordered deterministic sample of corpus vectors,
  split into m subvectors — reproducible in any engine (an MLlib KMeans
  per subspace drops into ``codebooks=`` when cross-engine determinism
  isn't required);
- encoding picks, per subspace, the codeword minimizing L2 distance via
  the dot identity  argmin ||s-c||²  ==  argmax (s·c − ½ c·c)  — pure dot
  products, rounded BEFORE the argmax, ties to the lower code;
- ADC contributions fold in subspace order (Spark: transform + aggregate
  left fold; DuckDB: SUM(x ORDER BY j)) so scores are bit-identical.

Plan shape at 100 TB: encoding is a per-row projection over one matrix
literal per subspace (no shuffle, no joins); scoring joins the encoded
corpus (m small ints per row — the ONLY thing scanned) against a
broadcast query batch carrying its precomputed lookup tables; the final
per-query k-heap is the only shuffle. The reference's vector tier is a
single-node HNSW (app/main.py:563-572); PQ is the corpus-compression
complement Spark needs when the vectors themselves dominate scan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot_sql
from ..util import double_array_sql, double_matrix_sql, qident
from .similarity import _per_query_topk


def _dot_py(a: list[float], b: list[float]) -> float:
    """Left-fold float64 dot — bit-identical to functions.vector.dot and
    DuckDB list_dot_product on the same inputs."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def pq_codebooks(corpus: DataFrame, vec_col: str, id_col: str,
                 m: int = 8, n_codes: int = 16) -> list[list[list[float]]]:
    """m codebooks of n_codes subvectors each, from the md5-ordered sample
    (the same deterministic quantizer-seeding as similarity.ivf_centroids).
    Driver footprint: n_codes x d doubles."""
    from .similarity import md5_sample
    sample = md5_sample(corpus, vec_col, id_col, n_codes)
    return split_codebooks(sample, m)


def split_codebooks(sample: list[list[float]], m: int
                    ) -> list[list[list[float]]]:
    """Split k sampled vectors into m per-subspace codebooks."""
    d = len(sample[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [[vec[j * sub:(j + 1) * sub] for vec in sample]
            for j in range(m)]


def pq_code_expr_sql(vec_sql: str, codebooks: list[list[list[float]]],
                     round_to: int = 6) -> str:
    """SQL text of the array<int> of m codewords for the vector operand
    `vec_sql` — a pure projection (one matrix literal + transform per
    subspace, O(1) plan nodes in n_codes). Two round-8 cost cuts, both
    value-exact:

    - emitted as ONE SQL string (a single F.expr parse) instead of ~3
      py4j higher-order-function builds per subspace (guide §1.2 applied
      to the driver — each lambda costs ~25 ms of round-trips);
    - each codeword's constant self-term 0.5·c·c is hoisted to a
      driver-side literal (_dot_py folds left exactly like the JVM
      aggregate, and 0.5*x is one IEEE multiply in either engine), so
      the per-row affinity drops from two sub-dim folds per codeword to
      one (guide §2.3, narrower per-row compute).

    r09 note: an UNROLLED scalar variant (element_at multiply-add chains
    with the identical 0.0-start fold) was measured SLOWER in place
    (0.6 -> 1.5-2.0 s per encode pass — the ~1k-node trees defeat JIT of
    the generated code); the HOF form stays. What DID land (r09): pass a
    CHEAP operand — a bare column name — as `vec_sql`; a derived operand
    (the residual zip_with) must be projected into its own column first
    or each of the m subspace slices re-evaluates it per row (that
    projection fix alone was 1.08 -> 0.60 s on the residual encode; see
    ivfpq_residual_topk)."""
    codes = []
    for j, cb in enumerate(codebooks):
        sub = len(cb[0])
        s = f"slice({vec_sql}, {j * sub + 1}, {sub})"
        half = double_array_sql([0.5 * _dot_py(c, c) for c in cb])
        aff = (f"transform({double_matrix_sql(cb)}, (c, i) -> named_struct("
               f"'ns', -round({dot_sql(s, 'c')}"
               f" - element_at({half}, i + 1), {round_to}), "
               f"'c', i))")
        codes.append(f"array_min({aff}).c")
    return "array(" + ", ".join(codes) + ")"


def pq_code_expr(vec_sql: str, codebooks: list[list[list[float]]],
                 round_to: int = 6) -> Column:
    """Column form of pq_code_expr_sql (same single-parse build)."""
    return F.expr(pq_code_expr_sql(vec_sql, codebooks, round_to))


def pq_encode(corpus: DataFrame, vec_col: str, id_col: str,
              codebooks: list[list[list[float]]],
              round_to: int = 6) -> DataFrame:
    """(id, codes) — the compressed corpus; persist THIS (m bytes of codes
    per row) and drop the vectors from the serving path."""
    return corpus.select(
        F.col(id_col).alias("id"),
        pq_code_expr(qident(vec_col), codebooks, round_to).alias("codes"))


def _collect_query_rows(queries: DataFrame, vec_col: str,
                        query_id_col: str) -> list[tuple[int, list[float]]]:
    """ONE collect of the (bounded) query batch — every driver-side
    query-derived artifact (ADC tables, probe pairs) is built from these
    rows so a serve call scans the queries frame exactly once. The
    float->double widening is exact, so downstream local-frame JVM
    evaluation matches what an in-plan cast would have produced."""
    return [(int(r[0]), [float(x) for x in r[1]])
            for r in queries.select(F.col(query_id_col).cast("long"),
                                    F.col(vec_col)).collect()]


def _adc_tables_from_rows(spark, q_rows: list[tuple[int, list[float]]],
                          cbs: list[list[list[float]]]) -> DataFrame:
    """Each query's m x n_codes ADC lookup table from already-collected
    rows, via the engine-exact driver-side fold; returns (query_id, tab)
    ready to broadcast."""
    sub = len(cbs[0][0])
    tabs = [(qid,
             [[_dot_py(v[j * sub:(j + 1) * sub], c)
               for c in cbs[j]] for j in range(len(cbs))])
            for qid, v in q_rows]
    return spark.createDataFrame(
        tabs, "query_id long, tab array<array<double>>")


def _adc_query_tables(queries: DataFrame, vec_col: str, query_id_col: str,
                      cbs: list[list[list[float]]]) -> DataFrame:
    """Collect the (bounded) query batch and build each query's
    m x n_codes ADC lookup table with the engine-exact driver-side fold;
    returns (query_id, tab) ready to broadcast."""
    return _adc_tables_from_rows(
        queries.sparkSession,
        _collect_query_rows(queries, vec_col, query_id_col), cbs)


def _sample_and_query_rows(corpus: DataFrame, queries: DataFrame,
                           vec_col: str, id_col: str, query_id_col: str,
                           n_sample: int
                           ) -> tuple[list[list[float]],
                                      list[tuple[int, list[float]]]]:
    """Both bounded driver-side artifacts in ONE Spark action (r09,
    guide §1.2: at serving scale these entries' cost is a handful of
    small driver jobs, and the md5-ordered quantizer sample and the
    query batch were two of them). The sample subtree rides a tagged
    union with the query rows; its md5 key comes along so the sample's
    order is re-derived DRIVER-side and the result is independent of
    union/collect row order — value-identical to
    md5_sample + _collect_query_rows (query-row order never affects
    results downstream: tables/pairs join by query_id)."""
    mk = F.md5(F.col(id_col).cast("string"))
    s = (corpus.orderBy(mk).limit(n_sample)
         .select(F.lit(0).alias("_t"), mk.alias("_k"),
                 F.lit(None).cast("long").alias("_q"),
                 F.col(vec_col).alias("_v")))
    q = queries.select(F.lit(1).alias("_t"),
                       F.lit(None).cast("string").alias("_k"),
                       F.col(query_id_col).cast("long").alias("_q"),
                       F.col(vec_col).alias("_v"))
    rows = s.unionAll(q).collect()
    sample = [[float(x) for x in r["_v"]]
              for r in sorted((r for r in rows if r["_t"] == 0),
                              key=lambda r: r["_k"])]
    q_rows = [(int(r["_q"]), [float(x) for x in r["_v"]])
              for r in rows if r["_t"] == 1]
    return sample, q_rows


def _adc_score(round_to: int, base_sql: str | None = None) -> Column:
    """score = [base +] sum_j tab[j][codes[j]]; the sum folds in subspace
    order and the optional base term (residual IVFADC's centroid dot,
    rendered as SQL text) is added AFTER the fold — FP addition is
    commutative, so sum+base matches an oracle's base+sum bit-for-bit.
    Emitted as one parsed SQL string (round 8, guide §1.2): same
    transform/aggregate tree as the old per-lambda py4j build."""
    contribs = ("transform(codes, (c, j) -> "
                "element_at(element_at(tab, j + 1), c + 1))")
    total = f"aggregate({contribs}, 0.0D, (a, x) -> a + x)"
    if base_sql is not None:
        total = f"({total} + {base_sql})"
    return F.expr(f"round({total}, {round_to})")


def _probe_pairs_local(q_rows: list[tuple[int, list[float]]],
                       centroids: list[list[float]], n_probe: int,
                       round_to: int) -> list[tuple[int, int]]:
    """(query_id, cell) probe pairs for an already-collected query batch,
    via the pure-Python affinity twin (cells_by_affinity_py — parity
    with the in-plan JVM expressions pinned by tests/test_properties.py):
    zero Spark evaluation per serve call, where the previous local-frame
    JVM form still paid ~0.5 s of interpreted driver eval. The pairs
    feed BOTH the broadcast probe frame and the encode prefilter, so the
    two can never disagree (the old job-per-artifact shape had to
    re-assert determinism of the queries frame instead)."""
    from .similarity import cells_by_affinity_py

    return [(qid, c) for qid, v in q_rows
            for c in cells_by_affinity_py(v, centroids, round_to)[:n_probe]]


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, vec_col: str,
               id_col: str, query_id_col: str, k: int = 5,
               n_cells: int = 8, n_probe: int = 2, m: int = 8,
               n_codes: int = 16, round_to: int = 6,
               centroids: list[list[float]] | None = None,
               codebooks: list[list[list[float]]] | None = None
               ) -> DataFrame:
    """Composed IVF + PQ (the FAISS-style IVFADC layout, sans residual
    encoding — documented simplification): the coarse quantizer prunes to
    n_probe cells per query AND the pruned candidates are scored from
    their m-byte PQ codes, so a query touches O(N * n_probe / n_cells)
    rows of m bytes each — both axes of the 100 TB cost cut at once.
    Cell choice reuses the IVF rounded-cosine argmax; codes and ADC
    tables reuse the PQ machinery. Engine-exact end to end."""
    from .similarity import _best_cell

    spark = corpus.sparkSession
    if centroids is None or codebooks is None:
        # centroids are a PREFIX of the codebook sample (same md5 order),
        # and the sample + query batch collect in ONE job (r09) — a
        # serve call pays a single driver action for all its bounded
        # artifacts (probe pairs and ADC tables are then local evals)
        sample, q_rows = _sample_and_query_rows(
            corpus, queries, vec_col, id_col, query_id_col,
            max(n_cells, n_codes))
        cents = centroids or sample[:n_cells]
        cbs = codebooks or split_codebooks(sample[:n_codes], m)
    else:
        cents, cbs = centroids, codebooks
        q_rows = _collect_query_rows(queries, vec_col, query_id_col)
    pairs = _probe_pairs_local(q_rows, cents, n_probe, round_to)
    probe_cells = sorted({c for _, c in pairs})
    qprobe = spark.createDataFrame(pairs, "query_id long, cell int")
    # the EXPENSIVE encode projection runs on probed cells only: cell
    # assignment is 1 affinity pass/row, but the PQ encode is m x
    # n_codes of them — filtering between the two is what actually
    # delivers O(N * n_probe / n_cells) encode work
    enc = (corpus.select(
               F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
               _best_cell(qident(vec_col), cents, round_to).alias("cell"))
           .filter(F.col("cell").isin(probe_cells))
           .select("id", "cell",
                   pq_code_expr("v", cbs, round_to).alias("codes")))
    qdf = _adc_tables_from_rows(spark, q_rows, cbs)
    joined = enc.join(F.broadcast(qprobe.join(qdf, "query_id")), "cell")
    return (_per_query_topk(
                joined.withColumn("score", _adc_score(round_to)), k)
            .select("query_id", "id", "score", "rank"))


def residual_codebooks(corpus: DataFrame, vec_col: str, id_col: str,
                       centroids: list[list[float]], m: int,
                       n_codes: int, round_to: int = 6
                       ) -> list[list[list[float]]]:
    """PQ codebooks trained on RESIDUALS (v - centroid[cell]) — the
    quantity residual-IVFADC actually encodes. Collects the md5 sample
    from the corpus, then delegates to the driver-local twin path."""
    from .similarity import md5_sample
    sample = md5_sample(corpus, vec_col, id_col, n_codes)
    return residual_codebooks_local(sample, centroids, m, round_to)


def residual_codebooks_local(sample: list[list[float]],
                             centroids: list[list[float]], m: int,
                             round_to: int = 6
                             ) -> list[list[list[float]]]:
    """Residual codebooks from an ALREADY-COLLECTED md5-ordered sample:
    cell assignment via the pure-Python affinity twin (parity with the
    corpus-side _best_cell expression pinned by tests/test_properties.py)
    and the elementwise double subtraction done in Python (IEEE-exact),
    so seeding both quantizers costs ONE corpus TakeOrdered scan and
    ZERO local Spark evaluation — the previous local-frame JVM form
    (itself one scan cheaper than the round-2 two-scan shape) still paid
    ~0.5 s of interpreted driver eval per build."""
    from .similarity import cells_by_affinity_py

    resids = []
    for v in sample:
        cent = centroids[cells_by_affinity_py(v, centroids, round_to)[0]]
        resids.append([x - c for x, c in zip(v, cent)])
    return split_codebooks(resids, m)


def ivfpq_residual_topk(corpus: DataFrame, queries: DataFrame,
                        vec_col: str, id_col: str, query_id_col: str,
                        k: int = 5, n_cells: int = 8, n_probe: int = 2,
                        m: int = 8, n_codes: int = 16,
                        round_to: int = 6,
                        centroids: list[list[float]] | None = None
                        ) -> DataFrame:
    """Residual IVFADC (the full FAISS IVF-PQ layout): candidates are
    encoded as PQ codes of (v - centroid[cell]), and a query's score is
    dot(q, centroid[cell]) + sum_j tab[j][code_j] — the centroid term
    recovers the coarse geometry the residual codes no longer carry, so
    quantization error is bounded by the CELL radius, not the corpus
    radius. Same scan shape as ivfpq_topk (cell-pruned, m bytes/row);
    the base term adds one dot against a plan literal per candidate.
    Engine-exact: the base is added to the ADC sum AFTER the j-ordered
    fold (FP addition is commutative, so `sum + base` == the oracle's
    `base + sum` bit-for-bit)."""
    from .similarity import _best_cell

    spark = corpus.sparkSession
    if centroids is None:
        # ONE action seeds both quantizers AND the query batch (r09):
        # centroids are a prefix of the same md5-ordered sample the
        # residual codebooks train on (residuals computed on the
        # collected rows locally), and the query rows ride the union
        sample, q_rows = _sample_and_query_rows(
            corpus, queries, vec_col, id_col, query_id_col,
            max(n_cells, n_codes))
        cents = sample[:n_cells]
        rcbs = residual_codebooks_local(sample[:n_codes], cents, m,
                                        round_to)
    else:
        cents = centroids
        rcbs = residual_codebooks(corpus, vec_col, id_col, cents, m,
                                  n_codes, round_to)
        q_rows = _collect_query_rows(queries, vec_col, query_id_col)
    cent_sql = double_matrix_sql(cents)
    pairs = _probe_pairs_local(q_rows, cents, n_probe, round_to)
    qv_by_id = dict(q_rows)
    qprobe = spark.createDataFrame(
        [(qid, c, qv_by_id[qid]) for qid, c in pairs],
        "query_id long, cell int, qv array<double>")
    # same probe-cell prefilter as ivfpq_topk: residual encode (m x
    # n_codes affinity folds per row) runs on probed cells only
    probe_cells = sorted({c for _, c in pairs})
    with_cell = (corpus.select(
                     F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     _best_cell(qident(vec_col), cents, round_to)
                     .alias("cell"))
                 .filter(F.col("cell").isin(probe_cells)))
    # the residual rides as ITS OWN projected column: pq_code_expr's
    # unrolled form (r09) references its operand once per element, and a
    # multi-referenced non-cheap projection survives CollapseProject —
    # inlining the zip_with per term would re-evaluate it m*n_codes*sub
    # times per row
    resid = (f"zip_with(v, element_at({cent_sql}, cell + 1), "
             f"(x, c) -> CAST(x AS DOUBLE) - c)")
    enc = (with_cell.withColumn("_resid", F.expr(resid))
           .select("id", "cell",
                   pq_code_expr("_resid", rcbs, round_to).alias("codes")))
    qdf = _adc_tables_from_rows(spark, q_rows, rcbs)

    joined = enc.join(F.broadcast(qprobe.join(qdf, "query_id")), "cell")
    base = dot_sql("qv", f"element_at({cent_sql}, cell + 1)")
    return (_per_query_topk(
                joined.withColumn("score", _adc_score(round_to, base)), k)
            .select("query_id", "id", "score", "rank"))


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, vec_col: str,
                id_col: str, query_id_col: str, k: int = 5, m: int = 8,
                n_codes: int = 16, round_to: int = 6,
                codebooks: list[list[list[float]]] | None = None
                ) -> DataFrame:
    """Approximate top-k by ADC dot product: per query, a m x n_codes
    lookup table (query-subvector · codeword, built driver-side with the
    engine-exact fold) rides the broadcast; each corpus row costs m
    array lookups + m-1 adds. Returns (query_id, id, score, rank)."""
    if codebooks is None:
        # sample + query batch in ONE driver action (r09, guide §1.2)
        sample, q_rows = _sample_and_query_rows(
            corpus, queries, vec_col, id_col, query_id_col, n_codes)
        cbs = split_codebooks(sample, m)
    else:
        cbs = codebooks
        q_rows = _collect_query_rows(queries, vec_col, query_id_col)
    enc = pq_encode(corpus, vec_col, id_col, cbs, round_to)
    qdf = _adc_tables_from_rows(corpus.sparkSession, q_rows, cbs)
    joined = enc.crossJoin(F.broadcast(qdf))
    return (_per_query_topk(
                joined.withColumn("score", _adc_score(round_to)), k)
            .select("query_id", "id", "score", "rank"))
