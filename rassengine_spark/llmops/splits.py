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


def mixture_resample(df: DataFrame, strata_col: str, key_col: str,
                     fractions: dict[str, float],
                     seed: str = "mix") -> DataFrame:
    """Domain-mixture resampling: keep a deterministic hash-fraction of each
    stratum (e.g. down-weight a dominant source to a target mixture).
    Strata absent from `fractions` are kept whole. Pure per-row predicate —
    fuses into the scan, no shuffle, reproducible on any engine."""
    u = hash60(F.concat(F.lit(seed + "/"), F.col(key_col).cast("string")))
    frac = u.cast("double") / F.lit(float(_HASH_SPACE))
    thresh: Column = F.lit(1.0)
    for name, f in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == name,
                        F.lit(float(f))).otherwise(thresh)
    return df.filter(frac < thresh)


def pack_sequences(df: DataFrame, key_col: str, tokens_col: str,
                   budget: int, shards: int = 32) -> DataFrame:
    """Assign documents to fixed-token-budget packs (context-window packing
    for LLM training), deterministically and in parallel.

    Documents are sharded by key hash, ordered by key inside each shard,
    and a running token total assigns pack ids: a document starts the next
    pack when the running total before it crosses a budget boundary
    (cumulative-sum packing — the scalable streaming-order variant of
    first-fit; packs can overflow by at most one document, they are never
    under-filled by fragmentation).

    Output: (key, shard, pack_id, n_tokens). One shuffle on the shard key;
    each shard's window is independent, so 1000 executors pack 1000+ shards
    concurrently regardless of corpus size."""
    from pyspark.sql.window import Window as _W

    shard = F.pmod(hash60(F.col("key").cast("string")), F.lit(shards))
    w = (_W.partitionBy("shard").orderBy(F.col("key").asc())
         .rowsBetween(_W.unboundedPreceding, -1))
    out = (df.select(F.col(key_col).alias("key"),
                     F.col(tokens_col).alias("n_tokens"))
             .withColumn("shard", shard)
             .withColumn("_cum_before",
                         F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
             .withColumn("pack_id",
                         F.floor(F.col("_cum_before") / F.lit(budget))))
    return out.select("key", "shard", "pack_id", "n_tokens")


def length_bucket_batches(df: DataFrame, key_col: str, tokens_col: str,
                          bucket_width: int = 64, batch_size: int = 8,
                          shards: int = 16) -> DataFrame:
    """Length-bucketed batch assembly: group sequences of similar token
    length into fixed-size training batches so each batch pads to its own
    max instead of the corpus max — the standard padding-waste reducer
    for variable-length training (bucketed batching; e.g. the public
    fairseq/tensor2tensor input pipelines).

    bucket = n_tokens div bucket_width; inside each (shard, bucket) the
    sequences order by md5(key) (deterministic, repartition-stable) and
    consecutive runs of `batch_size` form a batch. Returns one row per
    batch: (shard, bucket, batch_id, n_seqs, max_tokens, sum_tokens,
    padding) with padding = n_seqs * max_tokens - sum_tokens — all exact
    integer arithmetic.

    Scale shape is pack_sequences': shard FIRST by key hash, so the
    per-(shard, bucket) window is partition-local and 1000 executors fill
    1000+ independent windows — no global sort, and a skewed length
    bucket (real corpora pile up at the truncation length) splits across
    all shards instead of landing on one task."""
    key = F.md5(F.col(key_col).cast("string"))
    d = df.select(
        F.col(key_col).alias("key"),
        F.col(tokens_col).alias("n_tokens"),
        key.alias("_k"),
        F.pmod(hash60(F.col(key_col).cast("string")),
               F.lit(shards)).cast("int").alias("shard"),
        F.floor(F.col(tokens_col) / bucket_width).cast("int")
         .alias("bucket"))
    w = Window.partitionBy("shard", "bucket").orderBy("_k", "key")
    batched = d.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"))
    return (batched.groupBy("shard", "bucket", "batch_id")
            .agg(F.count(F.lit(1)).alias("n_seqs"),
                 F.max("n_tokens").alias("max_tokens"),
                 F.sum("n_tokens").alias("sum_tokens"))
            .withColumn("padding",
                        F.col("n_seqs") * F.col("max_tokens")
                        - F.col("sum_tokens")))


def with_split_leakage_safe(df: DataFrame, key_col: str, text_col: str,
                            weights: dict[str, float] | None = None,
                            seed: str = "split",
                            near_dup_threshold: float = 0.5) -> DataFrame:
    """`with_split`, but near-duplicate documents ALWAYS land in the same
    split: the hash key is the duplicate-CLUSTER root (min id of the
    MinHash-LSH connected component), falling back to the doc's own id
    for unclustered docs.

    Why: hashing raw doc ids puts two near-identical documents in train
    and test with probability 2·p·(1-p) each — the classic eval-leakage
    bug that inflates benchmark scores. Keying the split on the cluster
    root removes it by construction; dedup can then keep or drop
    non-keepers independently of the split decision.

    Cost: the LSH pair pass + component resolution (the same machinery
    `dedup.dup_clusters` runs) + one join of the (small) cluster map back
    onto the corpus."""
    from .dedup import dup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, text_col, key_col,
                              threshold=near_dup_threshold)
    roots = (dup_clusters(pairs)
             .select(F.col("node").alias(key_col),
                     F.col("root").alias("_root")))
    keyed = (df.join(roots, key_col, "left")
               .withColumn("_skey", F.coalesce(F.col("_root"),
                                               F.col(key_col))))
    out = keyed.withColumn(
        "split", split_assign(F.col("_skey"),
                              weights or {"train": 0.98, "val": 0.01,
                                          "test": 0.01}, seed))
    return out.drop("_root", "_skey")


def temperature_fractions(df: DataFrame, strata_col: str,
                          alpha: float = 0.3,
                          max_fraction: float = 1.0) -> dict[str, float]:
    """Per-stratum keep-fractions that rebalance the observed mixture
    toward p_i^alpha / sum(p_j^alpha) — the standard temperature-sampling
    rule for multilingual/multi-domain corpora (alpha=1 keeps the natural
    mixture, alpha->0 approaches uniform). Feed the result straight into
    `mixture_resample`.

    Fractions are scaled so the LARGEST required up-weight hits
    `max_fraction` (hash-fraction sampling can only keep <= 100% of a
    stratum — true up-sampling needs repetition, which is an epochs
    decision, not an engine one); every other stratum keeps
    proportionally less. One count job over the stratum column."""
    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).count().collect()}
    total = sum(counts.values())
    if total == 0:
        return {}
    target = {s: (c / total) ** alpha for s, c in counts.items()}
    tsum = sum(target.values())
    # keep_i proportional to target share / observed share
    raw = {s: (target[s] / tsum) / (counts[s] / total) for s in counts}
    peak = max(raw.values())
    return {s: min(max_fraction, max_fraction * r / peak)
            for s, r in sorted(raw.items())}


def token_budget_take(df: DataFrame, score_col: str, tokens_col: str,
                      id_col: str, budget: int, lo: float, hi: float,
                      bins: int = 1000) -> DataFrame:
    """Quality-ordered token-budget curation: keep the best-scored docs
    (score desc, id asc) whose running token total stays <= `budget` —
    "give me the best N tokens", the selection step of perplexity-filtered
    pretraining mixes (CCNet-style; compose with bigram_lm_score).

    Semantically identical to one global ORDER BY + running sum, but that
    is a single-partition window at 100 TB. Two phases instead:
    (1) bucket scores into `bins` monotone bins ([lo, hi] scaled; outside
        values clamp to the edge bins), aggregate per-bin token totals,
        and compute each bin's tokens-above with one tiny window over
        <= `bins` rows;
    (2) per-doc running totals window-partition BY BIN — each partition
        is one score band, so parallelism is `bins`-wide and no partition
        sees the whole corpus. Binning is an implementation detail: any
        monotone binning yields exactly the global-order result because
        within-bin ordering matches the global tie-break.
    Precondition: `score_col` non-null (filter unscored docs first).
    Implemented as the single-stratum case of mixture_token_budget_take
    (one shared pipeline — fixes apply to both)."""
    tmp = "__tbt_stratum"
    if tmp in df.columns:     # don't silently clobber a caller column
        raise ValueError(f"input already has a {tmp!r} column")
    return (mixture_token_budget_take(
        df.withColumn(tmp, F.lit("all")), tmp, score_col,
        tokens_col, id_col, {"all": int(budget)}, lo, hi, bins)
        .drop(tmp))


def mixture_token_budget_take(df: DataFrame, strata_col: str,
                              score_col: str, tokens_col: str, id_col: str,
                              budgets: dict[str, int], lo: float, hi: float,
                              bins: int = 1000) -> DataFrame:
    """Per-domain token_budget_take: each stratum independently keeps its
    best-scored docs until ITS token budget — the mixture-assembly step
    (domain weights x total budget -> per-domain budgets -> curated mix).
    Strata absent from `budgets` are dropped. Same two-phase bin-cumsum
    as token_budget_take with every window additionally partitioned by
    the stratum, so parallelism is strata x bins and no global window
    exists."""
    span = float(hi) - float(lo)
    raw_bin = F.floor((F.col(score_col) - F.lit(float(lo)))
                      / F.lit(span) * F.lit(bins))
    b = F.least(F.greatest(raw_bin, F.lit(0)),
                F.lit(bins - 1)).cast("int")
    d = (df.filter(F.col(strata_col).isin(list(budgets)))
           .withColumn("_bin", b))
    per_bin = d.groupBy(strata_col, "_bin").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_bt"))
    wb = (Window.partitionBy(strata_col).orderBy(F.col("_bin").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    above = per_bin.withColumn(
        "_above", F.coalesce(F.sum("_bt").over(wb), F.lit(0)))
    d2 = d.join(F.broadcast(above.select(strata_col, "_bin", "_above")),
                [strata_col, "_bin"])
    win = (Window.partitionBy(strata_col, "_bin")
           .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
           .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.col("_above") + F.sum(F.col(tokens_col).cast("long")).over(win)
    budget = F.element_at(
        F.create_map(*[x for s, n in sorted(budgets.items())
                       for x in (F.lit(s), F.lit(int(n)))]),
        F.col(strata_col))
    return (d2.withColumn("_cum", cum)
              .filter(F.col("_cum") <= budget)
              .drop("_bin", "_above", "_cum"))


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int) -> DataFrame:
    """Deterministic training order for one epoch: `pos` = dense global
    rank of md5(id || '#e<epoch>') — a different, reproducible permutation
    per epoch, stable under repartitioning (what a seeded rand() is not).

    A global ORDER BY is a single-partition sort at 100 TB. Instead the
    md5 hex key is RANGE-bucketed by its first byte (256 ordered shards,
    so (shard, key) order IS the global key order), per-shard ranks come
    from a partition-local window, and shard offsets from one cumsum over
    a <=256-row aggregate — the token_budget_take two-phase shape.
    Returns (id, shard, pos) with pos dense 0..N-1."""
    key = F.md5(F.concat(F.col(id_col).cast("string"),
                         F.lit(f"#e{epoch}")))
    shard = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
    d = df.select(F.col(id_col).alias("id"), key.alias("_k"),
                  shard.alias("shard"))
    counts = d.groupBy("shard").agg(F.count(F.lit(1)).alias("_c"))
    woff = (Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(woff), F.lit(0)))
    win = Window.partitionBy("shard").orderBy("_k", "id")
    return (d.join(F.broadcast(offs.select("shard", "_off")), "shard")
            .withColumn("pos",
                        F.row_number().over(win) - 1 + F.col("_off"))
            .select("id", "shard", "pos"))


def curriculum_order(df: DataFrame, id_col: str, difficulty_col: str,
                     epoch: int = 0) -> DataFrame:
    """(id, difficulty, step): dense global training order for curriculum
    learning (Bengio et al. 2009, public technique) — easy examples
    first, hard ones later, with a deterministic reproducible shuffle
    WITHIN each difficulty level (md5(id#e<epoch>), the epoch_shuffle
    key, so each epoch re-shuffles within levels while the easy->hard
    pacing is preserved).

    `difficulty_col` is a modest-cardinality integer level (bucket
    upstream — e.g. least(7, n_tokens div 32); a continuous score would
    make the offset table corpus-sized). step = dense rank under
    (difficulty, md5key, id).

    Scale: a global ORDER BY is a single-partition sort at 100 TB —
    this is epoch_shuffle's two-phase shape keyed one level up: ranks
    are partition-local windows per (difficulty, md5-byte shard) and the
    global offsets come from one cumsum over a <= levels x 256-row
    aggregate. Repartition-invariant, engine-exact."""
    key = F.md5(F.concat(F.col(id_col).cast("string"),
                         F.lit(f"#e{epoch}")))
    shard = F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
    d = df.select(F.col(id_col).alias("id"),
                  F.col(difficulty_col).cast("long").alias("difficulty"),
                  key.alias("_k"), shard.alias("shard"))
    counts = d.groupBy("difficulty", "shard") \
              .agg(F.count(F.lit(1)).alias("_c"))
    woff = (Window.orderBy("difficulty", "shard")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(woff), F.lit(0)))
    win = Window.partitionBy("difficulty", "shard").orderBy("_k", "id")
    return (d.join(F.broadcast(offs.select("difficulty", "shard", "_off")),
                   ["difficulty", "shard"])
            .withColumn("step",
                        F.row_number().over(win) - 1 + F.col("_off"))
            .select("id", "difficulty", "step"))


def _quantile_thresholds(hist: DataFrame, group_col: str, score_col: str,
                         drop_ppm: int) -> DataFrame:
    """Per-group drop thresholds from a (group, score, cnt) histogram:
    (group, n_docs, k_drop, threshold_score, drop_at_threshold) where
    k_drop = n*ppm//1e6 rows must go, threshold_score t is the score
    whose cumulative count first exceeds k, and drop_at_threshold r is
    how many rows AT t still drop (ties there break by id downstream).
    Shared by the inline filter and the persisted-histogram tier so
    their semantics cannot drift. The window runs over each group's
    DISTINCT scores — the histogram, never the corpus."""
    wcum = (Window.partitionBy(group_col).orderBy(score_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h = hist.withColumn("_cum", F.sum("cnt").over(wcum))
    totals = (hist.groupBy(group_col)
              .agg(F.sum("cnt").alias("n_docs"))
              .withColumn("k_drop",
                          F.expr(f"n_docs * {int(drop_ppm)}"
                                 " div 1000000"))
              .withColumnRenamed(group_col, "_tg"))
    # null-SAFE join: a NULL group is a group like any other (the
    # rank-window spec partitions on it), so it must not fall out here
    return (h.join(totals, F.col(group_col).eqNullSafe(F.col("_tg")))
            .drop("_tg")
            .filter((F.col("_cum") > F.col("k_drop"))
                    & (F.col("_cum") - F.col("cnt") <= F.col("k_drop")))
            .select(group_col, "n_docs", "k_drop",
                    F.col(score_col).alias("threshold_score"),
                    (F.col("k_drop") - (F.col("_cum") - F.col("cnt")))
                    .alias("drop_at_threshold")))


def score_histogram(df: DataFrame, score_col: str,
                    group_col: str) -> DataFrame:
    """(group, score, cnt) — the additive unit of the persisted
    threshold tier (counts over disjoint row sets sum to the union's)."""
    return (df.groupBy(group_col, score_col)
            .agg(F.count(F.lit(1)).alias("cnt")))


def save_score_hist(df: DataFrame, score_col: str, group_col: str,
                    path: str, buckets: int = 32) -> None:
    """Persist the per-group score histogram as a manifest-committed LSM
    counter store (llmops/counter_store.py) — fold new batches with
    ``append_score_hist``, serve exact per-group percentile thresholds
    any time with ``quantile_thresholds_from_store`` without rescanning
    a single historical row."""
    from .counter_store import save_counters

    save_counters(score_histogram(df, score_col, group_col),
                  [group_col, score_col], path, buckets=buckets,
                  extra={"score_col": score_col, "group_col": group_col})


def append_score_hist(new_df: DataFrame, path: str,
                      delta_name: str | None = None) -> None:
    """Fold NEW rows' histogram in as one O(batch) delta (counter_store
    naming/replay contract; new-rows-only, single writer)."""
    from .counter_store import append_counters, load_counter_manifest

    m = load_counter_manifest(path)
    append_counters(score_histogram(new_df, m["score_col"],
                                    m["group_col"]),
                    path, delta_name=delta_name)


def quantile_thresholds_from_store(spark, path: str,
                                   drop_ppm: int = 250_000) -> DataFrame:
    """Exact per-group percentile thresholds served from the PERSISTED
    histogram — identical to _quantile_thresholds over the full corpus
    ever folded, at the cost of one counter-store scan."""
    from .counter_store import load_counter_manifest, read_counters

    m = load_counter_manifest(path)
    return _quantile_thresholds(read_counters(spark, path),
                                m["group_col"], m["score_col"], drop_ppm)


def drop_bottom_quantile(df: DataFrame, score_col: str, id_col: str,
                         group_col: str,
                         drop_ppm: int = 250_000) -> DataFrame:
    """Exact per-group percentile curation: drop each group's lowest
    ``drop_ppm`` parts-per-million of rows by (score asc, id asc) — e.g.
    "drop the worst-scored 25% of every language" (the percentile form
    of CCNet's perplexity cut; compose with bigram_lm_score or the
    quality composite). The drop count is exact integer arithmetic
    (k = n * drop_ppm // 1e6), engine-identical; ties at the threshold
    score break by id, so the kept set is a pure function of the data.

    Semantically one rank window per group, but that windows the whole
    corpus at 100 TB. Instead: (1) one (group, score) histogram
    aggregate + a cumsum window over each group's DISTINCT scores (the
    histogram, not the corpus — integer scores keep it bounded) finds
    each group's threshold score t and the residue r of rows to drop AT
    t; (2) the ≤|groups|-row threshold table broadcasts back; rows above
    t pass with a scan-level filter, and only the boundary rows (score
    == t) pay a per-group id window. Precondition: ``score_col``
    non-null (filter unscored rows first). A NULL group is a group like
    any other (null-safe joins throughout — matching the rank-window
    spec, which partitions on it)."""
    s = F.col(score_col)
    th = (_quantile_thresholds(score_histogram(df, score_col, group_col),
                               group_col, score_col, drop_ppm)
          .select(F.col(group_col).alias("_bg"),
                  F.col("threshold_score").alias("_t"),
                  F.col("drop_at_threshold").alias("_r")))
    joined = (df.join(F.broadcast(th),
                      F.col(group_col).eqNullSafe(F.col("_bg")))
              .drop("_bg"))
    kept_hi = joined.filter(s > F.col("_t"))
    at_t = joined.filter(s == F.col("_t"))
    wid = Window.partitionBy(group_col).orderBy(id_col)
    at_t_kept = (at_t.withColumn("_rn", F.row_number().over(wid))
                 .filter(F.col("_rn") > F.col("_r")).drop("_rn"))
    return (kept_hi.unionByName(at_t_kept)
            .drop("_t", "_r").select(*df.columns))


def weighted_sample_take(df: DataFrame, weight_col: str, key_col: str,
                         k: int, seed: str = "ws0",
                         round_to: int = 6) -> DataFrame:
    """Weighted sample WITHOUT replacement of k rows — the
    Efraimidis-Spirakis exponential race (2006, public algorithm), the
    standard one-pass distributed weighted sampler:

        u    = (hash60(seed/key) + 1) / 2^60        in (0, 1]
        race = -ln(u) / w                           Exp(w) arrival time
        keep the k SMALLEST race keys

    Each row's arrival is an exponential with rate = its weight, so
    inclusion probability is proportional-to-size without any global
    weight total — no pre-pass, no normalization shuffle. Deterministic
    (hash-race, not RNG): re-runs and the DuckDB oracle reproduce the
    exact sample.

    Plan at 100 TB: one scan + TakeOrderedAndProject (per-partition
    top-k, then a k-row reduce on one node) — the same physical shape
    as every top-k entry, no full sort, no window. Rows with
    non-positive or null weights never win (filtered: a zero-weight row
    has infinite arrival time).

    Output: (key_col, weight_col, race) ascending by construction;
    race is rounded for oracle comparison AFTER the top-k decision."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key_col).cast("string")
    u = ((hash60(F.concat(F.lit(seed + "/"), key)).cast("double") + 1.0)
         / float(_HASH_SPACE))
    w = F.col(weight_col).cast("double")
    race = -F.log(u) / w
    return (df.filter(w > 0.0)
              .select(key_col, weight_col, race.alias("_race"))
              .orderBy("_race", key_col)
              .limit(k)
              .select(key_col, weight_col,
                      F.round(F.col("_race"), round_to).alias("race")))
