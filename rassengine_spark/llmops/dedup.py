"""Corpus-scale deduplication operators for training-data pipelines.

Five fidelity/cost tiers, all pure DataFrame ops designed for 100 TB:

- exact            — hash-groupBy; one shuffle on the hash, map-side partial agg
- minhash + LSH    — shingle -> K salted-md5 minhashes -> B bands -> bucket
                     join; candidate pairs only form inside identical band
                     buckets, so the O(n^2) blowup is bounded by bucket sizes
- simhash          — 32-bit sign-of-weighted-sum fingerprint; near-dups have
                     small Hamming distance (block on bit-prefix at scale)
- n-gram Jaccard   — exact pairwise verification inside blocks (the
                     verify step after LSH candidate generation)
- embedding cosine — near-dup by semantic similarity inside blocks

Hashing uses md5 (salted per hash index) converted to a 60-bit integer via
conv(hex) — chosen over murmur/xxhash because md5 is available bit-identically
in every engine (Spark, DuckDB, Python), keeping oracles exact.

All expressions are built-ins (transform/aggregate/array_*); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine
from ..sources.chunker import words_of

# 60-bit hash from a salted md5 — bit-identical across engines
def hash60(col: Column, salt: int | None = None) -> Column:
    c = col if salt is None else F.concat(col, F.lit(f"#{salt}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------- exact
def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical values: (content hash, dup_count, keeper_id).
    Keeper = min id (deterministic). Scale: single hash-shuffle with
    map-side combine; the hash (not the payload) is the shuffle key."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
              .agg(F.count(F.lit(1)).alias("dup_count"),
                   F.min(F.col(id_col)).alias("keeper_id"))
              .filter(F.col("dup_count") > 1))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct value of text_col."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


# ---------------------------------------------------------------- shingles
def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; texts shorter than n words collapse to
    a single whole-text shingle (guarded — Spark's sequence() would run
    backwards on negative lengths)."""
    w = words_of(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    return F.when(F.size(w) >= n, F.array_distinct(grams)) \
            .otherwise(F.array(F.array_join(w, " ")))


# ---------------------------------------------------------------- minhash
def _salted_hasher(i: int):
    # single-parameter closure: a two-parameter lambda would make
    # F.transform pass the ARRAY INDEX as the second argument
    return lambda s: hash60(s, i)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """K-wide minhash signature: sig[i] = min over shingles of the i-salted
    60-bit hash. Per-row expression — zero shuffle at any scale."""
    sigs = [F.array_min(F.transform(shingles, _salted_hasher(i)))
            for i in range(num_hashes)]
    return F.array(*sigs)


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: md5 over each band's rows -> array<string> of length B."""
    keys = [F.md5(F.concat_ws(
        ",", *[F.element_at(sig, b * rows + r + 1).cast("string")
               for r in range(rows)])) for b in range(bands)]
    return F.array(*keys)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter).cast("double")


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      shingle_n: int = 3, num_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.5,
                      round_to: int = 6) -> DataFrame:
    """Near-duplicate pairs via minhash-LSH: candidates collide in >=1 band
    bucket, then exact shingle-Jaccard >= threshold verifies.

    Scale path: the only shuffle keys on (band_idx, band_key); identical
    pairs found in multiple bands are deduped with groupBy on (id_a, id_b).
    At 100 TB, bucket skew (boilerplate text) is handled by AQE skew-join
    and/or dropping buckets above a size cap (frequent-shingle stopwording).
    """
    rows = num_hashes // bands
    base = (df.select(F.col(id_col).alias("id"),
                      word_shingles(F.col(text_col), shingle_n).alias("sh"))
              .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
              .withColumn("bk", band_keys(F.col("sig"), bands, rows))
              .select("id", "sh", F.posexplode("bk").alias("band", "key")))
    left = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                       "band", "key")
    right = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                        "band", "key")
    cand = (left.join(right, ["band", "key"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", "sh_a", "sh_b")
                .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn(
                "jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")),
                                   round_to))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------- simhash
def simhash32(col: Column) -> Column:
    """32-bit simhash over distinct tokens: bit j is set when the sum of
    (+1/-1) contributions of token-hash bit j is positive.

    Per-row expression; at scale, near-dup candidates are blocked on a
    bit-prefix of the fingerprint and verified by Hamming distance
    (hamming32 below)."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""))
    hs = F.transform(toks, lambda t: hash60(t))
    bits = [
        F.when(
            F.aggregate(
                hs, F.lit(0).cast("bigint"),
                lambda acc, h: acc + F.when(
                    h.bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1),
            ) > 0, F.lit(1 << j)).otherwise(0)
        for j in range(32)
    ]
    out = F.lit(0).cast("bigint")
    for b in bits:
        out = out + b
    return out


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_fingerprints(df: DataFrame, text_col: str,
                         id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"),
                     simhash32(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 3,
                       prefix_bits: int = 8) -> DataFrame:
    """Near-dup pairs: block on the top `prefix_bits` of the fingerprint,
    verify Hamming <= max_hamming inside blocks. (A full implementation
    rotates the fingerprint to cover all bit positions; one rotation is
    enough to demonstrate the plan shape.)"""
    fp = simhash_fingerprints(df, text_col, id_col)
    block = (F.shiftright(F.col("simhash"), 32 - prefix_bits)).alias("block")
    b = fp.select("id", "simhash", block)
    left = b.select(F.col("id").alias("id_a"),
                    F.col("simhash").alias("sh_a"), "block")
    right = b.select(F.col("id").alias("id_b"),
                     F.col("simhash").alias("sh_b"), "block")
    return (left.join(right, "block")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("hamming", hamming32(F.col("sh_a"), F.col("sh_b")))
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        block_col: str, n: int = 2, threshold: float = 0.2,
                        round_to: int = 6) -> DataFrame:
    """Exact pairwise word-n-gram Jaccard within blocks (e.g. language).
    Blocking bounds the quadratic pair space; at 100 TB the block must come
    from LSH or metadata, never a full cross join."""
    base = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
                     word_shingles(F.col(text_col), n).alias("sh"))
    left = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                       "blk")
    right = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                        "blk")
    return (left.join(right, "blk")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("jaccard",
                            F.round(jaccard(F.col("sh_a"), F.col("sh_b")),
                                    round_to))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------- embedding
def embedding_near_pairs_topn(df: DataFrame, vec_col: str, id_col: str,
                              block_col: str, top_n: int = 20,
                              round_to: int = 6) -> DataFrame:
    """Top-N most-similar pairs by cosine (dot of normalized vectors is
    assumed; we compute raw cosine) within blocks. Blocked self-join keeps
    the pair space linear-ish; the global top-N is TakeOrderedAndProject."""
    base = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
                     F.col(vec_col).alias("v"))
    left = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                       "blk")
    right = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        "blk")
    return (left.join(right, "blk")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cos", F.round(cosine(F.col("v_a"),
                                                  F.col("v_b")), round_to))
                .orderBy(F.col("cos").desc(), F.col("id_a").asc(),
                         F.col("id_b").asc())
                .limit(top_n)
                .select("id_a", "id_b", "cos"))
