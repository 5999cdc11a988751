"""Perceptual-hash tier (llmops/multimodal.py): expression-vs-Python
parity for the character-code aHash, the REAL PPM kernel, and the banded
Hamming join's recall-completeness guarantee (d < n_bands)."""

import random

from pyspark.sql import functions as F

from rassengine_spark.llmops import multimodal as MM


def test_ahash_expression_matches_python_twin(spark):
    texts = ["hello world this is a longer document about spark",
             "hello world this is a longer document about spark!",
             "short", "", None, "a", "naïve café ünïcode 中文 €",
             "x" * 200, "x" * 199 + "y"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, t string")
    got = {r.id: list(r.bands)
           for r in MM.with_ahash_bands(df, "t").collect()}
    for i, t in enumerate(texts):
        assert got[i] == MM.ahash_bands_py(t), (i, t)
    assert got[3] == [0, 0, 0, 0] and got[4] == [0, 0, 0, 0]
    # every band fits 16 bits
    for bands in got.values():
        assert all(0 <= b < (1 << 16) for b in bands)


def test_ahash_ppm_kernel(spark):
    def ppm(w, h, rgb):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)

    # half-dark half-bright image: bright half's bits set, dark half's not
    half = (b"P6\n8 8\n255\n"
            + bytes((0, 0, 0)) * 32 + bytes((200, 200, 200)) * 32)
    media = spark.createDataFrame(
        [("u", "image", bytearray(ppm(16, 16, (5, 5, 5))), 0, "x"),
         ("h", "image", bytearray(half), 0, "y"),
         ("bad", "image", bytearray(b"nope"), 4, "z")],
        "media_id string, media_type string, content binary, "
        "n_bytes long, sha256 string")
    rows = {r.media_id: (list(r.bands) if r.bands is not None else None)
            for r in MM.ahash_ppm_bands(media).collect()}
    # uniform image: every v*64 == total -> all bits set
    assert rows["u"] == [0xFFFF] * 4
    # half image: exactly the bright rows' 32 bits set
    assert sum(bin(b).count("1") for b in rows["h"]) == 32
    assert rows["bad"] is None


def test_near_pairs_guarantee_vs_brute_force(spark):
    """Banded join must find EVERY pair with hamming <= 3 (pigeonhole:
    d < 4 bands) — compared against an exhaustive check over random
    64-bit hashes engineered to contain close pairs."""
    rng = random.Random(11)
    hashes = []
    for i in range(30):
        h = rng.getrandbits(64)
        hashes.append(h)
        # a sibling within 0-3 flipped bits
        flips = rng.sample(range(64), rng.randint(0, 3))
        s = h
        for f in flips:
            s ^= 1 << f
        hashes.append(s)

    def bands_of(h):
        return [(h >> (16 * i)) & 0xFFFF for i in range(4)]

    rows = [(i, bands_of(h)) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "id long, bands array<bigint>")
    got = {(r.id_a, r.id_b): r.hamming
           for r in MM.ahash_near_pairs(df, "id",
                                        max_hamming=3).collect()}
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want


def test_near_pairs_hot_bucket_cap(spark):
    """max_bucket_size drops boilerplate (band_idx, band_value) buckets
    before the self-join (ADVICE r4: all-zero bands from empty payloads
    otherwise produce O(k²) hamming-0 pairs). The planted zero-band
    cohort pairs vanish under the cap; the genuine near pair — whose
    shared bands are NOT hot — survives with its exact distance."""
    zero = [0, 0, 0, 0]
    near_a = [7, 11, 13, 17]
    near_b = [7, 11, 13, 16]               # hamming 1 (band 3: 17^16)
    rows = [(i, zero) for i in range(10)]
    rows += [(100, near_a), (101, near_b)]
    df = spark.createDataFrame(rows, "id long, bands array<bigint>")
    capped = {(r.id_a, r.id_b): r.hamming
              for r in MM.ahash_near_pairs(
                  df, "id", max_hamming=3, max_bucket_size=5).collect()}
    assert capped == {(100, 101): 1}
    full = {(r.id_a, r.id_b)
            for r in MM.ahash_near_pairs(df, "id", max_hamming=3).collect()}
    assert len(full) == 45 + 1              # C(10,2) zero pairs + the near


def test_near_pairs_end_to_end_on_text(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4),
         (2, "the quick brown fox jumps over the lazy dog " * 4),
         (3, "completely different content about financial markets " * 4)],
        "id long, t string")
    hashed = MM.with_ahash_bands(df, "t")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in MM.ahash_near_pairs(hashed, "id").collect()}
    assert pairs.get((1, 2)) == 0          # identical docs: distance 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_brightness_invariant_structure_sensitive(spark):
    """The DCT hash's reason to exist beside aHash: a uniform code-point
    shift (brightness) leaves the hash IDENTICAL (only the DC
    coefficient moves and it never crosses the AC median comparisons in
    these fixtures), while structural scrambles move many bits."""
    t = "the quick brown fox jumps over the lazy dog " * 8
    up = "".join(chr(ord(c) + 1) for c in t)
    scrambled = t[::-1]
    h, hu, hs = (MM.phash_bands_py(x) for x in (t, up, scrambled))
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham(h, hu) == 0
    assert ham(h, hs) > 3
    assert MM.phash_bands_py(None) is None and MM.phash_bands_py("") is None


def test_with_phash_bands_matches_python_twin(spark):
    rows = [(1, "hello world " * 20), (2, "abc"), (3, None),
            (4, "日本語テキスト" * 30), (5, "𝔘nicode 𝖆stral " * 12)]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.bands for r in
           MM.with_phash_bands(df, "t").collect()}
    for i, t in rows:
        assert got[i] == MM.phash_bands_py(t), (i, t)


def test_incremental_ahash_pairs_store_vs_batch(spark, tmp_path):
    """Increment-vs-store pairs equal the corresponding cross pairs of a
    full-corpus ahash_near_pairs run; the store round-trips through
    parquet; NULL-band rows are excluded on both sides."""
    texts = {i: f"document number {i} with shared boilerplate " * 4
             for i in range(8)}
    texts[100] = texts[1]               # new batch: exact dup of old 1
    texts[101] = "Z" + texts[2][1:]     # near dup of old 2
    texts[102] = "totally unrelated content about volcanoes " * 4
    texts[103] = None                   # undecodable: excluded
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "id long, t string")
    old = df.filter(F.col("id") < 100)
    new = df.filter(F.col("id") >= 100)
    path = str(tmp_path / "store")
    MM.save_ahash_store(MM.with_ahash_bands(old, "t"), "id", path)
    store = spark.read.parquet(path)
    got = {(r.id_old, r.id_new): r.hamming
           for r in MM.incremental_ahash_pairs(
               store, MM.with_ahash_bands(new, "t"), "id").collect()}
    # reference: full-corpus pairs restricted to (old, new)
    full = {(r.id_a, r.id_b): r.hamming
            for r in MM.ahash_near_pairs(
                MM.with_ahash_bands(df, "t"), "id").collect()}
    want = {(a, b): h for (a, b), h in full.items()
            if a < 100 and b >= 100}
    assert got == want
    assert got[(1, 100)] == 0           # exact dup found at distance 0
    assert all(b != 103 for _, b in got)
