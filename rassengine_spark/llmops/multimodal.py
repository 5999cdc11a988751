"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode/feature-extract kernels are STUBS (image/audio libraries are not
in this container): `decode_stub` derives deterministic fake features from
the bytes so the Spark-side plumbing — schema, batch shape, partitioning —
is real and testable. Swap `_fake_decode` for a PIL/librosa kernel in
production; nothing else changes.

Scale notes: mapInPandas streams Arrow record batches (bounded memory per
executor regardless of blob sizes); metadata-only ops stay as pure Column
expressions so pruning works (reading (id, n_bytes) must not fetch blobs —
parquet column pruning gives that for free).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),    # image|audio|video
    StructField("content", BinaryType(), True),       # opaque bytes
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("width", IntegerType(), True),        # fake-decoded
    StructField("height", IntegerType(), True),
    StructField("first_byte", IntegerType(), True),
])


def to_media_table(df: DataFrame, id_col: str, payload_col: str,
                   media_type: str = "image") -> DataFrame:
    """Wrap an arbitrary payload column as an opaque media table with
    expression-level metadata (no decode needed — stays codegen-side)."""
    blob = F.encode(F.col(payload_col).cast("string"), "UTF-8")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        blob.alias("content"),
        F.length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"))


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: pseudo width/height from
    the byte content. Replace with a real decoder (PIL etc.) in production;
    raise NotImplementedError there if the codec is unsupported."""
    if not content:
        return 0, 0, -1
    w = 16 + (len(content) % 64)
    h = 16 + (content[0] % 64)
    return w, h, content[0]


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over the media table producing
    FEATURE_SCHEMA rows. One output row per input row; blobs never leave
    the executor."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            feats = [_fake_decode(c if c is not None else b"")
                     for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "first_byte": [f[2] for f in feats],
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),
    StructField("out_w", IntegerType(), True),
    StructField("out_h", IntegerType(), True),
    StructField("n_bytes_out", LongType(), True),
    StructField("content", BinaryType(), True),       # fake-resized blob
])


def resize_images(media: DataFrame, out_w: int = 64,
                  out_h: int = 64) -> DataFrame:
    """STUB resize (the real kernel would be PIL/`cv2.resize` inside the same
    batch loop): deterministically truncate the blob to out_w*out_h bytes so
    the pipeline shape — binary in, binary out, bounded output size — is
    real. One output row per input row; blob stays executor-side.

    Mirrors the reference's upload pipeline having a per-file transform step
    (reference app/embedding_gen.py:1285-1369 stores originals; a media
    variant would store thumbnails next to them). At 100 TB: mapInPandas
    streams Arrow batches, so peak executor memory is one batch of blobs,
    not one partition; cap `spark.sql.files.maxPartitionBytes` so a batch
    of decoded frames fits."""
    cap = out_w * out_h

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            blobs = [(c or b"")[:cap] for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "out_w": out_w,
                "out_h": out_h,
                "n_bytes_out": [len(b) for b in blobs],
                "content": blobs,
            })

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_sha", StringType(), False),
    StructField("frame_bytes", BinaryType(), True),
])


def sample_frames(media: DataFrame, frame_ms: int = 40,
                  max_frames: int = 4) -> DataFrame:
    """STUB video frame sampler: fan out 1 row per sampled frame via
    mapInPandas (a real decoder — pyav/ffmpeg — would yield the same shape).
    Frame count is a deterministic function of blob size
    (1 + n_bytes % max_frames), frame id = md5("{media_id}:{idx}"), and
    frame_bytes is a strided slice of the blob, so everything except the
    slice is SQL-reproducible for the oracle.

    Row fan-out happens inside the Arrow batch (vectorized explode), not on
    the driver; downstream per-frame work repartitions naturally on the
    exploded rows."""
    import hashlib

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            ids, idxs, tss, shas, fbs = [], [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                blob = c or b""
                n = 1 + len(blob) % max_frames
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * frame_ms)
                    shas.append(hashlib.md5(
                        f"{mid}:{i}".encode()).hexdigest())
                    fbs.append(blob[i::n])
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": idxs, "ts_ms": tss,
                "frame_sha": shas, "frame_bytes": fbs,
            })

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# ------------------------------------------------------------------ REAL
# kernels for formats decodable with numpy alone (no image/audio libs):
# 16-bit PCM audio and binary PPM (P6) images. Compressed formats (JPEG/
# MP3/H.264) still need the library-backed kernels stubbed above — these
# prove the pipeline end-to-end with genuine decode math. Undecodable
# payloads yield null features + a decode_error string (batch jobs want
# quarantinable rows, not a poisoned task).

AUDIO_FEATURE_SCHEMA = ("media_id string, n_samples long, duration_ms long, "
                        "rms double, peak int, zero_crossings long, "
                        "decode_error string")


def audio_features_pcm16(media: DataFrame,
                         sample_rate: int = 16000) -> DataFrame:
    """REAL audio decode for 16-bit little-endian PCM payloads: per clip
    (n_samples, duration_ms, rms, peak, zero_crossings). One Arrow batch
    pass; blobs never leave the executor."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_samples", "duration_ms",
                                    "rms", "peak", "zero_crossings",
                                    "decode_error")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rows["media_id"].append(mid)
                blob = bytes(c) if c is not None else b""
                if len(blob) == 0 or len(blob) % 2 != 0:
                    for k in ("n_samples", "duration_ms", "rms", "peak",
                              "zero_crossings"):
                        rows[k].append(None)
                    rows["decode_error"].append("not 16-bit PCM")
                    continue
                x = np.frombuffer(blob, dtype="<i2").astype(np.float64)
                n = len(x)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(int(n * 1000 // sample_rate))
                rows["rms"].append(float(np.sqrt(np.mean(x * x))))
                rows["peak"].append(int(np.max(np.abs(x))))
                rows["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(x[1:])
                                         != np.signbit(x[:-1]))))
                rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def _decode_ppm(blob: bytes):
    """P6 PPM parser: returns (h, w, 3) uint8 array or raises ValueError."""
    import numpy as np
    if not blob.startswith(b"P6"):
        raise ValueError("not P6")
    parts, i = [], 2
    while len(parts) < 3:
        while i < len(blob) and blob[i:i + 1].isspace():
            i += 1
        if blob[i:i + 1] == b"#":          # comment to end-of-line
            while i < len(blob) and blob[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j:j + 1].isspace():
            j += 1
        parts.append(int(blob[i:j]))
        i = j
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255")
    i += 1                                  # single whitespace after header
    pix = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3)


def _encode_ppm(arr) -> bytes:
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


IMAGE_FEATURE_SCHEMA = ("media_id string, width int, height int, "
                        "mean_r double, mean_g double, mean_b double, "
                        "decode_error string")


def image_features_ppm(media: DataFrame) -> DataFrame:
    """REAL image decode for P6 PPM payloads: (width, height, per-channel
    means). Swap the parser for PIL and every other line stays."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            rows = {k: [] for k in ("media_id", "width", "height", "mean_r",
                                    "mean_g", "mean_b", "decode_error")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rows["media_id"].append(mid)
                try:
                    arr = _decode_ppm(bytes(c) if c is not None else b"")
                    rows["width"].append(int(arr.shape[1]))
                    rows["height"].append(int(arr.shape[0]))
                    m = arr.reshape(-1, 3).mean(axis=0)
                    rows["mean_r"].append(float(m[0]))
                    rows["mean_g"].append(float(m[1]))
                    rows["mean_b"].append(float(m[2]))
                    rows["decode_error"].append(None)
                except (ValueError, IndexError) as exc:
                    for k in ("width", "height", "mean_r", "mean_g",
                              "mean_b"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(exc))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def resize_images_ppm(media: DataFrame, out_w: int = 64,
                      out_h: int = 64) -> DataFrame:
    """REAL nearest-neighbor resize for P6 PPM payloads: binary in, binary
    out (re-encoded P6), same RESIZED_SCHEMA as the stub resize so
    downstream plumbing is shared. Undecodable rows pass through with
    null content."""
    import numpy as np

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            blobs, nbytes = [], []
            for c in pdf["content"]:
                try:
                    arr = _decode_ppm(bytes(c) if c is not None else b"")
                    ys = (np.arange(out_h) * arr.shape[0]) // out_h
                    xs = (np.arange(out_w) * arr.shape[1]) // out_w
                    out = _encode_ppm(np.ascontiguousarray(
                        arr[ys][:, xs]))
                    blobs.append(out)
                    nbytes.append(len(out))
                except (ValueError, IndexError):
                    blobs.append(None)
                    nbytes.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "out_w": out_w, "out_h": out_h,
                "n_bytes_out": nbytes, "content": blobs,
            })

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def _parse_wav(blob: bytes):
    """Minimal RIFF/WAVE parser for PCM16: returns (sample_rate,
    n_channels, pcm_bytes) or raises ValueError. Walks the chunk list
    (fmt / data can be preceded by LIST etc.), validates PCM16."""
    import struct
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (sz,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 wav")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)          # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, nch, data


def audio_features_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode for PCM16 .wav payloads: parses the RIFF
    container (sample rate comes from the file, not a parameter), then
    the same per-clip stats as `audio_features_pcm16`. Multi-channel
    clips interleave; stats run over all samples."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_samples", "duration_ms",
                                    "rms", "peak", "zero_crossings",
                                    "decode_error")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rows["media_id"].append(mid)
                try:
                    rate, nch, data = _parse_wav(
                        bytes(c) if c is not None else b"")
                    if len(data) == 0 or len(data) % 2 != 0:
                        raise ValueError("bad data chunk")
                    x = np.frombuffer(data, dtype="<i2").astype(np.float64)
                    n = len(x)
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(
                        int((n // max(nch, 1)) * 1000 // rate))
                    rows["rms"].append(float(np.sqrt(np.mean(x * x))))
                    rows["peak"].append(int(np.max(np.abs(x))))
                    rows["zero_crossings"].append(
                        int(np.count_nonzero(np.signbit(x[1:])
                                             != np.signbit(x[:-1]))))
                    rows["decode_error"].append(None)
                except ValueError as exc:
                    for k in ("n_samples", "duration_ms", "rms", "peak",
                              "zero_crossings"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(exc))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


# ------------------------------------------------ perceptual hash (aHash)
# The canonical crawl-pipeline image-dedup primitive this tier was
# missing: a 64-bit average hash per image and a banded Hamming join for
# near-duplicate pairs. Two sources produce the SAME band layout:
#   - ahash_ppm_bands: the REAL kernel over P6 PPM payloads (decode →
#     8x8 nearest-neighbor sample → r+g+b gray → threshold on the mean);
#   - ahash_bands_expr: the JVM-expression twin over the stub media
#     source (character-code "pixels" from the text payload) — pure
#     integer arithmetic, so the whole near-dup pipeline is
#     oracle-checkable end to end (Spark ascii == DuckDB unicode ==
#     Python ord, verified incl. astral code points; substring is
#     code-point-based on both engines).
# The mean threshold uses integer CROSS-MULTIPLICATION (v*64 >= total),
# never a float mean — bit-exact on any engine.

AHASH_BITS = 64


def _pack_ahash_bits(vals: list, n_bands: int) -> list:
    """64 sample values -> n_bands little-endian band ints (Python twin
    of the expression packing; shared by the PPM kernel and tests)."""
    total = sum(vals)
    bits = [1 if v * AHASH_BITS >= total else 0 for v in vals]
    per = AHASH_BITS // n_bands
    return [sum(bits[per * i + j] << j for j in range(per))
            for i in range(n_bands)]


def ahash_bands_expr(text_col: str, n_bands: int = 4):
    """array<bigint> of n_bands Hamming bands from character-code pixels:
    64 code points sampled at 1 + floor(k*len/64), bit_k set when
    c_k*64 >= sum(c). Built as HOFs over ONE materialized sample array
    (a 64-site flat projection would risk the codegen method-size
    limit — the ner_corpus lesson); empty/NULL text packs all-zero
    bands. Plan size is O(1) in the sample count."""
    per = AHASH_BITS // n_bands
    c = text_col
    cs = (f"transform(sequence(0, {AHASH_BITS - 1}), k -> "
          f"ascii(substring({c}, "
          f"1 + CAST(floor(k * length({c}) / {AHASH_BITS}) AS INT), 1)))")
    zero = f"array_repeat(CAST(0 AS BIGINT), {n_bands})"
    bands = (f"transform(sequence(0, {n_bands - 1}), i -> "
             f"aggregate(sequence(0, {per - 1}), CAST(0 AS BIGINT), "
             f"(a, j) -> a + CASE WHEN element_at(_cs, "
             f"CAST({per} * i + j + 1 AS INT)) * {AHASH_BITS} >= _tot "
             f"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) "
             f"END))")
    return cs, bands, zero


def with_ahash_bands(df: DataFrame, text_col: str, out_col: str = "bands",
                     n_bands: int = 4) -> DataFrame:
    """Attach the character-code aHash bands column (expression path)."""
    cs, bands, zero = ahash_bands_expr(text_col, n_bands)
    return (df.withColumn("_cs", F.expr(cs))
              .withColumn("_tot", F.expr(
                  "aggregate(_cs, CAST(0 AS BIGINT), (a, x) -> a + x)"))
              .withColumn(out_col, F.when(
                  F.coalesce(F.length(F.col(text_col)), F.lit(0)) > 0,
                  F.expr(bands)).otherwise(F.expr(zero)))
              .drop("_cs", "_tot"))


def ahash_bands_py(text: str | None, n_bands: int = 4) -> list:
    """Pure-Python twin of with_ahash_bands (parity-tested)."""
    t = text or ""
    n = len(t)
    if n == 0:
        return [0] * n_bands
    vals = [ord(t[(k * n) // AHASH_BITS]) for k in range(AHASH_BITS)]
    return _pack_ahash_bits(vals, n_bands)


def ahash_ppm_bands(media: DataFrame, n_bands: int = 4,
                    out_col: str = "bands") -> DataFrame:
    """REAL aHash over P6 PPM payloads: decode, sample an 8x8 grid
    (nearest neighbor, same index math as resize_images_ppm), gray =
    r+g+b (no division), threshold on the integer mean. Same band
    layout as the expression path, so ahash_near_pairs serves both.
    Undecodable rows get NULL bands (excluded from pairing)."""
    import numpy as np

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            ids, bandl = [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                ids.append(mid)
                try:
                    arr = _decode_ppm(bytes(c) if c is not None else b"")
                    g = 8
                    ys = (np.arange(g) * arr.shape[0]) // g
                    xs = (np.arange(g) * arr.shape[1]) // g
                    px = arr[ys][:, xs].astype(np.int64)
                    gray = px.sum(axis=2).reshape(-1).tolist()
                    bandl.append(_pack_ahash_bits(gray, n_bands))
                except (ValueError, IndexError):
                    bandl.append(None)
            yield pd.DataFrame({"media_id": ids,
                                out_col: pd.Series(bandl, dtype="object")})

    return media.mapInPandas(
        batches, schema=f"media_id string, {out_col} array<bigint>")


def ahash_near_pairs(df: DataFrame, id_col: str,
                     bands_col: str = "bands",
                     max_hamming: int = 3,
                     max_bucket_size: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(hash_a, hash_b) <=
    max_hamming, via the banded equi-join: by pigeonhole, two 64-bit
    hashes within distance d share at least one identical band whenever
    d < n_bands — so with the default 4x16-bit bands the join is
    RECALL-COMPLETE for d <= 3 (the deterministic sibling of minhash
    banding). Scale: the only shuffles key on (band_idx, band_value)
    (2^16 values per band) and the verify join carries just the two
    band arrays; a boilerplate band value (all-zero bands from empty/
    NULL payloads, all-black images) is the LSH hot-bucket skew —
    `max_bucket_size` drops (band_idx, band_value) buckets with more
    than that many members BEFORE the self-join (a k-member bucket is
    k²/2 candidate rows), mirroring minhash_lsh_pairs. Trade: a pair
    whose EVERY shared band is boilerplate is missed, weakening the
    pigeonhole guarantee to non-dropped bands — boilerplate-heavy media
    corpora want the cap, clean ones keep the exact guarantee (None)."""
    # pin: base feeds THREE consumers (the exploded self-join's two sides
    # and the two verify joins), and the upstream bands projection is an
    # interpreted 64-sample HOF that Catalyst otherwise COLLAPSES into
    # every consumer's projection — measured 197 s vs 3 s at sf0.1
    # (the dedup-signature materialization lesson, README design notes)
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(bands_col).alias("_b"))
              .filter(F.col("_b").isNotNull())
              .localCheckpoint(eager=False))
    expl = base.select("id", F.posexplode("_b").alias("_bi", "_bv"))
    if max_bucket_size is not None:
        # hot list is tiny by construction (only boilerplate values
        # exceed the cap) so it broadcasts; anti-join keeps the index
        # sort-free (the substring_dup_pairs lesson vs window caps)
        hot = (expl.groupBy("_bi", "_bv")
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .filter(F.col("_n") > max_bucket_size)
                   .select("_bi", "_bv"))
        expl = expl.join(F.broadcast(hot), ["_bi", "_bv"], "left_anti")
    a, b = expl.alias("_pa"), expl.alias("_pb")
    # dedup candidate pairs on SCALARS, then re-join the band arrays for
    # the verify: carrying the arrays through the dedup would make it a
    # first(array) SortAggregate (the dedup_incremental lesson) and ship
    # both arrays once per matching band instead of once per pair
    cand = (a.join(b, (F.col("_pa._bi") == F.col("_pb._bi"))
                   & (F.col("_pa._bv") == F.col("_pb._bv"))
                   & (F.col("_pa.id") < F.col("_pb.id")))
             .select(F.col("_pa.id").alias("id_a"),
                     F.col("_pb.id").alias("id_b"))
             .distinct())
    joined = (cand
              .join(base.select(F.col("id").alias("id_a"),
                                F.col("_b").alias("_ba")), "id_a")
              .join(base.select(F.col("id").alias("id_b"),
                                F.col("_b").alias("_bb")), "id_b"))
    ham = F.aggregate(
        F.zip_with("_ba", "_bb",
                   lambda x, y: F.bit_count(x.bitwiseXOR(y))
                   .cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return (joined.withColumn("hamming", ham)
                  .filter(F.col("hamming") <= max_hamming)
                  .select("id_a", "id_b", "hamming"))


# ------------------------------------------------------------- pHash (DCT)
PHASH_GRID = 16           # pixel grid side (16x16 = 256 samples)
PHASH_BLOCK = 8           # low-frequency block side (8x8 = 64 bits)
PHASH_SCALE = 1 << 14     # fixed-point cosine scale


def _phash_cos_matrix() -> list:
    """The 8x16 fixed-point DCT-II basis: C[u][x] =
    round(cos(pi*(2x+1)*u/32) * 2^14). Only the PHASH_BLOCK lowest
    frequencies are kept, so only those rows exist. Integers by
    construction — the SQL oracle interpolates the SAME literal, so
    every coefficient is engine-exact BIGINT arithmetic (libm cos never
    runs on either engine's data path)."""
    import math
    n = PHASH_GRID
    return [[round(math.cos(math.pi * (2 * x + 1) * u / (2 * n))
                   * PHASH_SCALE)
             for x in range(n)] for u in range(PHASH_BLOCK)]


PHASH_C = _phash_cos_matrix()


def phash_bands_py(text: str | None, n_bands: int = 4) -> list:
    """Python/numpy twin of the pHash pipeline (also THE engine kernel —
    with_phash_bands maps this over Arrow batches): 256 code-point stub
    pixels on a 16x16 grid, integer 2D DCT (C·P·Cᵀ over the fixed-point
    basis), keep the 8x8 low-frequency block, bit = coefficient >
    lower-median, packed in the aHash band layout (4 x 16-bit bands) so
    ahash_near_pairs serves both hash families. All int64: |C·P·Cᵀ| <=
    2^14·2^21·2^14·256 ≈ 2^57. Empty/NULL -> None (excluded from
    pairing). Unlike aHash's mean threshold, the DCT block captures
    STRUCTURE (low-frequency layout), so global brightness/contrast
    shifts (uniform code-point offsets) barely move it."""
    if not text:
        return None
    import numpy as np

    n, b = PHASH_GRID, PHASH_BLOCK
    ln = len(text)
    cs = np.array([ord(text[(k * ln) // (n * n)]) for k in range(n * n)],
                  dtype=np.int64).reshape(n, n)
    c = np.array(PHASH_C, dtype=np.int64)
    d = c @ cs @ c.T                     # (8x16)·(16x16)·(16x8) -> 8x8
    flat = d.reshape(-1)
    med = np.sort(flat, kind="stable")[flat.size // 2 - 1]  # lower median
    bits = [1 if v > med else 0 for v in flat.tolist()]
    per = flat.size // n_bands
    return [sum(bits[per * i + j] << j for j in range(per))
            for i in range(n_bands)]


def with_phash_bands(df: DataFrame, text_col: str, out_col: str = "bands",
                     n_bands: int = 4) -> DataFrame:
    """DataFrame form of phash_bands_py over Arrow batches (mapInPandas —
    two 8x16 int64 matmuls per row; the 16k-term expression form would
    be interpreted-HOF slow, and integer exactness means the numpy path
    needs no expression twin for the oracle). Preserves all columns."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<bigint>"

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [phash_bands_py(t, n_bands) for t in pdf[text_col]],
                dtype="object", index=pdf.index)
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# ------------------------------------------------- incremental perceptual
# dedup: a crawl's media history never re-hashes. The band STORE holds
# (band, bv, id, b) — ~40 bytes per historical item — and each increment
# broadcast-joins its banded hashes against it (the minhash signature-
# store discipline, llmops/dedup.py:255, applied to the perceptual tier;
# works identically for aHash and pHash since both share the band
# layout).
def ahash_store_frame(df: DataFrame, id_col: str,
                      bands_col: str = "bands") -> DataFrame:
    """(id, b, band, bv) — the persistable banded-hash index of a media
    corpus (rows with NULL bands — undecodable payloads — are excluded,
    matching ahash_near_pairs).

    Pinned before the explode: when bands come from with_ahash_bands'
    interpreted 64-sample HOF, Catalyst collapses that projection into
    the generator AND the carried `b` column — re-evaluating it per
    exploded row and per consumer (measured 110 s vs ~3 s at sf0.1 for
    the store write; the ahash_near_pairs lesson)."""
    return (df.filter(F.col(bands_col).isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.col(bands_col).alias("b"))
              .localCheckpoint(eager=False)
              .select("id", "b", F.posexplode("b").alias("band", "bv")))


def save_ahash_store(df: DataFrame, id_col: str, path: str,
                     bands_col: str = "bands") -> None:
    """Write the band store partitioned by band (layout/append hygiene —
    an increment probes all bands). Append new slices with
    mode('append') after deduping them."""
    (ahash_store_frame(df, id_col, bands_col)
     .write.partitionBy("band").mode("overwrite").parquet(path))


def incremental_ahash_pairs(store: DataFrame, new_hashed: DataFrame,
                            id_col: str, bands_col: str = "bands",
                            max_hamming: int = 3) -> DataFrame:
    """(id_old, id_new, hamming) pairs between the historical band store
    (an ahash_store_frame / loaded save_ahash_store table) and a new
    batch: band-bucket join on the broadcast new side (the store is
    SCANNED, never shuffled; history payloads never re-decode), Hamming
    verified from the two band arrays, recall-complete for
    d < n_bands by the same pigeonhole as ahash_near_pairs. In-batch
    duplicates are ahash_near_pairs' job — compose both for a full
    increment. The per-collision distinct is over SCALARS (the
    dedup_incremental lesson: a first(array) dedup would force a
    SortAggregate)."""
    newb = (ahash_store_frame(new_hashed, id_col, bands_col)
            .select(F.col("id").alias("id_new"),
                    F.col("b").alias("_bn"), "band", "bv"))
    cand = (store.join(F.broadcast(newb), ["band", "bv"])
                 .select(F.col("id").alias("id_old"),
                         F.col("b").alias("_bo"), "id_new", "_bn"))
    ham = F.aggregate(
        F.zip_with(F.col("_bo"), F.col("_bn"),
                   lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_old", "id_new", "hamming")
                .distinct())
