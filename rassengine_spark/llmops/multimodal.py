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
