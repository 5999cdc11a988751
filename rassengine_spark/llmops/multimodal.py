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
