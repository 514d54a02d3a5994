"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; the
decode / feature-extract kernels are Arrow-batched ``mapInPandas`` functions.
The actual codec step is STUBBED in this container (no image/audio libs):
``decode`` raises NotImplementedError unless ``fake=True``, which produces a
deterministic fake derived from the bytes — so schema, partitioning, UDF
signature and batch shape (the Spark-side plumbing) are real and tested.

Schema convention::

    media: BINARY                 -- raw encoded bytes
    media_meta: STRUCT<kind:string, format:string, width:int, height:int,
                       sample_rate:int, duration_ms:bigint>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)


def _fake_decode(raw: bytes) -> tuple[int, int, float, str]:
    """Deterministic fake 'decode': dims and luma derived from a content hash."""
    h = hashlib.sha256(raw or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = h[2] / 255.0
    return width, height, mean_luma, h[:8].hex()


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction over ``mapInPandas``.

    Arrow-batched: each partition streams pandas DataFrames, never a Python
    loop per row at the driver. Real decoders (PIL/libvips) drop into
    ``_decode`` unchanged; the container lacks them so ``fake=True`` is the
    testable path.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this container; pass fake=True "
            "for the deterministic stub (plumbing is identical)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(bytes(b) if b is not None else b"") for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                    "phash": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema=IMAGE_FEATURES)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_level", T.DoubleType()),
    ]
)


def decode_audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Audio decode + feature stub over ``mapInPandas`` (same plumbing shape
    as the image path; real decoders slot in unchanged)."""
    if not fake:
        raise NotImplementedError("audio codecs not available; pass fake=True")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(b) if b is not None else b""
                h = hashlib.sha256(raw).digest()
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": 8000 * (1 + h[0] % 6),
                        "duration_ms": int(len(raw)) * 10,
                        "rms_level": h[1] / 255.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES.fields])

    return df.select(id_col, media_col).mapInPandas(batches, schema=AUDIO_FEATURES)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub: one row per sampled frame timestamp.

    The frame *schedule* (event-time arithmetic) is real Spark; only the
    pixel decode is faked/stubbed.
    """
    if not fake:
        raise NotImplementedError("video codecs not available; pass fake=True")
    # duration from metadata if present, else derived from byte length
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.length(F.col(media_col)).cast("long"))
    out = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), dur, F.lit(every_ms))).alias("frame_ts_ms"),
    )
    return out.withColumn("frame_key", F.concat_ws(":", F.col(id_col), F.col("frame_ts_ms")))


def resize_stub(df: DataFrame, media_col: str = "media", width: int = 224, height: int = 224) -> DataFrame:
    """Resize marker: records the requested geometry in metadata (the real
    kernel would transform bytes inside the same mapInPandas slot as decode)."""
    return df.withColumn(
        "resize_spec", F.struct(F.lit(width).alias("width"), F.lit(height).alias("height"))
    )
