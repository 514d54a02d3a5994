"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; the
decode / feature-extract kernels are Arrow-batched ``mapInPandas`` functions.
Three formats decode FOR REAL with no codec library: uncompressed 24-bit
BMP and binary PNM P5/P6 images (``decode_bmp``/``decode_pnm`` — true
dimensions, Rec.601 mean luma, 8×8 average-hash fingerprint,
round-trip-tested against pixel arrays) and integer-PCM WAV audio
(``decode_wav`` — true sample rate, duration, RMS of the normalized mono
mix). Every other format needs codecs this container lacks: those raise
NotImplementedError unless ``fake=True`` routes them through a deterministic
bytes-derived stub — so schema, partitioning, UDF signature and batch shape
(the Spark-side plumbing) are real and tested either way, and PIL/libvips
would slot into the same batch loop unchanged.

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


def decode_bmp(raw: bytes):
    """REAL image decode for uncompressed 24-bit BMP — pure numpy byte
    parsing, no codec library (the one mainstream raster format simple
    enough to decode honestly in this container). Returns an (H, W, 3)
    uint8 RGB array, or None when ``raw`` is not a BMP this decoder
    handles (other formats go through the caller's stub/raise path).

    Handles the standard layout: BITMAPINFOHEADER (or larger), bpp=24,
    BI_RGB (no compression), bottom-up or top-down rows, 4-byte row
    padding, BGR byte order."""
    import struct

    import numpy as np

    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    try:
        pix_off = struct.unpack_from("<I", raw, 10)[0]
        # A 12-byte BITMAPCOREHEADER stores w/h/bpp at different offsets;
        # require a BITMAPINFOHEADER (>= 40) before trusting the fields below.
        dib_size = struct.unpack_from("<I", raw, 14)[0]
        if dib_size < 40:
            return None
        width, height = struct.unpack_from("<ii", raw, 18)
        bpp = struct.unpack_from("<H", raw, 28)[0]
        compression = struct.unpack_from("<I", raw, 30)[0]
    except struct.error:
        return None
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    need = pix_off + stride * height
    if len(raw) < need:
        return None
    rows = np.frombuffer(raw, dtype=np.uint8, offset=pix_off, count=stride * height)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_pnm(raw: bytes):
    """REAL image decode for binary PNM — P5 (grayscale) and P6 (RGB), the
    other codec-free raster family (netpbm). Returns (H, W, 3) uint8 RGB
    (grayscale expanded), or None when ``raw`` is not a PNM this decoder
    handles (maxval ≤ 255, full pixel payload present)."""
    import numpy as np

    if len(raw) < 10 or raw[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if raw[:2] == b"P5" else 3
    pos, fields = 2, []
    n = len(raw)
    while len(fields) < 3 and pos < n:
        c = raw[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":  # comment to end of line
            while pos < n and raw[pos : pos + 1] not in b"\r\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < n and raw[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(raw[start:pos]))
        else:
            return None
    if len(fields) < 3 or pos >= n or raw[pos : pos + 1] not in b" \t\r\n":
        return None
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not (0 < maxval <= 255):
        return None
    need = width * height * channels
    if n - pos < need:
        return None
    px = np.frombuffer(raw, dtype=np.uint8, offset=pos, count=need)
    if channels == 1:
        px = np.repeat(px, 3)
    return px.reshape(height, width, 3).copy()


def decode_wav(raw: bytes):
    """REAL audio decode for PCM WAV (RIFF) — pure struct/numpy parsing, no
    codec library: integer PCM at 8 or 16 bits, any channel count.
    Returns (sample_rate, n_channels, mono float64 samples in [-1, 1]),
    or None when ``raw`` is not a PCM WAV this decoder handles."""
    import struct

    import numpy as np

    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data" and data is None:
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or n_ch < 1 or rate == 0 or bits not in (8, 16):
        return None
    if bits == 16:
        usable = len(data) // 2 * 2
        s = np.frombuffer(data, dtype="<i2", count=usable // 2).astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    frames = len(s) // n_ch
    if frames == 0:
        return None
    s = s[: frames * n_ch].reshape(frames, n_ch).mean(axis=1)
    return int(rate), int(n_ch), s


def _bmp_features(rgb) -> tuple[int, int, float, str]:
    """width/height, Rec.601 mean luma in [0,1], and an 8x8 average-hash
    (aHash: block-mean luma thresholded at its mean -> 64 bits hex)."""
    import numpy as np

    h, w = rgb.shape[:2]
    luma = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.float64)
    # 8x8 block means over a cropped grid (h//8, w//8 blocks; BMPs smaller
    # than 8px fall back to edge-clipped index sampling)
    if h >= 8 and w >= 8:
        bh, bw = h // 8, w // 8
        blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    else:
        yi = np.clip((np.arange(8) * h) // 8, 0, h - 1)
        xi = np.clip((np.arange(8) * w) // 8, 0, w - 1)
        blocks = luma[np.ix_(yi, xi)]
    bits = (blocks > blocks.mean()).astype(np.uint64).reshape(64)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return w, h, float(luma.mean() / 255.0), f"{val:016x}"


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Image decode + feature extraction over ``mapInPandas``.

    Arrow-batched: each partition streams pandas DataFrames, never a Python
    loop per row at the driver. Uncompressed 24-bit BMP decodes FOR REAL
    (``decode_bmp`` — pure numpy, no codec library): true width/height,
    Rec.601 mean luma, and an 8×8 average-hash perceptual fingerprint.
    Other formats need codecs this container lacks: they raise unless
    ``fake=True`` routes them through the deterministic stub (plumbing
    identical; PIL/libvips would slot into the same batch loop unchanged).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf[media_col]:
                raw = bytes(b) if b is not None else b""
                rgb = decode_bmp(raw)
                if rgb is None:
                    rgb = decode_pnm(raw)
                if rgb is not None:
                    out.append(_bmp_features(rgb))
                elif fake:
                    out.append(_fake_decode(raw))
                else:
                    raise NotImplementedError(
                        "only uncompressed 24-bit BMP and binary PNM (P5/P6) "
                        "decode without codec libraries; pass fake=True to "
                        "stub other formats"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in out],
                    "height": [d[1] for d in out],
                    "mean_luma": [d[2] for d in out],
                    "phash": [d[3] for d in out],
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
    """Audio decode + features over ``mapInPandas``. PCM WAV (8/16-bit
    integer, RIFF) decodes FOR REAL (``decode_wav`` — pure struct/numpy):
    true sample rate, duration, and RMS of the normalized mono mix.
    Compressed formats need codecs this container lacks: they raise
    unless ``fake=True`` routes them through the deterministic stub
    (plumbing identical; soundfile/ffmpeg would slot into the same batch
    loop unchanged)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(b) if b is not None else b""
                wav = decode_wav(raw)
                if wav is not None:
                    rate, _n_ch, s = wav
                    rows.append(
                        {
                            "media_id": int(mid),
                            "sample_rate": rate,
                            "duration_ms": len(s) * 1000 // rate,
                            "rms_level": float(math.sqrt((s * s).mean())),
                        }
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "only PCM WAV decodes without codec libraries; pass "
                        "fake=True to stub other formats"
                    )
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


def encode_pnm(rgb) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary PNM P6 — the
    codec-free container this module can also DECODE (round-trip tested),
    making resize a real pixels-in/pixels-out transform."""
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)


def resize_image(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    media_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """REAL image resize (supersedes ``resize_stub`` for decodable
    formats): decode BMP/PNM → nearest-neighbor index sampling (pure
    numpy, the deterministic kernel PIL's NEAREST matches) → re-encode
    as binary PNM P6. Returns (media_id, media, media_meta) with the
    new geometry — the normalize-before-embedding step of a multimodal
    training pipeline, in the same Arrow ``mapInPandas`` slot a
    libvips/PIL kernel would occupy.

    Non-decodable formats raise unless ``fake=True``, which emits a
    deterministic bytes-derived P6 at the requested geometry (plumbing
    and schema identical)."""
    import numpy as np

    if width < 1 or height < 1:
        raise ValueError(f"target geometry must be positive, got {width}x{height}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf[media_col]:
                raw = bytes(b) if b is not None else b""
                rgb = decode_bmp(raw)
                if rgb is None:
                    rgb = decode_pnm(raw)
                if rgb is not None:
                    h, w = rgb.shape[:2]
                    yi = (np.arange(height) * h) // height
                    xi = (np.arange(width) * w) // width
                    out.append(encode_pnm(rgb[np.ix_(yi, xi)]))
                elif fake:
                    seed = hashlib.sha256(raw).digest()
                    px = np.frombuffer(
                        (seed * (width * height * 3 // len(seed) + 1))[: width * height * 3],
                        dtype=np.uint8,
                    ).reshape(height, width, 3)
                    out.append(encode_pnm(px))
                else:
                    raise NotImplementedError(
                        "only BMP/PNM decode without codec libraries; "
                        "pass fake=True to stub other formats"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media": out,
                    "media_meta": [
                        {
                            "kind": "image",
                            "format": "pnm",
                            "width": width,
                            "height": height,
                            "sample_rate": None,
                            "duration_ms": None,
                        }
                    ]
                    * len(out),
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema=RESIZED)


def phash_to_long(col):
    """Hex 64-bit perceptual hash → SIGNED long, overflow-safe under ANSI
    (a plain conv(...,16,10).cast('long') errors past 2^63): the two
    32-bit halves parse separately and recombine with bit ops."""
    hi = F.conv(F.substring(col, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(col, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def image_neardup_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    max_hamming: int = 6,
    max_bucket: int = 4000,
    fake: bool = False,
) -> DataFrame:
    """Perceptual image near-dup pairs: aHash fingerprints from the real
    decode (``decode_image_features``) fed through the SAME pigeonhole
    blocking + Hamming verify as text SimHash (``simhash_pairs_from_sigs``
    — 8×8-bit blocks, exact for Hamming ≤ 7, capped buckets) — re-encoded
    or resized copies of an image land within a few aHash bits while
    byte-level dedup sees nothing. Returns (id_a < id_b, hamming).

    The scale posture is SimHash's: candidate generation is blocked and
    capped, never all-pairs; audit dropped buckets with the simhash
    tooling if the corpus is screenshot-dense (large uniform regions
    collapse aHash buckets the way boilerplate collapses text buckets)."""
    from cdc_connector_spark.ops.dedup import simhash_pairs_from_sigs

    feats = decode_image_features(df, media_col, id_col, fake=fake)
    sig = feats.select(
        F.col("media_id").alias("id"), phash_to_long(F.col("phash")).alias("sig")
    )
    return simhash_pairs_from_sigs(sig, max_hamming=max_hamming, max_bucket=max_bucket)
