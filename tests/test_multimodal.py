import pytest
from pyspark.sql import functions as F

from cdc_connector_spark.ops.multimodal import (
    decode_image_features,
    resize_stub,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\x89PNG fake bytes 1", ("image", "png", None, None, None, None)),
        (2, b"\x89PNG other bytes", ("image", "png", None, None, None, None)),
        (3, b"RIFF fake video", ("video", "avi", None, None, None, 3500)),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, media binary, media_meta struct<kind:string,format:string,"
        "width:int,height:int,sample_rate:int,duration_ms:bigint>",
    )


def test_decode_requires_fake_flag(media):
    # non-BMP bytes without fake=True: the kernel raises at action time
    # (BMP now decodes for real — see test_real_bmp_decode_roundtrip)
    with pytest.raises(Exception, match="BMP|fake=True"):
        decode_image_features(media).collect()


def test_decode_image_features_deterministic(media):
    out1 = decode_image_features(media, fake=True).orderBy("media_id").collect()
    out2 = decode_image_features(media, fake=True).orderBy("media_id").collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert all(64 <= r["width"] < 256 and 0 <= r["mean_luma"] <= 1 for r in out1)
    # different bytes → different phash
    assert out1[0]["phash"] != out1[1]["phash"]


def test_sample_frames_schedule(media):
    frames = sample_frames(media.filter("media_id = 3"), every_ms=1000, fake=True).collect()
    # duration 3500ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_stub_adds_spec(media):
    out = resize_stub(media, width=128, height=96).select("resize_spec.*").collect()[0]
    assert (out["width"], out["height"]) == (128, 96)


def _make_bmp(pixels, top_down=False):
    """Build an uncompressed 24-bit BMP from an (H, W, 3) RGB uint8 array."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    bgr = arr[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * 3) for r in range(h)
    )
    height_field = -h if top_down else h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def test_real_bmp_decode_roundtrip():
    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_bmp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width: padding
    for top_down in (False, True):
        got = decode_bmp(_make_bmp(img, top_down=top_down))
        assert got is not None and got.shape == (13, 7, 3)
        assert (got == img).all(), top_down
    assert decode_bmp(b"notabmp") is None
    assert decode_bmp(b"") is None


def test_image_features_real_bmp_path(spark):
    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_image_features

    dark = np.zeros((16, 16, 3), dtype=np.uint8)
    light = np.full((16, 16, 3), 255, dtype=np.uint8)
    half = np.zeros((16, 16, 3), dtype=np.uint8)
    half[:, 8:] = 255  # left dark / right light: aHash = 8 rows of 00001111
    df = spark.createDataFrame(
        [(1, bytearray(_make_bmp(dark))), (2, bytearray(_make_bmp(light))),
         (3, bytearray(_make_bmp(half)))],
        "media_id bigint, media binary",
    )
    got = {r["media_id"]: r for r in decode_image_features(df).collect()}
    assert got[1]["width"] == 16 and got[1]["height"] == 16
    assert got[1]["mean_luma"] == 0.0 and abs(got[2]["mean_luma"] - 1.0) < 1e-9
    assert abs(got[3]["mean_luma"] - 0.5) < 0.01
    assert got[3]["phash"] == "0f0f0f0f0f0f0f0f"
    # aHash of ANY uniform image is degenerate all-zeros (blocks == mean):
    # dark and light share it by design; structure distinguishes
    assert got[1]["phash"] == got[2]["phash"] == "0000000000000000"
    assert got[3]["phash"] != got[1]["phash"]


def test_non_bmp_raises_without_fake(spark):
    import pytest as _pt

    from cdc_connector_spark.ops.multimodal import decode_image_features

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nnotdecodable"))],
        "media_id bigint, media binary",
    )
    with _pt.raises(Exception, match="BMP|fake=True"):
        decode_image_features(df).collect()
    # fake=True stubs the unsupported format instead
    assert decode_image_features(df, fake=True).count() == 1


def test_bmp_core_header_rejected():
    """A 12-byte BITMAPCOREHEADER stores w/h/bpp at different offsets —
    the decoder must reject it instead of misreading the fields
    (ADVICE r6: a garbage byte pattern could slip past the bpp guard)."""
    import struct

    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_bmp

    w, h = 4, 4
    stride = (w * 3 + 3) // 4 * 4
    body = b"\x80" * (stride * h)
    header = struct.pack("<2sIHHI", b"BM", 26 + len(body), 0, 0, 26)
    core = struct.pack("<IHHHH", 12, w, h, 1, 24)  # BITMAPCOREHEADER
    # pad so total pre-pixel size lines up with pix_off=26
    raw = header + core + body
    assert decode_bmp(raw) is None
    # and the plain INFOHEADER path still decodes
    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    assert decode_bmp(_make_bmp(img)) is not None


def _make_wav(samples, rate=16000, n_ch=1, bits=16):
    """Build a PCM WAV from float samples in [-1, 1]."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.float64)
    if n_ch > 1:
        s = np.repeat(s[:, None], n_ch, axis=1).reshape(-1)
    if bits == 16:
        data = (np.clip(s, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = ((np.clip(s, -1, 1) * 127) + 128).astype("u1").tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decode_real_features(spark):
    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_audio_features, decode_wav

    t = np.arange(16000) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)  # 1s of A440 at half amplitude
    raw = _make_wav(sine)
    rate, n_ch, s = decode_wav(raw)
    assert (rate, n_ch, len(s)) == (16000, 1, 16000)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(np.sqrt((s * s).mean()) - 0.5 / np.sqrt(2)) < 1e-3
    # stereo folds to mono; 8-bit path decodes too
    rate2, n_ch2, s2 = decode_wav(_make_wav(sine[:100], rate=8000, n_ch=2))
    assert (rate2, n_ch2, len(s2)) == (8000, 2, 100)
    r8, _, s8 = decode_wav(_make_wav(sine[:50], bits=8))
    assert r8 == 16000 and len(s8) == 50
    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(b"not audio at all, definitely not") is None

    # Spark path: real WAV decodes without fake=True
    df = spark.createDataFrame([(1, bytearray(raw))], "media_id long, media binary")
    [row] = decode_audio_features(df).collect()
    assert row["sample_rate"] == 16000
    assert row["duration_ms"] == 1000
    assert abs(row["rms_level"] - 0.5 / 2**0.5) < 1e-3
    # non-WAV without fake still raises through the Spark path
    bad = spark.createDataFrame([(2, bytearray(b"mp3data"))], "media_id long, media binary")
    import pytest as _pt

    with _pt.raises(Exception, match="PCM WAV"):
        decode_audio_features(bad).collect()


def test_pnm_decode_real(spark):
    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_image_features, decode_pnm

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    p6 = b"P6\n# a comment\n5 6\n255\n" + img.tobytes()
    got = decode_pnm(p6)
    assert got is not None and got.shape == (6, 5, 3) and (got == img).all()
    gray = rng.integers(0, 256, (4, 7), dtype=np.uint8)
    p5 = b"P5 7 4 255 " + gray.tobytes()
    got5 = decode_pnm(p5)
    assert got5.shape == (4, 7, 3) and (got5[:, :, 0] == gray).all()
    assert (got5[:, :, 0] == got5[:, :, 2]).all()
    assert decode_pnm(b"P6\n5 6\n255\n" + img.tobytes()[:-1]) is None  # short payload
    assert decode_pnm(b"P7 something") is None

    # Spark path: P6 decodes for real (true dims, no fake flag)
    df = spark.createDataFrame([(1, bytearray(p6))], "media_id long, media binary")
    [row] = decode_image_features(df).collect()
    assert (row["width"], row["height"]) == (5, 6)


def test_binary_decoders_never_crash_on_fuzz():
    """Property: the three byte-level decoders (BMP/PNM/WAV) must return a
    valid decode or None on ARBITRARY bytes — binary parsers are the
    classic crash surface in media pipelines (a poisoned blob must not
    take down an executor)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cdc_connector_spark.ops.multimodal import decode_bmp, decode_pnm, decode_wav

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=300))
    def fuzz(raw):
        for dec in (decode_bmp, decode_pnm, decode_wav):
            out = dec(raw)
            assert out is None or out is not None  # no exception is the assertion

    fuzz()

    # adversarial prefixes: valid magic + garbage bodies
    for prefix in (b"BM", b"P5 ", b"P6\n", b"RIFF\x00\x00\x00\x00WAVE"):
        for tail in (b"", b"\x00" * 60, b"\xff" * 100, b"9" * 50):
            for dec in (decode_bmp, decode_pnm, decode_wav):
                dec(prefix + tail)  # must not raise


def test_resize_image_real_roundtrip(spark):
    """Nearest-neighbor resize over a real BMP: output is decodable P6 at
    the requested geometry with the exact sampled pixels."""
    import numpy as np

    from cdc_connector_spark.ops.multimodal import decode_pnm, resize_image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (10, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_make_bmp(img)))], "media_id long, media binary"
    )
    row = resize_image(df, width=4, height=5).collect()[0]
    assert (row["media_meta"]["width"], row["media_meta"]["height"]) == (4, 5)
    got = decode_pnm(bytes(row["media"]))
    yi = (np.arange(5) * 10) // 5
    xi = (np.arange(4) * 8) // 4
    assert got.shape == (5, 4, 3)
    assert (got == img[np.ix_(yi, xi)]).all()
    # upscale also exact under index sampling
    up = decode_pnm(bytes(resize_image(df, width=16, height=20).collect()[0]["media"]))
    assert up.shape == (20, 16, 3)
    with pytest.raises(Exception, match="fake=True"):
        resize_image(
            spark.createDataFrame([(1, b"\x89PNG")], "media_id long, media binary")
        ).collect()
    # fake mode: deterministic stub at the requested geometry
    fk1 = resize_image(
        spark.createDataFrame([(1, b"\x89PNG")], "media_id long, media binary"),
        width=6, height=7, fake=True,
    ).collect()[0]
    assert decode_pnm(bytes(fk1["media"])).shape == (7, 6, 3)


def test_image_neardup_pairs_perceptual(spark):
    """Re-encoded / lightly-perturbed copies pair up; unrelated images
    don't. Exercises the real decode -> aHash -> pigeonhole path."""
    import numpy as np

    from cdc_connector_spark.ops.multimodal import encode_pnm, image_neardup_pairs

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    tweaked = base.copy()
    tweaked[:2, :2] = 255  # tiny corner change -> few aHash bits flip
    other = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(_make_bmp(base))),
        (2, bytearray(encode_pnm(base))),   # same pixels, different container
        (3, bytearray(_make_bmp(tweaked))),
        (4, bytearray(_make_bmp(other))),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs(df, max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0           # container change is hamming 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_phash_to_long_top_bit(spark):
    """Hex hashes with the sign bit set parse without ANSI overflow."""
    from cdc_connector_spark.ops.multimodal import phash_to_long

    df = spark.createDataFrame(
        [("ffffffffffffffff",), ("8000000000000000",), ("0000000000000001",)],
        "h string",
    )
    got = [r["v"] for r in df.select(phash_to_long(F.col("h")).alias("v")).collect()]
    assert got == [-1, -(2**63), 1]
