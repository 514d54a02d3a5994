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
