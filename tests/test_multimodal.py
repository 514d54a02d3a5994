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
    with pytest.raises(NotImplementedError):
        decode_image_features(media)


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
