from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ais_etl_spark.operators import multimodal as M

ROWS = [
    ("img1", "image", b"\xff\xd8\xff\xe0fakejpegbytes", "jpeg", 64, 48, None),
    ("img2", "image", b"\x89PNG\r\nfakepngbytes", "png", 32, 32, None),
    ("aud1", "audio", b"RIFFxxxxWAVEfakewav", "wav", None, None, 2500),
    ("doc1", "other", b"plain text bytes", "txt", None, None, None),
    ("nul1", "image", None, "jpeg", None, None, None),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(ROWS, M.MEDIA_SCHEMA)


def test_classify_media(media):
    got = {r["media_id"]: r["detected_type"] for r in
           M.classify_media(media.filter(F.col("payload").isNotNull())).collect()}
    assert got == {"img1": "image", "img2": "image", "aud1": "audio", "doc1": "other"}


def test_extract_features_fake(media):
    got = {r["media_id"]: r["feature"] for r in
           M.extract_features(media, dim=8, fake_decode=True).collect()}
    assert got["doc1"] is None and got["nul1"] is None
    assert len(got["img1"]) == 8
    assert all(0.0 <= x <= 1.0 for x in got["img1"])
    # deterministic across invocations
    again = {r["media_id"]: r["feature"] for r in
             M.extract_features(media, dim=8, fake_decode=True).collect()}
    assert got == again


@pytest.mark.skipif(M._has_pil(), reason="PIL installed: real path active")
def test_extract_features_real_mode_raises_without_pil(media):
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.extract_features(media, fake_decode=False).collect()


@pytest.mark.skipif(not M._has_pil(), reason="PIL not installed")
def test_extract_features_real_path_with_pil(spark):
    """Real decode, active automatically when PIL is present: encode a
    tiny PNG, expect dim per-row mean intensities in [0, 1]."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("p1", "image", buf.getvalue(), "png", 16, 16, None)], M.MEDIA_SCHEMA
    )
    feats = M.extract_features(df, dim=8, fake_decode=False).collect()[0]["feature"]
    assert len(feats) == 8 and all(abs(x - 128 / 255.0) < 0.02 for x in feats)
    resized = M.resize_images(df, 4, 4, fake_decode=False).collect()[0]
    assert Image.open(io.BytesIO(bytes(resized["payload"]))).size == (4, 4)


def test_resize_images(media):
    out = {r["media_id"]: r for r in
           M.resize_images(media, 128, 96, fake_decode=True).collect()}
    assert out["img1"]["payload"][:4] == b"RSZ1"
    assert out["img1"]["meta_width"] == 128 and out["img1"]["meta_height"] == 96
    assert out["nul1"]["payload"] is None


def test_sample_frames(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    # only aud1 has a duration: 2500ms → 2 frames
    assert {r["media_id"] for r in frames} == {"aud1"}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000]
    assert all(r["frame"][:4] == b"FRM1" for r in frames)
