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
    # TRUNCATED/invalid jpeg payloads still raise without PIL (the
    # stdlib baseline-JPEG codec rejects them; round 4 — valid JPEGs
    # now decode for real, see test_extract_features_real_jpeg_stdlib)
    with pytest.raises(Exception):  # decode error surfaces as PythonException
        M.extract_features(media, fake_decode=False).collect()


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec: the real decode leg that runs WITHOUT any
# codec library (operators/png.py), oracle = hand-computed pixels
# ---------------------------------------------------------------------------


def _gray_png(pixels: list[list[int]]) -> bytes:
    from ais_etl_spark.operators import png

    h, w = len(pixels), len(pixels[0])
    return png.encode_png(w, h, 1, [bytearray(r) for r in pixels])


def test_png_roundtrip_gray_and_rgb():
    from ais_etl_spark.operators import png

    gray = [[0, 64, 128, 255], [10, 20, 30, 40], [200, 100, 50, 25]]
    data = _gray_png(gray)
    w, h, ch, rows = png.decode_png(data)
    assert (w, h, ch) == (4, 3, 1)
    assert [list(r) for r in rows] == gray

    rgb = [bytearray([x * 16, 255 - x * 16, x * 7]) for x in range(6)]
    rows_rgb = [bytearray(b"".join(bytes(rgb[y * 2 + x]) for x in range(2))) for y in range(3)]
    data = png.encode_png(2, 3, 3, rows_rgb)
    w, h, ch, rows = png.decode_png(data)
    assert (w, h, ch) == (2, 3, 3)
    assert rows == rows_rgb


def test_png_unfilter_all_filter_types():
    """Hand-filter known scanlines with Sub/Up/Average/Paeth and check
    the decoder reconstructs the original pixels (the encoder itself
    only emits filter 0, so this must be crafted)."""
    import struct
    import zlib

    from ais_etl_spark.operators import png

    orig = [
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [100, 110, 120, 130],
        [7, 9, 11, 13],
        [50, 60, 70, 80],
    ]
    w, h = 4, 5

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    filters = [0, 1, 2, 3, 4]  # one per row
    raw = bytearray()
    prev = [0] * w
    for y, f in enumerate(filters):
        line = orig[y]
        raw.append(f)
        for i in range(w):
            a = line[i - 1] if i > 0 else 0
            b = prev[i]
            c = prev[i - 1] if i > 0 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            raw.append((line[i] - pred) & 0xFF)
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        png.SIGNATURE + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got_w, got_h, ch, rows = png.decode_png(data)
    assert (got_w, got_h, ch) == (w, h, 1)
    assert [list(r) for r in rows] == orig


@pytest.mark.skipif(M._has_pil(), reason="PIL installed: PIL path active instead")
def test_extract_features_real_png_stdlib(spark):
    """REAL decode through Spark with zero codec libs: a constant-128
    16x16 gray PNG must yield features exactly 128/255 per row (box
    resample of a constant is exact), and a half-black/half-white image
    must split its rows at exactly 0 and 1."""
    const_png = _gray_png([[128] * 16 for _ in range(16)])
    split_png = _gray_png([[0] * 16 for _ in range(8)] + [[255] * 16 for _ in range(8)])
    df = spark.createDataFrame(
        [
            ("c1", "image", const_png, "png", 16, 16, None),
            ("s1", "image", split_png, "png", 16, 16, None),
        ],
        M.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r["feature"] for r in
           M.extract_features(df, dim=8, fake_decode=False).collect()}
    assert got["c1"] == pytest.approx([128 / 255.0] * 8)
    assert got["s1"] == pytest.approx([0.0] * 4 + [1.0] * 4)


@pytest.mark.skipif(M._has_pil(), reason="PIL installed: PIL path active instead")
def test_resize_images_real_png_stdlib(spark):
    """Real resize on actual pixels (tar2tf Resize analog): 8x8
    two-tone RGB -> 4x4; output re-decodes to the right dims with the
    tone boundary preserved."""
    from ais_etl_spark.operators import png

    rows = [
        bytearray(b"".join(bytes([200, 0, 0] if x < 4 else [0, 0, 200]) for x in range(8)))
        for _ in range(8)
    ]
    payload = png.encode_png(8, 8, 3, rows)
    df = spark.createDataFrame(
        [("r1", "image", payload, "png", 8, 8, None)], M.MEDIA_SCHEMA
    )
    out = M.resize_images(df, 4, 4, fake_decode=False).collect()[0]
    assert out["meta_width"] == 4 and out["meta_height"] == 4
    w, h, ch, drows = png.decode_png(bytes(out["payload"]))
    assert (w, h, ch) == (4, 4, 3)
    for r in drows:
        assert list(r[:6]) == [200, 0, 0, 200, 0, 0]      # left stays red
        assert list(r[6:]) == [0, 0, 200, 0, 0, 200]      # right stays blue


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


@pytest.mark.skipif(M._has_pil(), reason="PIL installed: PIL path active instead")
def test_extract_features_real_jpeg_stdlib(spark):
    """REAL JPEG decode through Spark with zero codec libs (round 4,
    operators/jpeg.py): a flat-128 gray JPEG decodes losslessly (all
    DCT coefficients zero), so features are exactly 128/255 per row —
    same exactness argument as the PNG twin above."""
    from ais_etl_spark.operators import jpeg

    flat = jpeg.encode_jpeg(
        16, 16, 1, [bytearray([128] * 16) for _ in range(16)], quality=85
    )
    df = spark.createDataFrame(
        [("j1", "image", flat, "jpeg", 16, 16, None)], M.MEDIA_SCHEMA
    )
    got = {r["media_id"]: r["feature"] for r in
           M.extract_features(df, dim=8, fake_decode=False).collect()}
    assert got["j1"] == pytest.approx([128 / 255.0] * 8)


@pytest.mark.skipif(M._has_pil(), reason="PIL installed: PIL path active instead")
def test_resize_images_real_jpeg_stdlib(spark):
    """Real JPEG resize preserves the source FORMAT (re-encodes as
    JPEG, the tar2tf format-preserving contract) and the flat tone."""
    from ais_etl_spark.operators import jpeg

    flat = jpeg.encode_jpeg(
        16, 16, 1, [bytearray([128] * 16) for _ in range(16)], quality=85
    )
    df = spark.createDataFrame(
        [("j1", "image", flat, "jpeg", 16, 16, None)], M.MEDIA_SCHEMA
    )
    out = M.resize_images(df, 8, 8, fake_decode=False).collect()[0]
    assert out["meta_width"] == 8 and out["meta_height"] == 8
    assert bytes(out["payload"][:3]) == b"\xff\xd8\xff"  # still a JPEG
    w, h, ch, rows = jpeg.decode_jpeg(bytes(out["payload"]))
    assert (w, h, ch) == (8, 8, 1)
    assert all(b == 128 for r in rows for b in r)
