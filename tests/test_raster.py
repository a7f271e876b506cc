"""Raster transforms (transforms/raster.py) on real pixels through the
stdlib PNG codec — the tar2tf conversion-set parity tests
(tar2tf/src/tar2tf_test.go:31-51 is the reference's analog: transform a
fixture, read it back, assert content)."""

from __future__ import annotations

import pytest

from ais_etl_spark.operators import png
from ais_etl_spark.transforms import raster


def test_rotate_raster_quarter_turns():
    # 2x3 gray image (w=3, h=2):  [[1,2,3],[4,5,6]]
    rows = [bytearray([1, 2, 3]), bytearray([4, 5, 6])]
    w, h, out = raster.rotate_raster(3, 2, 1, rows, 90)
    assert (w, h) == (2, 3)
    assert [list(r) for r in out] == [[4, 1], [5, 2], [6, 3]]
    w, h, out = raster.rotate_raster(3, 2, 1, rows, 180)
    assert (w, h) == (3, 2)
    assert [list(r) for r in out] == [[6, 5, 4], [3, 2, 1]]
    w, h, out = raster.rotate_raster(3, 2, 1, rows, 270)
    assert (w, h) == (2, 3)
    assert [list(r) for r in out] == [[3, 6], [2, 5], [1, 4]]
    # 4 quarter turns = identity
    cur_w, cur_h, cur = 3, 2, rows
    for _ in range(4):
        cur_w, cur_h, cur = raster.rotate_raster(cur_w, cur_h, 1, cur, 90)
    assert (cur_w, cur_h) == (3, 2) and cur == rows
    with pytest.raises(ValueError):
        raster.rotate_raster(3, 2, 1, rows, 45)


def _media_df(spark, ids):
    from pyspark.sql import functions as F

    return spark.range(0, ids).select(
        F.col("id").alias("doc_id"),
        raster.synth_png_udf(8)(F.col("id")).alias("payload"),
    )


def test_img_rotate_resize_pixelwise(spark):
    from ais_etl_spark.transforms.spec import compile_pipeline

    d = _media_df(spark, 3)
    out = compile_pipeline(
        d, [{"op": "img_rotate", "angle": 90}, {"op": "img_resize", "width": 4, "height": 4}]
    )
    for r in out.collect():
        i = r["doc_id"]
        w, h, ch, rows = png.decode_png(bytes(r["payload"]))
        assert (w, h, ch) == (4, 4, 1)
        src = lambda y, x: (i * 31 + y * 8 + x) % 256  # noqa: E731
        for y in range(4):
            for x in range(4):
                want = (
                    sum(
                        src(7 - (2 * x + dx), 2 * y + dy)
                        for dx in (0, 1)
                        for dy in (0, 1)
                    )
                    // 4
                )
                assert rows[y][x] == want, (i, y, x)


def test_img_rotate_seeded_random_is_deterministic(spark):
    d = _media_df(spark, 4)
    a = {r["doc_id"]: bytes(r["payload"]) for r in
         raster.t_img_rotate(d, angle=0, seed=7).collect()}
    b = {r["doc_id"]: bytes(r["payload"]) for r in
         raster.t_img_rotate(d, angle=0, seed=7).collect()}
    assert a == b  # replay-identical (tar2tf's random angle, seeded)
    # the seeded choice actually rotates (dims stay 8x8; content differs
    # from the unrotated original for at least one doc)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in d.collect()}
    assert any(a[k] != orig[k] for k in a)


def test_img_grayscale_rgb(spark):
    rgb_rows = [bytearray([255, 0, 0, 0, 255, 0]) for _ in range(2)]  # red, green
    payload = png.encode_png(2, 2, 3, rgb_rows)
    df = spark.createDataFrame([(0, payload)], "doc_id long, payload binary")
    out = raster.t_img_grayscale(df).collect()[0]
    w, h, ch, rows = png.decode_png(bytes(out["payload"]))
    assert (w, h, ch) == (2, 2, 1)
    # BT.601 integer luma: red -> 76, green -> 149
    assert [list(r) for r in rows] == [[76, 149], [76, 149]]
