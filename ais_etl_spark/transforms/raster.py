"""Raster ops on REAL pixels for the spec pipeline — the tar2tf
conversion set (Decode/Rotate/Resize,
/root/reference/transformers/tar2tf/src/transforms/job.go:127-164)
re-expressed as registered DataFrame transforms over PNG payloads,
decoding with the pure-stdlib codec (operators/png.py; PIL-free).

Semantics decisions vs the reference, made deliberate for CDC replay
determinism (SURVEY §7 risk 1):

- tar2tf Rotate with angle 0 draws a RANDOM angle (job.go:135-141);
  here angle 0 picks from {90, 180, 270} seeded by the payload bytes —
  stable across runs/executors, so replay-identical.
- Rotation supports exact 90-degree multiples (lossless pixel
  permutations); arbitrary-angle resampling is out of scope.
- Resize is the deterministic box resample (operators/png.py),
  floor-rounded — exact on constant regions, SQL-recomputable from
  known pixel formulas (the tf_raster_pipeline oracle does exactly
  that).

All ops are Arrow-batched pandas UDFs (bytes → bytes), registered so
spec-compiled pipelines (transforms/spec.py) can chain them like
tar2tf's conversion list.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, LongType

from ais_etl_spark.operators import png
from ais_etl_spark.transforms.builtin import xxhash64_py
from ais_etl_spark.transforms.registry import register

_JPEG_MAGIC = b"\xff\xd8\xff"


def decode_any(b: bytes):
    """Magic-dispatched decode: (width, height, channels, rows, fmt).
    PNG via operators/png.py, JPEG via the stdlib baseline codec
    (operators/jpeg.py, round 4) — both REAL pixel paths; anything
    else raises (same contract as before for unknown formats)."""
    if bytes(b[:3]) == _JPEG_MAGIC:
        from ais_etl_spark.operators import jpeg

        w, h, ch, rows = jpeg.decode_jpeg(bytes(b))
        return w, h, ch, rows, "jpeg"
    w, h, ch, rows = png.decode_png(bytes(b))
    return w, h, ch, rows, "png"


def encode_fmt(fmt: str, w: int, h: int, ch: int, rows) -> bytes:
    """Re-encode in the SOURCE format (the reference's transforms
    preserve container format, tar2tf job.go:146-164)."""
    if fmt == "jpeg":
        from ais_etl_spark.operators import jpeg

        return jpeg.encode_jpeg(w, h, ch, rows, quality=90)
    return png.encode_png(w, h, ch, rows)


def _rot90(w: int, h: int, ch: int, rows):
    """Clockwise quarter turn: out[r][c] = in[h-1-c][r]; dims swap."""
    out = []
    for r in range(w):
        line = bytearray(h * ch)
        for c in range(h):
            src = rows[h - 1 - c]
            line[c * ch : (c + 1) * ch] = src[r * ch : (r + 1) * ch]
        out.append(line)
    return h, w, out


def _rot180(w: int, h: int, ch: int, rows):
    out = []
    for r in range(h):
        src = rows[h - 1 - r]
        line = bytearray(w * ch)
        for c in range(w):
            line[c * ch : (c + 1) * ch] = src[(w - 1 - c) * ch : (w - c) * ch]
        out.append(line)
    return w, h, out


def rotate_raster(w: int, h: int, ch: int, rows, angle: int):
    """Rotate by a multiple of 90 degrees clockwise; returns
    (new_w, new_h, rows)."""
    a = angle % 360
    if a == 0:
        return w, h, rows
    if a == 90:
        return _rot90(w, h, ch, rows)
    if a == 180:
        return _rot180(w, h, ch, rows)
    if a == 270:
        nw, nh, r1 = _rot90(w, h, ch, rows)
        return _rot180(nw, nh, ch, r1)
    raise ValueError(f"angle must be a multiple of 90, got {angle}")


@register("img_rotate", doc="rotate PNG payload (90-degree multiples; 0 = payload-seeded choice)")
def t_img_rotate(df, src: str = "payload", angle: int = 90, seed: int = 42, **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            w, h, ch, rows, fmt = decode_any(b)
            a = angle
            if a == 0:  # tar2tf's random angle, made replay-deterministic
                a = (90, 180, 270)[xxhash64_py(bytes(b), seed) % 3]
            nw, nh, out = rotate_raster(w, h, ch, rows, a)
            return encode_fmt(fmt, nw, nh, ch, out)

        return data.map(one)

    return df.withColumn(src, fn(F.col(src)))


@register("img_resize", doc="box-resample PNG payload to width x height on real pixels")
def t_img_resize(df, src: str = "payload", width: int = 64, height: int = 64, **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            w, h, ch, rows, fmt = decode_any(b)
            return encode_fmt(
                fmt, width, height, ch, png.resize_box(w, h, ch, rows, width, height)
            )

        return data.map(one)

    return df.withColumn(src, fn(F.col(src)))


@register("img_grayscale", doc="BT.601 integer-luma grayscale on real pixels")
def t_img_grayscale(df, src: str = "payload", **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            w, h, ch, rows, fmt = decode_any(b)
            return encode_fmt(fmt, w, h, 1, png.to_gray(w, ch, rows))

        return data.map(one)

    return df.withColumn(src, fn(F.col(src)))


@register("img_row_sums", doc="decode PNG and emit per-scanline sample sums (pixel-level check surface)")
def t_img_row_sums(df, src: str = "payload", dst: str = "row_sums", **_):
    @pandas_udf(ArrayType(LongType()))
    def fn(data: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            _w, _h, _ch, rows, _fmt = decode_any(b)
            return [sum(r) for r in rows]

        return data.map(one)

    return df.withColumn(dst, fn(F.col(src)))


def synth_png_udf(side: int = 8):
    """Deterministic side×side gray PNG from an integer id:
    px[y][x] = (id*31 + y*side + x) % 256 — the same formula an ANSI
    SQL oracle can evaluate directly, which is what lets a REAL
    decode→rotate→resize chain be hash-checked end-to-end."""

    @pandas_udf(BinaryType())
    def fn(ids: pd.Series) -> pd.Series:
        def one(i):
            if i is None:
                return None
            i = int(i)
            rows = [
                bytearray((i * 31 + y * side + x) % 256 for x in range(side))
                for y in range(side)
            ]
            return png.encode_png(side, side, 1, rows)

        return ids.map(one)

    return lambda col: fn(col)
