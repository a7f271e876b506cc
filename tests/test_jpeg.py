"""Baseline JPEG codec (operators/jpeg.py): deterministic encode,
bounded lossy round-trip, exactness on flat blocks, 4:2:0 decode path,
restart-free baseline conformance bits (markers, stuffing)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ais_etl_spark.operators import jpeg


def _img(h, w, ch, fn):
    a = np.zeros((h, w, ch), np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                a[y, x, c] = fn(y, x, c) % 256
    return a


def _rows(a):
    return [bytearray(a[y].tobytes()) for y in range(a.shape[0])]


def _rt(a, **kw):
    h, w, ch = a.shape
    enc = jpeg.encode_jpeg(w, h, ch, _rows(a), **kw)
    W, H, C, out = jpeg.decode_jpeg(enc)
    assert (W, H, C) == (w, h, ch)
    return enc, np.frombuffer(
        b"".join(bytes(r) for r in out), np.uint8
    ).reshape(h, w, ch)


def test_flat_gray_exact():
    # flat 128 → every DCT coefficient is zero → lossless round-trip
    a = _img(24, 24, 1, lambda y, x, c: 128)
    _, dec = _rt(a, quality=85)
    assert np.array_equal(a, dec)


def test_flat_rgb_near_exact():
    # flat color: single DC per block; quant error ≤ half a quant step
    # spread over the block — tiny
    a = _img(16, 16, 3, lambda y, x, c: (200, 30, 90)[c])
    _, dec = _rt(a, quality=90)
    assert np.abs(dec.astype(int) - a.astype(int)).max() <= 3


def test_smooth_gradient_bounded_error():
    a = _img(33, 29, 3, lambda y, x, c: 60 + 2 * y + 3 * x + 10 * c)
    _, dec = _rt(a, quality=90)
    err = np.abs(dec.astype(int) - a.astype(int))
    assert err.mean() < 3 and err.max() <= 40


def test_420_subsampling_decodes():
    a = _img(35, 21, 3, lambda y, x, c: 100 + y + x + 5 * c)
    _, dec = _rt(a, quality=90, subsampling="420")
    err = np.abs(dec.astype(int) - a.astype(int))
    assert err.mean() < 6  # chroma at half resolution


def test_encode_deterministic():
    a = _img(17, 19, 3, lambda y, x, c: y * x + c)
    e1 = jpeg.encode_jpeg(19, 17, 3, _rows(a))
    e2 = jpeg.encode_jpeg(19, 17, 3, _rows(a))
    assert e1 == e2
    assert e1[:2] == b"\xff\xd8" and e1[-2:] == b"\xff\xd9"


def test_progressive_rejected():
    a = _img(8, 8, 1, lambda y, x, c: x)
    enc = bytearray(jpeg.encode_jpeg(8, 8, 1, _rows(a)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 → SOF2
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(enc))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.sampled_from([1, 3]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(w, h, ch, seed):
    """Arbitrary sizes incl. non-multiples of 8/16: shape preserved,
    reconstruction error bounded by quantization (smooth content)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 216, size=(1, 1, ch))
    ramp = (
        np.arange(h)[:, None, None] + np.arange(w)[None, :, None]
    ) % 32
    a = np.clip(base + ramp, 0, 255).astype(np.uint8)
    for sub in ("444",) if ch == 1 else ("444", "420"):
        _, dec = _rt(a, quality=90, subsampling=sub)
        err = np.abs(dec.astype(int) - a.astype(int))
        assert err.mean() < 8, (w, h, ch, sub, err.mean())


def test_decoder_terminates_on_corrupt_input():
    """Same contract as the FLAC twin: corrupt JPEG bytes raise or
    return, never hang (MCU loop and Huffman walk are bounded)."""
    import random

    a = _img(24, 24, 1, lambda y, x, c: x * 7 + y * 3)
    enc = jpeg.encode_jpeg(24, 24, 1, _rows(a), quality=85)
    rng = random.Random(7)
    for _ in range(40):
        cut = rng.randint(4, len(enc) - 1)
        t = bytearray(enc[:cut])
        if t and rng.random() < 0.5:
            i = rng.randint(4, len(t) - 1)
            t[i] ^= 1 << rng.randint(0, 7)
        try:
            jpeg.decode_jpeg(bytes(t))
        except Exception:
            pass
    for _ in range(40):
        junk = b"\xff\xd8\xff" + bytes(rng.randint(0, 255) for _ in range(rng.randint(4, 200)))
        try:
            jpeg.decode_jpeg(junk)
        except Exception:
            pass
