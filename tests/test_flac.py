"""FLAC codec (operators/flac.py): exact lossless round-trip, every
decoder path the test encoder doesn't emit exercised via hand-crafted
bitstreams (LPC, stereo decorrelation, partition orders, wasted bits),
and the flac→wav transcode leg."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ais_etl_spark.operators import flac, wav


def _rt(sr, ch, samples, **kw):
    enc = flac.encode_flac(sr, ch, samples, **kw)
    got_sr, got_ch, got = flac.decode_flac(enc)
    assert (got_sr, got_ch) == (sr, ch)
    assert got == samples
    return enc


def test_roundtrip_stereo_multiblock():
    samples = []
    for i in range(9000):
        samples += [int(12000 * math.sin(i / 50)), int(8000 * math.sin(i / 33 + 1))]
    enc = _rt(16000, 2, samples, block_size=4096)
    assert len(enc) < len(samples) * 2  # actually compresses


def test_roundtrip_constant_and_short_tail():
    _rt(8000, 1, [77] * 5000, block_size=1024)  # constant + partial last block
    _rt(8000, 1, [-5, 3], block_size=4096)  # single tiny block


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600),
    st.sampled_from([1, 2]),
    st.sampled_from([64, 256]),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(mono, ch, bs):
    samples = [v for v in mono for _ in range(ch)]  # interleave ch copies
    _rt(8000, ch, samples, block_size=bs)


def _frame_header(channels_code, bps_code, bs, frame_no=0):
    bw = flac._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)  # reserved + fixed blocking
    bw.write(7, 4)  # 16-bit blocksize at end
    bw.write(0, 4)  # rate from streaminfo
    bw.write(channels_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.align()
    hdr = bytes(bw.out) + flac._utf8_number(frame_no) + struct.pack(">H", bs - 1)
    return hdr + bytes([flac._crc8(hdr)])


def _container(streams: bytes, sr=8000, ch=2, bps=16, total=0, bs=16):
    si = flac._BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 48)
    si.write(sr, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    info = bytes(si.out) + b"\x00" * 16
    return flac.MAGIC + bytes([0x80]) + len(info).to_bytes(3, "big") + info + streams


def _verbatim_subframe(bw, xs, bps):
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)
    for v in xs:
        bw.write(v, bps)


def test_decode_left_side_and_mid_side():
    left = [100, -200, 300, 50]
    right = [90, -180, 250, 55]
    side = [l - r for l, r in zip(left, right)]
    # left/side (ca=8): ch1 coded at bps+1
    bw = flac._BitWriter()
    _verbatim_subframe(bw, left, 16)
    _verbatim_subframe(bw, side, 17)
    bw.align()
    frame = _frame_header(8, 4, 4) + bytes(bw.out)
    frame += struct.pack(">H", flac._crc16(frame))
    sr, ch, got = flac.decode_flac(_container(frame, total=4))
    assert got == [v for pair in zip(left, right) for v in pair]

    # mid/side (ca=10)
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    bw = flac._BitWriter()
    _verbatim_subframe(bw, mid, 16)
    _verbatim_subframe(bw, side, 17)
    bw.align()
    frame = _frame_header(10, 4, 4) + bytes(bw.out)
    frame += struct.pack(">H", flac._crc16(frame))
    sr, ch, got = flac.decode_flac(_container(frame, total=4))
    assert got == [v for pair in zip(left, right) for v in pair]


def test_decode_lpc_subframe():
    """LPC order 1, coef c = 1<<shift → predictor = previous sample;
    craft residuals and check reconstruction."""
    xs = [10, 12, 9, 20, 18, 18, 17, 25]
    order, prec, shift = 1, 5, 2
    coef = 1 << shift  # 4 with shift 2 → pred = x[i-1]
    res = [xs[i] - xs[i - 1] for i in range(1, len(xs))]
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)  # LPC order 1
    bw.write(0, 1)
    bw.write(xs[0], 16)  # warmup
    bw.write(prec - 1, 4)
    bw.write(shift, 5)
    bw.write(coef, prec)
    bw.write(0, 2)  # rice method 0
    bw.write(1, 4)  # partition order 1 → 2 partitions
    n0 = len(xs) // 2 - order
    for part, rs in enumerate((res[:n0], res[n0:])):
        bw.write(3, 4)  # rice param 3
        for r in rs:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.write_unary(u >> 3)
            bw.write(u & 7, 3)
    bw.align()
    frame = _frame_header(0, 4, len(xs)) + bytes(bw.out)
    frame += struct.pack(">H", flac._crc16(frame))
    sr, ch, got = flac.decode_flac(_container(frame, ch=1, total=len(xs)))
    assert got == xs


def test_decode_wasted_bits_and_method1():
    """Subframe with 1 wasted bit (all samples even) + 5-bit rice
    (residual method 1)."""
    xs = [4, 8, -6, 12, 2, 0, 10, -4]
    shifted = [v >> 1 for v in xs]
    res = shifted  # FIXED order 0: residual = samples
    bw = flac._BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)  # FIXED order 0
    bw.write(1, 1)  # wasted bits flag
    bw.write(1, 1)  # unary 0 → wasted = 1
    bw.write(1, 2)  # residual method 1 (5-bit params)
    bw.write(0, 4)  # partition order 0
    bw.write(2, 5)  # param 2
    for r in res:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.write_unary(u >> 2)
        bw.write(u & 3, 2)
    bw.align()
    frame = _frame_header(0, 4, len(xs)) + bytes(bw.out)
    frame += struct.pack(">H", flac._crc16(frame))
    sr, ch, got = flac.decode_flac(_container(frame, ch=1, total=len(xs)))
    assert got == xs


def test_flac_to_wav_transcode():
    samples = [int(5000 * math.sin(i / 20)) for i in range(4000)]
    w = flac.flac_to_wav(flac.encode_flac(16000, 1, samples))
    assert wav.decode_wav(w) == (16000, 1, samples)


def test_flac_to_wav_rejects_non16bit():
    enc = flac.encode_flac(8000, 1, [1, 2, 3, 4], bps=24)
    sr, ch, got = flac.decode_flac(enc)
    assert got == [1, 2, 3, 4]  # 24-bit decode works
    with pytest.raises(NotImplementedError):
        flac.flac_to_wav(enc)  # but byte-identical wav transcode is 16-bit only


def test_not_flac_rejected():
    with pytest.raises(ValueError):
        flac.decode_flac(b"RIFFxxxxWAVE")


def test_decoder_terminates_on_corrupt_input():
    """Truncations and bit flips of a valid stream (and raw junk) must
    raise or return — never hang — so a malformed media payload lands
    in the merge-level quarantine instead of wedging an executor."""
    import random

    enc = flac.encode_flac(8000, 1, [i % 97 - 48 for i in range(1500)], block_size=256)
    rng = random.Random(7)
    for _ in range(40):
        cut = rng.randint(4, len(enc) - 1)
        t = bytearray(enc[:cut])
        if t and rng.random() < 0.5:
            i = rng.randint(4, len(t) - 1)
            t[i] ^= 1 << rng.randint(0, 7)
        try:
            flac.decode_flac(bytes(t))
        except Exception:
            pass  # any exception is fine; hanging is not
    for _ in range(40):
        junk = flac.MAGIC + bytes(rng.randint(0, 255) for _ in range(rng.randint(4, 200)))
        try:
            flac.decode_flac(junk)
        except Exception:
            pass
