"""Pure-stdlib baseline-PNG codec (zlib inflate + scanline unfilter).

Exists so ONE real image decode path runs and is oracle-checked in an
environment with no codec libraries: the reference's image transformers
decode PNG/JPEG to rasters before transforming
(/root/reference/transformers/tar2tf/src/transforms/job.go:127-164
Decode/Resize; /root/reference/transformers/torchvision_preprocess/
fastapi_server.py:52-109), and without this module that whole leg of
the pipeline could only be exercised through the deterministic fake.
PIL is still preferred at runtime when installed (multimodal.py's
codec detection); this is the PIL-free fallback for the baseline
subset our pipeline emits and tests:

- 8-bit depth; grayscale (color type 0), RGB (2), RGBA (4 channels, 6)
- all five scanline filters (None/Sub/Up/Average/Paeth)
- no interlace, no palette, no ancillary-chunk interpretation

Pure-Python O(pixels) — fine for fixtures and per-record thumbnails;
a production image pipeline swaps in a real codec via the same
runtime detection.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def decode_png(data: bytes) -> tuple[int, int, int, list[bytearray]]:
    """``data`` → (width, height, channels, rows); each row is a
    bytearray of ``width * channels`` samples, fully unfiltered."""
    if bytes(data[:8]) != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = channels = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # header + payload + CRC (CRC not verified)
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or ctype not in _CHANNELS or interlace:
                raise NotImplementedError(
                    f"unsupported PNG (depth={depth}, color_type={ctype}, "
                    f"interlace={interlace}); baseline 8-bit gray/RGB/RGBA only"
                )
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    p = 0
    for _y in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad scanline filter {f}")
        rows.append(line)
        prev = line
    return width, height, channels, rows


def encode_png(
    width: int, height: int, channels: int, rows: list[bytearray | bytes]
) -> bytes:
    """Rows → baseline PNG (filter 0 throughout — byte-deterministic
    given fixed zlib level)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def to_gray(
    width: int, channels: int, rows: list[bytearray]
) -> list[bytearray]:
    """ITU-R BT.601 integer luma ((299R + 587G + 114B) // 1000) —
    PIL's convert('L') coefficients with floor rounding. Alpha is
    ignored (no compositing)."""
    if channels == 1:
        return rows
    out = []
    for r in rows:
        g = bytearray(width)
        for x in range(width):
            o = x * channels
            g[x] = (r[o] * 299 + r[o + 1] * 587 + r[o + 2] * 114) // 1000
        out.append(g)
    return out


def resize_box(
    width: int,
    height: int,
    channels: int,
    rows: list[bytearray],
    new_w: int,
    new_h: int,
) -> list[bytearray]:
    """Deterministic area-average (box) resample: output pixel =
    floor(mean of its source cell). Exact on constant regions, which
    is what the fixture oracles assert."""
    out = []
    for ny in range(new_h):
        y0 = ny * height // new_h
        y1 = max((ny + 1) * height // new_h, y0 + 1)
        line = bytearray(new_w * channels)
        for nx in range(new_w):
            x0 = nx * width // new_w
            x1 = max((nx + 1) * width // new_w, x0 + 1)
            for c in range(channels):
                s = 0
                for y in range(y0, y1):
                    rr = rows[y]
                    for x in range(x0, x1):
                        s += rr[x * channels + c]
                line[nx * channels + c] = s // ((y1 - y0) * (x1 - x0))
        out.append(line)
    return out
