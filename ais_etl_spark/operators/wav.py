"""Pure-stdlib WAV/PCM16 codec — the audio twin of operators/png.py.

The reference's audio transformers operate on real sample data:
audio_splitter trims [from_time, to_time) seconds and re-encodes
(/root/reference/NeMo/.../audio_splitter/fastapi_server.py:65-97),
FFmpeg transcodes with AC (channel) / AR (rate) env parameters
(/root/reference/transformers/FFmpeg/fastapi_server.py:41-63), and
audio_manager streams trimmed members into tars. Without a codec lib
those legs could only run against fakes; RIFF/WAVE PCM16 is simple
enough to parse with ``struct``, so the sample math (sample-accurate
trim, channel mixdown, windowed energy) runs for real in-sandbox and
is oracle-checkable from synthetic sample formulas.

Scope: canonical RIFF WAVE, PCM (format 1), 16-bit samples, any
channel count/rate; unknown chunks are skipped. Not supported: float/
24-bit PCM, ADPCM, WAVE_FORMAT_EXTENSIBLE — a real pipeline swaps in
ffmpeg via the same runtime detection multimodal.py uses for PIL.
"""

from __future__ import annotations

import struct


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """``data`` → (sample_rate, channels, samples) with samples
    interleaved (frame-major) signed 16-bit ints."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (format={fmt}, bits={bits})"
                )
        elif tag == b"data":
            pcm = bytes(body)
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    n = len(pcm) // 2
    samples = list(struct.unpack(f"<{n}h", pcm[: n * 2]))
    return rate, channels, samples


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Interleaved signed 16-bit samples → canonical RIFF WAVE
    (byte-deterministic)."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def trim_wav(data: bytes, from_s: float, to_s: float) -> bytes:
    """Sample-accurate [from_s, to_s) trim, re-encoded — the
    audio_splitter semantics (validation included: the reference
    errors on an empty/invalid/out-of-range request,
    fastapi_server.py:42-63). ``from_s`` must fall inside the clip;
    ``to_s`` past the end clips to the end (pydub slice semantics)."""
    if not (0 <= from_s < to_s):
        raise ValueError(f"invalid range [{from_s}, {to_s})")
    rate, ch, samples = decode_wav(data)
    duration = (len(samples) // ch) / rate
    if from_s >= duration:
        raise ValueError(
            f"trim start {from_s}s is at/after clip end ({duration}s)"
        )
    f0 = int(from_s * rate) * ch
    f1 = int(to_s * rate) * ch
    return encode_wav(rate, ch, samples[f0:f1])


def to_mono(data: bytes) -> bytes:
    """Channel mixdown (FFmpeg AC=1 analog): per-frame integer mean,
    truncated toward zero like C integer division of the sum."""
    rate, ch, samples = decode_wav(data)
    if ch == 1:
        return encode_wav(rate, 1, samples)
    mono = [
        int(sum(samples[i : i + ch]) / ch)
        for i in range(0, len(samples) - ch + 1, ch)
    ]
    return encode_wav(rate, 1, mono)


def resample(data: bytes, dst_rate: int) -> bytes:
    """Sample-rate conversion (FFmpeg AR analog) by nearest-sample
    index mapping: out frame i ← in frame floor(i * src/dst). Exact
    for integer ratios (drop/repeat frames); no interpolation filter —
    documented fidelity tradeoff of the stdlib path (a production
    pipeline swaps in ffmpeg via runtime detection)."""
    src_rate, ch, samples = decode_wav(data)
    if dst_rate == src_rate:
        return encode_wav(src_rate, ch, samples)
    n_in = len(samples) // ch
    n_out = n_in * dst_rate // src_rate
    out: list[int] = []
    for i in range(n_out):
        j = i * src_rate // dst_rate
        out.extend(samples[j * ch : (j + 1) * ch])
    return encode_wav(dst_rate, ch, out)


def window_abs_sums(data: bytes, window: int) -> list[int]:
    """Per-window sum of absolute sample values (mono expected) — the
    integer-exact energy profile the SQL oracle recomputes. Trailing
    partial window included."""
    _rate, ch, samples = decode_wav(data)
    if ch != 1:
        raise ValueError("window_abs_sums expects mono")
    return [
        sum(abs(s) for s in samples[i : i + window])
        for i in range(0, len(samples), window)
    ]
