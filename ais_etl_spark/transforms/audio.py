"""Audio transforms on REAL PCM samples — the audio_splitter / FFmpeg
legs of the transformer set, running against the stdlib WAV codec
(operators/wav.py) instead of a fake:

- ``audio_trim``  ≙ audio_splitter's [from_time, to_time) extraction
  (/root/reference/NeMo/.../audio_splitter/fastapi_server.py:65-97) —
  sample-accurate, re-encoded.
- ``audio_mono``  ≙ FFmpeg AC=1 channel mixdown
  (/root/reference/transformers/FFmpeg/fastapi_server.py:41-63).
- ``audio_window_sums`` — integer-exact windowed energy profile, the
  check surface a SQL oracle can recompute from a sample formula
  (tf_audio_trim does exactly that).

All Arrow-batched pandas UDFs (bytes → bytes / array), registered for
spec-compiled pipelines. Per-row parameterization (the reference's
required etl_args) uses the manifest-join pattern: supply from/to as
columns via ``trim_args_udf``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, LongType

from ais_etl_spark.operators import wav
from ais_etl_spark.transforms.registry import register


@register("audio_trim", doc="sample-accurate [from_s, to_s) trim of a WAV payload")
def t_audio_trim(df, src: str = "payload", from_s: float = 0.0, to_s: float = 1.0, **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        return data.map(
            lambda b: None if b is None else wav.trim_wav(bytes(b), from_s, to_s)
        )

    return df.withColumn(src, fn(F.col(src)))


def trim_args_udf():
    """Per-row-args trim (audio_splitter's REQUIRED etl_args,
    fastapi_server.py:42-63): (payload, from_s, to_s) columns →
    trimmed payload. Join the manifest first, then call this."""

    @pandas_udf(BinaryType())
    def fn(data: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else wav.trim_wav(bytes(b), float(a), float(z))
                for b, a, z in zip(data, lo, hi)
            ]
        )

    return fn


@register("audio_mono", doc="channel mixdown to mono (FFmpeg AC=1 analog)")
def t_audio_mono(df, src: str = "payload", **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        return data.map(lambda b: None if b is None else wav.to_mono(bytes(b)))

    return df.withColumn(src, fn(F.col(src)))


@register("audio_resample", doc="nearest-sample rate conversion (FFmpeg AR analog)")
def t_audio_resample(df, src: str = "payload", rate: int = 16000, **_):
    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        return data.map(lambda b: None if b is None else wav.resample(bytes(b), rate))

    return df.withColumn(src, fn(F.col(src)))


@register("audio_window_sums", doc="per-window sum of |sample| (mono) — integer-exact energy profile")
def t_audio_window_sums(df, src: str = "payload", dst: str = "window_sums",
                        window: int = 1000, **_):
    @pandas_udf(ArrayType(LongType()))
    def fn(data: pd.Series) -> pd.Series:
        return data.map(
            lambda b: None if b is None else wav.window_abs_sums(bytes(b), window)
        )

    return df.withColumn(dst, fn(F.col(src)))


def synth_wav_udf(rate: int = 8000, seconds: int = 1):
    """Deterministic mono PCM16 WAV from an integer id:
    sample[i] = ((id*7 + i*13) % 2001) - 1000 — the same formula an
    ANSI SQL oracle evaluates directly (tf_audio_trim)."""

    @pandas_udf(BinaryType())
    def fn(ids: pd.Series) -> pd.Series:
        n = rate * seconds

        def one(i):
            if i is None:
                return None
            i = int(i)
            return wav.encode_wav(
                rate, 1, [((i * 7 + j * 13) % 2001) - 1000 for j in range(n)]
            )

        return ids.map(one)

    return lambda col: fn(col)


@register(
    "audio_transcode",
    doc="container transcode on real samples: flac->wav (stdlib FLAC "
        "decoder); wav passes through; other formats need ffmpeg",
)
def t_audio_transcode(df, src: str = "payload", to: str = "wav", **_):
    """The FFmpeg ext-rewrite leg (the reference's offline job runs
    ``ext={"flac": "wav"}`` over LibriSpeech,
    /root/reference/transformers/tests/test_ffmpeg.py:243-256), real
    since round 4: FLAC payloads decode through the from-spec stdlib
    codec (operators/flac.py — fixed/LPC subframes, Rice residuals,
    stereo decorrelation) and re-encode as canonical PCM16 WAV.
    Only ``to="wav"`` is expressible without ffmpeg."""
    if to != "wav":
        raise NotImplementedError("transcode target must be 'wav' without ffmpeg")
    from ais_etl_spark.operators import flac

    @pandas_udf(BinaryType())
    def fn(data: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            b = bytes(b)
            if b[:4] == b"RIFF":
                return b  # already wav
            if b[:4] == flac.MAGIC:
                return flac.flac_to_wav(b)
            raise NotImplementedError(
                "non-FLAC/WAV audio transcode requires ffmpeg (not installed)"
            )

        return data.map(one)

    return df.withColumn(src, fn(F.col(src)))
