"""WAV codec + audio transforms on real PCM samples (the audio twin of
test_raster.py; reference oracles are the audio_splitter duration/
content assertions, test_ffmpeg.py:49-79)."""

from __future__ import annotations

import pytest

from ais_etl_spark.operators import wav


def test_wav_roundtrip_mono_and_stereo():
    mono = [0, 100, -100, 32767, -32768, 7]
    rate, ch, got = wav.decode_wav(wav.encode_wav(8000, 1, mono))
    assert (rate, ch, got) == (8000, 1, mono)
    stereo = [1, -1, 200, -200, 32000, -32000]
    rate, ch, got = wav.decode_wav(wav.encode_wav(44100, 2, stereo))
    assert (rate, ch, got) == (44100, 2, stereo)


def test_wav_rejects_non_wav_and_bad_format():
    with pytest.raises(ValueError):
        wav.decode_wav(b"nope")
    with pytest.raises(ValueError):
        wav.trim_wav(wav.encode_wav(8000, 1, [1, 2, 3]), 0.5, 0.5)  # empty range
    one_sec = wav.encode_wav(8000, 1, [0] * 8000)
    with pytest.raises(ValueError):
        wav.trim_wav(one_sec, 2.0, 3.0)  # start past clip end
    # to_s past the end clips to the end instead of erroring
    _r, _c, got = wav.decode_wav(wav.trim_wav(one_sec, 0.5, 9.0))
    assert len(got) == 4000


def test_trim_is_sample_accurate():
    samples = list(range(-4000, 4000))  # 8000 samples = 1s at 8kHz
    data = wav.encode_wav(8000, 1, samples)
    rate, ch, got = wav.decode_wav(wav.trim_wav(data, 0.25, 0.5))
    assert got == samples[2000:4000]
    # stereo trim keeps frames aligned
    st = wav.encode_wav(4, 2, [10, 11, 20, 21, 30, 31, 40, 41])  # 4 frames at 4Hz
    rate, ch, got = wav.decode_wav(wav.trim_wav(st, 0.25, 0.75))
    assert (ch, got) == (2, [20, 21, 30, 31])


def test_to_mono_mixdown():
    st = wav.encode_wav(8000, 2, [100, 200, -100, -300, 7, 8])
    rate, ch, got = wav.decode_wav(wav.to_mono(st))
    assert (ch, got) == (1, [150, -200, 7])


def test_resample_integer_ratios():
    samples = list(range(100))
    data = wav.encode_wav(8000, 1, samples)
    # upsample 2x: every frame repeated (nearest mapping)
    rate, ch, up = wav.decode_wav(wav.resample(data, 16000))
    assert rate == 16000 and len(up) == 200
    assert up[:6] == [0, 0, 1, 1, 2, 2]
    # downsample 2x: every other frame
    rate, ch, down = wav.decode_wav(wav.resample(data, 4000))
    assert rate == 4000 and down == samples[::2]
    # stereo keeps frames intact
    st = wav.encode_wav(8000, 2, [1, 2, 3, 4, 5, 6, 7, 8])
    rate, ch, got = wav.decode_wav(wav.resample(st, 4000))
    assert (ch, got) == (2, [1, 2, 5, 6])
    # round trip down->up preserves rate/shape
    assert wav.decode_wav(wav.resample(wav.resample(data, 4000), 8000))[0] == 8000


def test_window_abs_sums():
    data = wav.encode_wav(8000, 1, [1, -2, 3, -4, 5])
    assert wav.window_abs_sums(data, 2) == [3, 7, 5]  # trailing partial window


def test_audio_pipeline_spark(spark):
    """Spec-compiled trim + mono + window sums through Spark — real
    codec end to end, including per-row-args trim (manifest pattern)."""
    from pyspark.sql import functions as F

    from ais_etl_spark.transforms import audio
    from ais_etl_spark.transforms.spec import compile_pipeline

    d = spark.range(0, 3).select(
        F.col("id").alias("doc_id"),
        audio.synth_wav_udf(8000, 1)(F.col("id")).alias("payload"),
    )
    out = compile_pipeline(
        d,
        [
            {"op": "audio_trim", "from_s": 0.25, "to_s": 0.75},
            {"op": "audio_window_sums", "window": 1000},
        ],
    )
    for r in out.collect():
        i = r["doc_id"]
        want = [
            sum(
                abs(((i * 7 + j * 13) % 2001) - 1000)
                for j in range(2000 + 1000 * w, 2000 + 1000 * w + 1000)
            )
            for w in range(4)
        ]
        assert r["window_sums"] == want, i
    # per-row args: each row trims a different range
    args = d.withColumn("lo", F.col("doc_id") * 0.1).withColumn(
        "hi", F.col("doc_id") * 0.1 + 0.25
    )
    trimmed = args.select(
        "doc_id",
        audio.trim_args_udf()(F.col("payload"), F.col("lo"), F.col("hi")).alias("p"),
    )
    for r in trimmed.collect():
        rate, ch, samples = wav.decode_wav(bytes(r["p"]))
        assert (rate, ch, len(samples)) == (8000, 1, 2000), r["doc_id"]


def test_audio_transcode_flac_to_wav(spark):
    """The FFmpeg ext-rewrite leg (flac->wav) through the registered
    transform over a DataFrame: FLAC payloads decode via the stdlib
    codec and re-encode as canonical PCM16 WAV, byte-deterministic;
    WAV passes through untouched."""
    import math

    from ais_etl_spark.operators import flac, wav
    from ais_etl_spark.transforms.registry import apply_transform

    samples = [int(9000 * math.sin(i / 25)) for i in range(3000)]
    flac_payload = flac.encode_flac(16000, 1, samples)
    wav_payload = wav.encode_wav(16000, 1, samples)
    df = spark.createDataFrame(
        [(1, flac_payload), (2, wav_payload)], "id long, payload binary"
    )
    out = {r["id"]: bytes(r["payload"]) for r in
           apply_transform(df, "audio_transcode", src="payload", to="wav").collect()}
    assert out[1] == wav_payload      # transcode == direct wav encode
    assert out[2] == wav_payload      # wav passthrough
    assert wav.decode_wav(out[1]) == (16000, 1, samples)


def test_spec_pipeline_flac_chain(spark):
    """Spec-compiled pipeline chaining the round-4 transcode with the
    existing audio ops — the tar2tf-style conversion list over FLAC
    input: transcode(flac->wav) -> trim [0, 0.25)s -> window sums.
    Expected values computed from the raw samples directly (both
    codec hops are lossless/sample-accurate)."""
    import math

    from ais_etl_spark.operators import flac
    from ais_etl_spark.transforms.spec import compile_pipeline

    rate = 8000
    samples = [int(6000 * math.sin(i / 30)) for i in range(rate)]  # 1 s mono
    df = spark.createDataFrame(
        [(1, flac.encode_flac(rate, 1, samples))], "id long, payload binary"
    )
    out = compile_pipeline(
        df,
        [
            {"op": "audio_transcode", "src": "payload", "to": "wav"},
            {"op": "audio_trim", "src": "payload", "from_s": 0.0, "to_s": 0.25},
            {"op": "audio_window_sums", "src": "payload", "window": 500},
        ],
    ).collect()[0]
    kept = samples[: rate // 4]
    want = [
        sum(abs(s) for s in kept[w : w + 500])
        for w in range(0, len(kept), 500)
    ]
    assert list(out["window_sums"]) == want
