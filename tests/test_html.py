"""Pure-Python html synth/extract contract (no Spark).

Oracle style mirrors the reference's local-recompute oracles
(/root/reference/transformers/tests/test_compress_unit.py:39-78)."""

import gzip

from ais_etl_spark.html import (
    GZIP_MAGIC,
    extract_lang_bytes,
    extract_text_bytes,
    maybe_gunzip,
    synth_html,
)


def test_round_trip_byte_identical():
    text = "Hello <world> & friends\nsecond ¶ pärägraph"
    payload = synth_html("https://a.example.com/x", text, "de")
    assert payload[:2] == GZIP_MAGIC
    assert extract_text_bytes(payload) == text  # byte-identical invariant
    assert extract_lang_bytes(payload) == "de"


def test_deterministic_bytes():
    a = synth_html("https://u", "t1\nt2", "en")
    b = synth_html("https://u", "t1\nt2", "en")
    assert a == b  # gzip mtime pinned → replay-identical payloads


def test_uncompressed_input_accepted():
    raw = gzip.decompress(synth_html("u", "plain text", "en"))
    assert extract_text_bytes(raw) == "plain text"
    assert maybe_gunzip(raw) == raw


def test_none_passthrough():
    assert extract_text_bytes(None) is None
    assert extract_lang_bytes(None) is None


def test_script_and_nav_excluded():
    payload = synth_html("u", "only this", "en")
    assert extract_text_bytes(payload) == "only this"
    assert "tracked" not in extract_text_bytes(payload)


def test_fused_extract_parity(spark):
    """extract_text_lang_udf must be byte-identical to the separate
    extract_text/extract_lang UDFs on the same payloads (incl. None)."""
    from pyspark.sql import functions as F

    from ais_etl_spark import html as H
    from ais_etl_spark.transforms.builtin import (
        extract_lang_udf,
        extract_text_lang_udf,
        extract_text_udf,
    )

    rows = [
        (0, H.synth_html("https://a/x", "hello\nworld & <tag>", "en")),
        (1, H.synth_html("https://b/y", "", "de")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "i long, html binary")
    sep = df.select(
        "i",
        extract_text_udf("html").alias("text"),
        extract_lang_udf("html").alias("lang"),
    )
    fused = df.withColumn("_tl", extract_text_lang_udf("html")).select(
        "i", F.col("_tl.text").alias("text"), F.col("_tl.lang").alias("lang")
    )
    assert sorted(map(tuple, sep.collect())) == sorted(map(tuple, fused.collect()))
