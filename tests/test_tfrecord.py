"""tar2tf TFRecord target: wire formats (pure python, oracle = spec
constants) + Spark fan-in/roundtrip + byte-range serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ais_etl_spark.operators import tfrecord as TR


def test_crc32c_check_value():
    # the standard Castagnoli check value
    assert TR.crc32c(b"123456789") == 0xE3069283


def test_example_proto_roundtrip():
    exs = [
        {"__key__": b"a.txt", "data": b"hello world"},
        {"__key__": b"b.bin", "data": bytes(range(256)) * 10},
        {"__key__": b"empty", "data": b""},
    ]
    blob = b"".join(TR.tfrecord_frame(TR.tf_example_bytes(e)) for e in exs)
    assert [TR.parse_tf_example(p) for p in TR.read_tfrecord_bytes(blob)] == exs


def test_corruption_detected():
    blob = bytearray(TR.tfrecord_frame(TR.tf_example_bytes({"data": b"x" * 64})))
    blob[20] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        TR.read_tfrecord_bytes(bytes(blob))


@pytest.fixture(scope="module")
def samples(spark):
    rows = [(str(i % 3), f"m{i:02d}.txt", f"payload-{i}".encode()) for i in range(12)]
    return spark.createDataFrame(
        rows, "group_id string, member_name string, member_bytes binary"
    )


def test_samples_to_tfrecords_roundtrip(spark, samples):
    recs = TR.samples_to_tfrecords(samples)
    got = {r.group_id: r for r in recs.collect()}
    assert set(got) == {"0", "1", "2"} and all(r.n_examples == 4 for r in got.values())
    back = {(r.group_id, r.member_name): bytes(r.member_bytes)
            for r in TR.explode_tfrecord(recs).collect()}
    assert back == {(str(i % 3), f"m{i:02d}.txt"): f"payload-{i}".encode()
                    for i in range(12)}
    # byte determinism: a second build produces identical blobs
    again = {r.group_id: bytes(r.tfrecord) for r in TR.samples_to_tfrecords(samples).collect()}
    assert again == {g: bytes(r.tfrecord) for g, r in got.items()}


def test_byte_range_serving(spark, samples):
    recs = TR.samples_to_tfrecords(samples)
    full = {r.group_id: bytes(r.tfrecord) for r in recs.collect()}
    mid = TR.byte_range(recs, start=10, length=20)
    for r in mid.collect():
        assert bytes(r.chunk) == full[r.group_id][10:30]
        assert r.range_length == 20 and r.total_size == len(full[r.group_id])
    # start past the end → empty chunk + total size (the 416 path)
    over = TR.byte_range(recs, start=10_000_000, length=5).collect()
    assert all(bytes(r.chunk) == b"" and r.range_length == 0 for r in over)
    # range overlapping the tail is clamped
    tail_start = len(full["0"]) - 7
    tail = {r.group_id: r for r in TR.byte_range(recs, start=tail_start, length=100).collect()}
    assert bytes(tail["0"].chunk) == full["0"][tail_start:]
    assert tail["0"].range_length == 7


def test_corrupt_blob_quarantined(spark):
    blob = bytearray(TR.tfrecord_frame(TR.tf_example_bytes({"__key__": b"k", "data": b"v"})))
    blob[15] ^= 0xFF
    df = spark.createDataFrame([("g", bytes(blob))], "group_id string, tfrecord binary")
    rows = TR.explode_tfrecord(df).collect()
    assert len(rows) == 1 and rows[0].member_name is None  # quarantine row
