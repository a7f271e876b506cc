from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ais_etl_spark.operators.archive import (
    assemble_tar,
    explode_tar,
    tar_bytes,
    untar_bytes,
)


def test_tar_roundtrip_deterministic():
    members = [("b.txt", b"bravo"), ("a.txt", b"alpha")]
    t1, t2 = tar_bytes(members), tar_bytes(list(reversed(members)))
    assert t1 == t2  # sorted + zeroed metadata → byte-identical
    assert untar_bytes(t1) == [("a.txt", b"alpha"), ("b.txt", b"bravo")]


def test_explode_tar(spark):
    rows = [
        ("arc1", tar_bytes([("x.txt", b"xx"), ("y.bin", b"\x00\x01")])),
        ("arc2", tar_bytes([("z.txt", b"zzz")])),
        ("bad", b"not a tar archive"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "archive_id string, payload binary")
    got = explode_tar(df).collect()
    by_arc = {}
    for r in got:
        by_arc.setdefault(r["archive_id"], []).append(r)
    assert {r["member_name"] for r in by_arc["arc1"]} == {"x.txt", "y.bin"}
    assert by_arc["arc2"][0]["member_bytes"] == b"zzz"
    assert by_arc["arc2"][0]["member_size"] == 3
    # corrupt archive → quarantine row, not a task failure
    assert by_arc["bad"][0]["member_name"] is None
    assert by_arc["bad"][0]["member_size"] == -1
    assert "nul" not in by_arc


def test_assemble_tar_fan_in(spark):
    rows = [
        ("g1", "m1.txt", b"one"),
        ("g1", "m2.txt", b"two"),
        ("g1", None, b"skipme"),      # invalid → skipped + counted
        ("g2", "only.txt", b"solo"),
        ("g2", "gone.txt", None),     # invalid → skipped + counted
    ]
    df = spark.createDataFrame(
        rows, "group_id string, member_name string, member_bytes binary"
    )
    got = {r["group_id"]: r for r in assemble_tar(df).collect()}
    assert got["g1"]["n_members"] == 2 and got["g1"]["skipped"] == 1
    assert got["g2"]["n_members"] == 1 and got["g2"]["skipped"] == 1
    assert untar_bytes(bytes(got["g1"]["tar"])) == [
        ("m1.txt", b"one"), ("m2.txt", b"two")
    ]


def test_explode_then_assemble_roundtrip(spark):
    """face_detection tar shape: untar → (identity transform) → re-tar
    must reproduce the archive byte-identically."""
    original = tar_bytes([("a.txt", b"A"), ("b.txt", b"B"), ("c.txt", b"C")])
    df = spark.createDataFrame([("t", original)], "archive_id string, payload binary")
    members = explode_tar(df)
    rebuilt = assemble_tar(
        members.withColumnRenamed("archive_id", "group_id"),
        group_col="group_id",
    ).collect()[0]
    assert bytes(rebuilt["tar"]) == original


def test_untar_accepts_gzip_compressed_tar():
    """tar2tf reads .tar.gz streams (reference tar2tf/src/transforms/
    pipeline.go:22-29); tarfile's auto-detected mode gives us the same
    transparently — pin it so a refactor to an explicit mode string
    doesn't silently drop the compressed leg."""
    import gzip

    from ais_etl_spark.operators.archive import tar_bytes, untar_bytes

    members = [("a.txt", b"hello"), ("b.bin", bytes(range(64)))]
    plain = tar_bytes(members)
    assert untar_bytes(gzip.compress(plain)) == members == untar_bytes(plain)
