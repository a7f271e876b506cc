"""Large-binary stress: MB-scale payloads through the BinaryType/Arrow
path (the shape of the reference's stress tier,
transformers/tests/test_echo_stress.py:33-66 — 10,000 x 1 MiB there;
scaled to 24 x 1 MiB here to keep the unit suite in CI budget while
still exercising multi-MB Arrow batches end to end)."""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib

import pytest
from pyspark.sql import functions as F

N_ROWS = 24
MB = 1 << 20


def _payload(i: int) -> bytes:
    seed = hashlib.md5(f"stress-{i}".encode()).digest()
    return (seed * (MB // len(seed) + 1))[:MB]


@pytest.fixture(scope="module")
def big(spark):
    rows = [(f"obj-{i:03d}", _payload(i)) for i in range(N_ROWS)]
    return spark.createDataFrame(rows, "name string, payload binary").repartition(8)


def test_md5_on_mb_payloads(big):
    got = {r.name: r.digest for r in
           big.select("name", F.md5("payload").alias("digest")).collect()}
    for i in range(N_ROWS):
        assert got[f"obj-{i:03d}"] == hashlib.md5(_payload(i)).hexdigest()


def test_gzip_roundtrip_on_mb_payloads(big):
    from ais_etl_spark.transforms.builtin import gzip_compress_udf, gzip_decompress_udf

    out = big.select(
        "name",
        gzip_decompress_udf(gzip_compress_udf(F.col("payload"))).alias("rt"),
        gzip_compress_udf(F.col("payload")).alias("gz"),
    ).collect()
    for r in out:
        assert bytes(r.rt) == _payload(int(r.name[4:]))
        assert bytes(r.gz) == gzip.compress(_payload(int(r.name[4:])), mtime=0)


def test_tar_roundtrip_on_mb_payloads(spark, big):
    from ais_etl_spark.operators.archive import assemble_tar, explode_tar

    members = big.select(
        (F.crc32(F.col("name")) % 4).cast("string").alias("group_id"),
        F.col("name").alias("member_name"),
        F.col("payload").alias("member_bytes"),
    )
    tars = assemble_tar(members)
    back = explode_tar(
        tars.select(F.col("group_id").alias("archive_id"), F.col("tar").alias("payload"))
    ).collect()
    assert len(back) == N_ROWS
    for r in back:
        assert bytes(r.member_bytes) == _payload(int(r.member_name[4:]))
        assert r.member_size == MB


def test_lake_merge_mb_rows(spark, tmpdir_path):
    """Wide binary rows through the full merge path (footer stats on a
    small key column, MB values in the payload column)."""
    from ais_etl_spark.lake import LakeTable

    t0 = dt.datetime(2026, 1, 1)
    tbl = LakeTable.create(
        spark, tmpdir_path, [("url", "string"), ("warc_ts", "timestamp"),
                             ("html", "binary")], n_buckets=4,
    )
    rows = [(i, "I", f"u{i:02d}", t0 + dt.timedelta(seconds=i), _payload(i))
            for i in range(N_ROWS)]
    df = spark.createDataFrame(
        rows, "event_id long, op string, url string, warc_ts timestamp, html binary"
    )
    lin = tbl.merge(df, "stress-1")
    assert lin["inserts"] == N_ROWS
    got = {r.url: bytes(r.html) for r in tbl.read().collect()}
    assert got == {f"u{i:02d}": _payload(i) for i in range(N_ROWS)}
