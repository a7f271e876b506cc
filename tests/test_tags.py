"""Snapshot tags (named refs): the dataset-release primitive — a
training run pins read(tag=...) and gets identical rows forever,
immune to ongoing ingest and snapshot expiry. Mirrors Iceberg's tag
refs; the reference analog is tar2tf's version-keyed cache entries
(/root/reference/transformers/tar2tf/src/cached.go:50-78), where a
pinned version keeps serving after the object moves on."""

import datetime as dt

import pytest

from ais_etl_spark.lake import LakeTable

SCHEMA = [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")]
EV_DDL = "event_id bigint, op string, url string, warc_ts timestamp, text string"


def T(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def ev(spark, rows):
    return spark.createDataFrame(rows, EV_DDL)


@pytest.fixture()
def tbl(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, [(1, "I", "u1", T(1), "a")]), "b0")
    return t


def test_tag_pins_and_read_resolves(spark, tbl):
    snap = tbl.tag("release-1")
    tbl.merge(ev(spark, [(2, "U", "u1", T(2), "a2"), (3, "I", "u2", T(2), "b")]), "b1")
    assert tbl.tags() == {"release-1": snap}
    assert [r.text for r in tbl.read(tag="release-1").collect()] == ["a"]
    assert sorted(r.text for r in tbl.read().collect()) == ["a2", "b"]
    with pytest.raises(ValueError, match="not both"):
        tbl.read(snapshot_id=snap, tag="release-1")
    with pytest.raises(ValueError, match="unknown tag"):
        tbl.read(tag="nope")


def test_tags_are_immutable_unless_replaced(spark, tbl):
    tbl.tag("r1")
    tbl.merge(ev(spark, [(2, "I", "u2", T(2), "b")]), "b1")
    with pytest.raises(ValueError, match="replace=True"):
        tbl.tag("r1")
    tbl.tag("r1", replace=True)
    assert tbl.tags()["r1"] == tbl.current_snapshot_id()
    assert tbl.untag("r1") and not tbl.untag("r1")


def test_tagged_snapshot_survives_expiry(spark, tbl):
    tagged = tbl.tag("keep-me")
    for i in range(4):
        tbl.merge(ev(spark, [(10 + i, "U", "u1", T(10 + i), f"v{i}")]), f"b{i+1}")
    tbl.expire_snapshots(keep_last=1)
    # the tagged island still reads exactly its pinned rows
    assert [r.text for r in tbl.read(tag="keep-me").collect()] == ["a"]
    assert [r.text for r in tbl.read().collect()] == ["v3"]
    assert tbl.validate(full=True)["ok"]
    # untag, expire again: now it goes
    tbl.untag("keep-me")
    tbl.merge(ev(spark, [(20, "U", "u1", T(20), "v4")]), "b9")
    tbl.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        tbl.read(snapshot_id=tagged).collect()


def test_tag_missing_snapshot_rejected(spark, tbl):
    with pytest.raises(ValueError, match="no such snapshot"):
        tbl.tag("ghost", snapshot_id=99)
