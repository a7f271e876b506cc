from __future__ import annotations

import os
from datetime import datetime

import pytest

from ais_etl_spark.lake import LakeTable

SCHEMA = [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")]


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, event_id long, op string, text string"
    )


def test_expire_snapshots(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    base = datetime(2026, 1, 1)
    for i in range(4):
        t.merge(
            _events(spark, [(f"u{i}", base, i, "I", f"t{i}")]), batch_id=f"b{i}"
        )
    assert t.current_snapshot_id() == 4
    before = {r["url"]: r["text"] for r in t.read().collect()}
    assert len(before) == 4

    stats = t.expire_snapshots(keep_last=2)
    assert stats["snapshots_removed"] == 3  # v0..v2 dropped, v3+v4 kept
    # current read unaffected: retained manifests carry files by reference
    after = {r["url"]: r["text"] for r in t.read().collect()}
    assert after == before
    # time travel to an expired snapshot fails
    with pytest.raises(FileNotFoundError):
        t.commit(1)
    # data dirs referenced by retained snapshots survive
    assert t.read(snapshot_id=3).count() == 3


def test_expire_keeps_idempotence_log(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    base = datetime(2026, 1, 1)
    t.merge(_events(spark, [("u", base, 1, "I", "x")]), batch_id="b0")
    t.merge(_events(spark, [("u2", base, 2, "I", "y")]), batch_id="b1")
    t.expire_snapshots(keep_last=1)
    # replaying an old batch is still a no-op: the batch log lives in
    # the retained manifest
    assert t.merge(_events(spark, [("u", base, 1, "I", "x")]), batch_id="b0") == {}
    assert t.read().count() == 2
