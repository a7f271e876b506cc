"""Write-audit-publish staging (Iceberg's WAP pattern re-expressed on
the LakeTable commit log): stage_merge parks a full merge result where
no reader can see it, read_staged is the audit surface, publish_staged
promotes it atomically, discard_staged removes every trace. The
production quality gate: a bad batch is rejected BEFORE it is
queryable, complementing the row-level dead-letter quarantine
(reference analog: audio_manager's skip-and-count,
/root/reference/NeMo/.../audio_manager/fastapi_server.py:170-199, which
also validates before emitting)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

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
    t.merge(ev(spark, [(1, "I", "u1", T(1), "a"), (2, "I", "u2", T(1), "b")]), "b0")
    return t


B1 = [(3, "U", "u1", T(2), "a2"), (4, "D", "u2", T(2), None)]


def test_staged_batch_is_invisible_until_published(spark, tbl):
    head = tbl.current_snapshot_id()
    lin = tbl.stage_merge(ev(spark, B1), "b1")
    assert lin["updates"] == 1 and lin["deletes"] == 1
    # nothing visible: head, read, lookup, lineage
    assert tbl.current_snapshot_id() == head
    assert sorted(r.text for r in tbl.read().collect()) == ["a", "b"]
    assert [r.text for r in tbl.lookup("u1").collect()] == ["a"]
    assert sorted(r.batch_id for r in tbl.lineage().collect()) == ["b0"]
    assert tbl.staged_batches() == ["b1"]
    # audit surface shows the would-be state
    assert sorted((r.url, r.text) for r in tbl.read_staged("b1").collect()) == [
        ("u1", "a2")
    ]


def test_publish_promotes_atomically(spark, tbl):
    tbl.stage_merge(ev(spark, B1), "b1")
    lin = tbl.publish_staged("b1")
    assert lin["batch_id"] == "b1"
    assert sorted((r.url, r.text) for r in tbl.read().collect()) == [("u1", "a2")]
    assert sorted(r.batch_id for r in tbl.lineage().collect()) == ["b0", "b1"]
    assert tbl.staged_batches() == []
    # published commit equals a direct merge: exactly-once fence holds
    assert tbl.merge(ev(spark, B1), "b1") == {}


def test_discard_removes_every_trace(spark, tbl, tmpdir_path):
    tbl.stage_merge(ev(spark, B1), "b1", mode="mor")
    assert tbl.discard_staged("b1")
    assert tbl.staged_batches() == []
    assert not os.path.isdir(os.path.join(tmpdir_path, "data", "staged-b1"))
    assert sorted(r.text for r in tbl.read().collect()) == ["a", "b"]
    # batch id is free again — a later direct merge applies normally
    lin = tbl.merge(ev(spark, B1), "b1")
    assert lin["updates"] == 1


def test_stale_publish_rejected_then_restage(spark, tbl):
    tbl.stage_merge(ev(spark, B1), "b1")
    tbl.merge(ev(spark, [(5, "I", "u3", T(3), "c")]), "b2")  # head moves
    with pytest.raises(RuntimeError, match="restage"):
        tbl.publish_staged("b1")
    # staged attempt left inspectable, then restaged on the new head
    assert tbl.staged_batches() == ["b1"]
    tbl.stage_merge(ev(spark, B1), "b1")
    tbl.publish_staged("b1")
    assert sorted(r.url for r in tbl.read().collect()) == ["u1", "u3"]


def test_staging_an_already_committed_batch_is_fenced(spark, tbl):
    assert tbl.stage_merge(
        ev(spark, [(1, "I", "u1", T(1), "a"), (2, "I", "u2", T(1), "b")]), "b0"
    ) == {}
    assert tbl.staged_batches() == []


def test_restaging_a_published_batch_preserves_its_data(spark, tbl):
    """stage → publish → stage_merge(same id) again (the committed-batch
    replay, e.g. a streaming restart): the replay must hit the
    exactly-once fence BEFORE any cleanup. A published staged batch's
    data files live under data/staged-<id>/ and back the live snapshot;
    the old unconditional discard_staged rmtree'd them, leaving read()
    broken with PATH_NOT_FOUND (the r5 ADVICE data-loss bug)."""
    tbl.stage_merge(ev(spark, B1), "b1")
    tbl.publish_staged("b1")
    before = sorted(r.url for r in tbl.read().collect())
    assert tbl.stage_merge(ev(spark, B1), "b1") == {}
    assert sorted(r.url for r in tbl.read().collect()) == before == ["u1"]
    # a stray discard of the committed id must refuse too
    assert tbl.discard_staged("b1") is False
    assert sorted(r.url for r in tbl.read().collect()) == before
    assert tbl.validate(full=True)["ok"]


def test_staged_survives_expiry_and_restart(spark, tbl, tmpdir_path):
    tbl.stage_merge(ev(spark, B1), "b1")
    tbl.merge(ev(spark, [(5, "I", "u3", T(3), "c")]), "b2")
    tbl.expire_snapshots(keep_last=1)
    # a fresh instance (process restart) still sees and can act on it
    t2 = LakeTable.load(spark, tmpdir_path)
    assert t2.staged_batches() == ["b1"]
    assert t2.read_staged("b1").count() == 1
    with pytest.raises(RuntimeError):
        t2.publish_staged("b1")  # head moved before the expiry
    t2.discard_staged("b1")
    assert t2.validate(full=True)["ok"]


def test_audit_reject_workflow(spark, tbl):
    """The intended gate: stage → validate → publish-or-discard."""
    bad = ev(spark, [(3, "D", "u1", T(2), None), (4, "D", "u2", T(2), None)])
    tbl.stage_merge(bad, "b1")
    staged_live = tbl.read_staged("b1").count()
    if staged_live == 0:  # quality rule: a batch may never empty the table
        tbl.discard_staged("b1")
    assert sorted(r.text for r in tbl.read().collect()) == ["a", "b"]
    good = ev(spark, [(3, "U", "u1", T(2), "a2")])
    tbl.stage_merge(good, "b1")
    assert tbl.read_staged("b1").count() > 0
    tbl.publish_staged("b1")
    assert sorted(r.text for r in tbl.read().collect()) == ["a2", "b"]


def test_staged_quarantine_rows_discarded_with_the_attempt(spark, tbl):
    rows = B1 + [(9, "X", "u9", T(2), "bad-op")]
    lin = tbl.stage_merge(ev(spark, rows), "b1")
    assert lin["malformed"] == 1
    assert tbl.quarantine().count() == 1
    tbl.discard_staged("b1")
    assert tbl.quarantine().count() == 0


# ---------------------------------------------------------------------------
# property: any interleaving of direct merges, staged-then-published
# batches, and staged-then-discarded batches equals direct merges of
# exactly the applied subset
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_actions = st.lists(
    st.sampled_from(["direct", "publish", "discard"]), min_size=1, max_size=5
)
_step = st.integers(min_value=0, max_value=20)


@given(_actions, st.lists(_step, min_size=3, max_size=18))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_wap_interleavings_equal_direct(spark, tmpdir_path, actions, steps):
    import shutil
    import tempfile

    rows = [
        (i, ("I", "U", "D")[ts % 3], f"u{ts % 5}", T(ts),
         None if ts % 3 == 2 else f"v{i}")
        for i, ts in enumerate(steps)
    ]
    per = len(rows) // len(actions) + 1
    d = tempfile.mkdtemp(prefix="wap-prop-", dir=tmpdir_path)
    try:
        t1 = LakeTable.create(spark, os.path.join(d, "a"), SCHEMA, n_buckets=4)
        t2 = LakeTable.create(spark, os.path.join(d, "b"), SCHEMA, n_buckets=4)
        for i, act in enumerate(actions):
            chunk = rows[i * per:(i + 1) * per]
            if not chunk:
                continue
            batch = ev(spark, chunk)
            if act == "direct":
                t1.merge(batch, f"b{i}")
            elif act == "publish":
                t1.stage_merge(batch, f"b{i}")
                t1.publish_staged(f"b{i}")
            else:
                t1.stage_merge(batch, f"b{i}")
                t1.discard_staged(f"b{i}")
            if act != "discard":
                t2.merge(batch, f"b{i}")
        got = sorted(tuple(r) for r in t1.read().collect())
        want = sorted(tuple(r) for r in t2.read().collect())
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
