"""Merge-on-read (mode='mor') — CoW parity matrix.

The contract under test: ``merge(mode='mor')`` and ``merge(mode='cow')``
produce IDENTICAL logical table state for any event sequence, in any
interleaving, before and after compaction — only the physical layout
(delta files + read-time LWW resolution vs base-file rewrite) differs.
This mirrors Iceberg's v2 position/equality-delete contract (public
spec) re-expressed as whole-row delta files, which is the natural shape
for a key-ordered CDC upsert stream.

Reference parity note: the reference's offline bucket-to-bucket job
(/root/reference/transformers/tests/test_ffmpeg.py:243-256) always
rewrites destination objects (CoW-only); MoR is the beyond-reference
scale path for update-heavy feeds against large base files.
"""

import datetime as dt
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ais_etl_spark.lake import LakeTable

SCHEMA = [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")]
EV_DDL = "event_id bigint, op string, url string, warc_ts timestamp, text string"


def T(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def ev(spark, rows):
    return spark.createDataFrame(rows, EV_DDL)


B1 = [(1, "I", "u1", T(1), "a"), (2, "I", "u2", T(1), "b"), (3, "I", "u3", T(1), "c")]
B2 = [(4, "U", "u1", T(2), "a2"), (5, "D", "u2", T(2), None), (6, "U", "u1", T(0), "stale")]
B3 = [(7, "I", "u2", T(3), "b2"), (8, "D", "u3", T(3), None), (9, "U", "u9", T(3), "ghost")]


def _apply(table, spark, batches, mode):
    for i, b in enumerate(batches):
        table.merge(ev(spark, b), f"b{i}", mode=mode)
    return table


def _pair(spark, tmpdir_path, batches=(B1, B2, B3), modes=("cow", "mor")):
    out = []
    for m, sub in zip(modes, ("a", "b")):
        t = LakeTable.create(
            spark, os.path.join(tmpdir_path, sub), SCHEMA, n_buckets=4
        )
        out.append(_apply(t, spark, batches, m))
    return out


def rows_of(table, **kw):
    return sorted(tuple(r) for r in table.read(**kw).collect())


def test_read_parity_and_layout(spark, tmpdir_path):
    cow, mor = _pair(spark, tmpdir_path)
    assert rows_of(cow) == rows_of(mor)
    stats = mor.table_stats()
    assert stats["delta_files"] > 0
    # cow holds exactly zero deltas
    assert cow.table_stats()["delta_files"] == 0


def test_mor_lineage_shape(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, B1), "b1", mode="mor")
    lin = t.merge(ev(spark, B2), "b2", mode="mor")
    assert lin["mode"] == "mor"
    assert lin["files_rewritten"] == 0 and lin["buckets_rewritten"] == 0
    # batch-local LWW collapses the two u1 events to one winner
    assert lin["upserts"] == 1 and lin["tombstones"] == 1
    assert lin["inserts"] is None and lin["stale_noops"] is None
    # the lineage TABLE carries the mor counters, nulls for cow-only
    row = {r.batch_id: r for r in t.lineage().collect()}["b2"]
    assert row.upserts == 1 and row.tombstones == 1 and row.inserts is None


def test_lookup_parity_including_tombstone_suppression(spark, tmpdir_path):
    cow, mor = _pair(spark, tmpdir_path)
    for k in ("u1", "u2", "u3", "absent"):
        a = sorted(tuple(r) for r in cow.lookup(k).collect())
        b = sorted(tuple(r) for r in mor.lookup(k).collect())
        assert a == b, k
    # u3 was tombstoned by a DELTA file while its base row survives on
    # disk — per-file tombstone filtering would resurrect it
    assert mor.lookup("u3").count() == 0


def test_lookup_spark_fallback_resolves(spark, tmpdir_path):
    mor = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    _apply(mor, spark, (B1, B2, B3), "mor")
    old = LakeTable.LOOKUP_DRIVER_MAX_FILES
    LakeTable.LOOKUP_DRIVER_MAX_FILES = 0  # force the scan path
    try:
        assert mor.lookup("u3").count() == 0
        assert [r.text for r in mor.lookup("u1").collect()] == ["a2"]
    finally:
        LakeTable.LOOKUP_DRIVER_MAX_FILES = old


def test_compact_folds_deltas(spark, tmpdir_path):
    cow, mor = _pair(spark, tmpdir_path)
    before = rows_of(mor)
    res = mor.compact_deltas()
    assert res["buckets"]
    assert mor.table_stats()["delta_files"] == 0
    assert rows_of(mor) == before == rows_of(cow)
    assert mor.validate(full=True)["ok"]
    # idempotent: nothing left to fold
    assert mor.compact_deltas()["buckets"] == []


def test_validate_full_on_dirty_table(spark, tmpdir_path):
    _, mor = _pair(spark, tmpdir_path)
    v = mor.validate(full=True)
    assert v["ok"], v["issues"]


def test_mixed_modes_commute(spark, tmpdir_path):
    cow = LakeTable.create(spark, os.path.join(tmpdir_path, "a"), SCHEMA, n_buckets=4)
    _apply(cow, spark, (B1, B2, B3), "cow")
    mix = LakeTable.create(spark, os.path.join(tmpdir_path, "b"), SCHEMA, n_buckets=4)
    mix.merge(ev(spark, B1), "b0", mode="mor")
    mix.merge(ev(spark, B2), "b1", mode="cow")  # CoW over a dirty table
    mix.merge(ev(spark, B3), "b2", mode="mor")
    assert rows_of(cow) == rows_of(mix)


def test_mor_replay_is_fenced(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, B1), "b1", mode="mor")
    snap = t.current_snapshot_id()
    assert t.merge(ev(spark, B1), "b1", mode="mor") == {}
    assert t.current_snapshot_id() == snap


def test_changes_parity_all_ranges(spark, tmpdir_path):
    cow, mor = _pair(spark, tmpdir_path)
    for rng in ((0, 1), (1, 2), (2, 3), (1, 3), (0, 3)):
        for pre in (False, True):
            a = sorted(
                tuple(r) for r in cow.changes(*rng, with_preimages=pre).collect()
            )
            b = sorted(
                tuple(r) for r in mor.changes(*rng, with_preimages=pre).collect()
            )
            assert a == b, (rng, pre)


def test_changes_stale_delta_is_silent(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, B1), "b0", mode="mor")
    t.merge(ev(spark, [(0, "U", "u1", T(0), "very-stale")]), "b1", mode="mor")
    assert t.changes(1, 2).count() == 0
    assert sorted(r.text for r in t.read().collect()) == ["a", "b", "c"]


def test_order_pruned_read_parity_on_dirty_table(spark, tmpdir_path):
    """Windowed reads (order_min/order_max file skipping) on a MoR-dirty
    table must equal the CoW twin: a delta file whose newer version or
    tombstone shadows an in-window base row must never be pruned away
    (pruning before LWW resolution would resurrect the stale base row —
    the r5 ADVICE latent bug). Buckets holding delta files are exempt
    from order pruning; clean buckets keep metrics skipping."""
    # base at T(1); the delta rewrites u1 far in the future and
    # tombstones u2 far in the future — a read windowed to [T(0),T(10)]
    # must see NEITHER the stale u1 base row NOR the deleted u2.
    upd = [(4, "U", "u1", T(10**6), "late-win"), (5, "D", "u2", T(10**6), None)]
    out = {}
    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, os.path.join(tmpdir_path, mode), SCHEMA, n_buckets=4
        )
        t.merge(ev(spark, B1), "b0")
        t.merge(ev(spark, upd), "b1", mode=mode)
        out[mode] = sorted(
            (r["url"], r["warc_ts"], r["text"])
            for r in t.read(order_min=T(0), order_max=T(10))
            .filter((F.col("warc_ts") >= T(0)) & (F.col("warc_ts") <= T(10)))
            .collect()
        )
    assert out["mor"] == out["cow"] == [("u3", T(1), "c")]


def test_time_travel_reads_resolve_per_snapshot(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    _apply(t, spark, (B1, B2, B3), "mor")
    assert sorted(r.url for r in t.read(snapshot_id=1).collect()) == ["u1", "u2", "u3"]
    assert {r.url: r.text for r in t.read(snapshot_id=2).collect()} == {
        "u1": "a2", "u3": "c"
    }
    # U for a never-seen key upserts (u9), same as the CoW semantics
    assert {r.url: r.text for r in t.read(snapshot_id=3).collect()} == {
        "u1": "a2", "u2": "b2", "u9": "ghost"
    }


def test_gc_tombstones_folds_shadowing_deltas(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, B1), "b0", mode="mor")
    t.merge(ev(spark, [(4, "D", "u1", T(5), None)]), "b1", mode="mor")
    assert sorted(r.url for r in t.read().collect()) == ["u2", "u3"]
    # expiring the delta tombstone must NOT resurrect u1's base row
    t.gc_tombstones(older_than=T(100))
    assert sorted(r.url for r in t.read().collect()) == ["u2", "u3"]
    assert t.validate(full=True)["ok"]


def test_schema_evolution_with_deltas(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=4)
    t.merge(ev(spark, B1), "b0", mode="mor")
    t.alter_add_column("lang", "string")
    rows = [(10, "U", "u1", T(5), "a3", "en")]
    df = spark.createDataFrame(rows, EV_DDL + ", lang string")
    t.merge(df, "b1", mode="mor")
    got = {r.url: (r.text, r.lang) for r in t.read().collect()}
    # pre-DDL rows (base AND resolution path) read lang as null
    assert got == {"u1": ("a3", "en"), "u2": ("b", None), "u3": ("c", None)}


# ---------------------------------------------------------------------------
# property: CoW and MoR converge to the same logical state for ANY
# event sequence and ANY batch split (the MoR analog of the replay
# property in test_properties.py)
# ---------------------------------------------------------------------------

_op = st.sampled_from(["I", "U", "D"])
_url = st.sampled_from(["u1", "u2", "u3", "u4", "u5"])
_events = st.lists(
    st.tuples(_op, _url, st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=24,
)


@given(_events, st.integers(min_value=1, max_value=4), st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_cow_mor_parity(spark, tmpdir_path, events, n_batches, fold):
    import shutil
    import tempfile

    rows = [
        (i, op, url, T(ts), None if op == "D" else f"{url}@{ts}#{i}")
        for i, (op, url, ts) in enumerate(events)
    ]
    step = len(rows) // n_batches + 1
    d = tempfile.mkdtemp(prefix="mor-prop-", dir=tmpdir_path)
    try:
        tabs = []
        for m, sub in (("cow", "a"), ("mor", "b")):
            t = LakeTable.create(
                spark, os.path.join(d, sub), SCHEMA, n_buckets=4
            )
            for b in range(n_batches):
                chunk = rows[b * step:(b + 1) * step]
                if chunk:
                    t.merge(ev(spark, chunk), f"b{b}", mode=m)
            tabs.append(t)
        cow, mor = tabs
        if fold:
            mor.compact_deltas()
        assert rows_of(cow) == rows_of(mor)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_join_and_groupby_resolution_agree(spark, tmpdir_path):
    """The stats-driven join path (tiny delta on a big base: anti/semi
    on the delta key set, untouched rows bypass resolution) and the
    full groupBy path must produce identical rows. The fixture's
    delta/base ratio is above the production threshold, so the path is
    forced by widening MOR_JOIN_RESOLVE_RATIO."""
    t = LakeTable.create(spark, tmpdir_path, SCHEMA, n_buckets=2)
    base = [(i, "I", f"u{i}", T(i), f"v{i}") for i in range(40)]
    t.merge(ev(spark, base), "b0")  # CoW base files
    delta = [(100, "U", "u3", T(100), "v3b"), (101, "D", "u7", T(100), None),
             (102, "I", "u99", T(100), "new"), (103, "U", "u5", T(0), "stale")]
    t.merge(ev(spark, delta), "b1", mode="mor")

    old = LakeTable.MOR_JOIN_RESOLVE_RATIO
    try:
        LakeTable.MOR_JOIN_RESOLVE_RATIO = 0.0  # force groupBy path
        via_group = rows_of(t)
        LakeTable.MOR_JOIN_RESOLVE_RATIO = 1.0  # force join path
        via_join = rows_of(t)
    finally:
        LakeTable.MOR_JOIN_RESOLVE_RATIO = old
    assert via_group == via_join
    got = {r[0]: r[2] for r in via_join}
    assert got["u3"] == "v3b" and "u7" not in got
    assert got["u99"] == "new" and got["u5"] == "v5"  # stale delta lost
