"""MaterializedAggregate: incremental view maintenance from the
changelog must equal a from-scratch recompute at every step —
including group-moving updates, deletes that empty a group, and NULL
group values."""

import datetime as dt
import os

from pyspark.sql import functions as F

from ais_etl_spark.lake import LakeTable, MaterializedAggregate

SCHEMA = [
    ("url", "string"), ("warc_ts", "timestamp"),
    ("lang", "string"), ("n", "bigint"),
]
EV_DDL = (
    "event_id bigint, op string, url string, warc_ts timestamp, "
    "lang string, n bigint"
)


def T(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def _view_rows(mv):
    return {
        r["lang"]: (r["n_rows"], r["sum_n"]) for r in mv.read().collect()
    }


def _assert_equals_recompute(spark, mv, tbl, tmpdir_path, tag):
    fresh = MaterializedAggregate.create(
        spark, os.path.join(tmpdir_path, f"recompute-{tag}"), tbl,
        group_cols=["lang"], sum_cols=["n"],
    )
    assert _view_rows(mv) == _view_rows(fresh)


def test_incremental_refresh_equals_recompute(spark, tmpdir_path):
    tbl = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA, n_buckets=4
    )
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    tbl.merge(ev([
        (1, "I", "u1", T(1), "en", 10),
        (2, "I", "u2", T(1), "en", 20),
        (3, "I", "u3", T(1), "fr", 5),
        (4, "I", "u4", T(1), None, 7),       # NULL is a real group
    ]), "b1")
    mv = MaterializedAggregate.create(
        spark, os.path.join(tmpdir_path, "mv"), tbl,
        group_cols=["lang"], sum_cols=["n"],
    )
    assert _view_rows(mv) == {"en": (2, 30), "fr": (1, 5), None: (1, 7)}

    # batch 2: group-moving update (u2 en→de), in-group update (u3),
    # delete (u4 — empties the null group), new insert (u5)
    tbl.merge(ev([
        (5, "U", "u2", T(2), "de", 21),
        (6, "U", "u3", T(2), "fr", 6),
        (7, "D", "u4", T(2), None, None),
        (8, "I", "u5", T(2), "en", 1),
    ]), "b2")
    res = mv.refresh(tbl)
    assert res["version"] == 1
    got = _view_rows(mv)
    assert got == {"en": (2, 11), "de": (1, 21), "fr": (1, 6)}
    assert None not in got  # zero-count group dropped
    _assert_equals_recompute(spark, mv, tbl, tmpdir_path, "b2")

    # batch 3: resurrection + another delete, across TWO snapshots
    # before one refresh (delta spans multiple commits)
    tbl.merge(ev([(9, "I", "u4", T(3), "fr", 2)]), "b3")
    tbl.merge(ev([(10, "D", "u5", T(4), None, None)]), "b4")
    mv.refresh(tbl)
    assert _view_rows(mv) == {"en": (1, 10), "de": (1, 21), "fr": (2, 8)}
    _assert_equals_recompute(spark, mv, tbl, tmpdir_path, "b4")

    # no table movement → no-op, same version
    v = mv.meta()["version"]
    res = mv.refresh(tbl)
    assert res["version"] == v
    assert mv.meta()["version"] == v

    # reload from disk sees the same state
    again = MaterializedAggregate.load(spark, os.path.join(tmpdir_path, "mv"))
    assert _view_rows(again) == _view_rows(mv)


def test_refresh_survives_compaction_noise(spark, tmpdir_path):
    """Compaction rewrites files without changing row versions — the
    changelog emits nothing for carried rows, so a refresh across a
    compaction commit must be a pure no-op on the view's values."""
    tbl = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA, n_buckets=4
    )
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731
    tbl.merge(ev([(1, "I", "u1", T(1), "en", 10)]), "b1")
    tbl.merge(ev([(2, "I", "u2", T(2), "en", 20)]), "b2")
    mv = MaterializedAggregate.create(
        spark, os.path.join(tmpdir_path, "mv"), tbl,
        group_cols=["lang"], sum_cols=["n"],
    )
    tbl.compact()
    tbl.merge(ev([(3, "I", "u3", T(3), "fr", 1)]), "b3")
    mv.refresh(tbl)
    assert _view_rows(mv) == {"en": (2, 30), "fr": (1, 1)}
