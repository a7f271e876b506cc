"""sync_incremental: a downstream LakeTable maintained from the
upstream changelog must equal transform(src).filter(predicate)
recomputed from scratch at every step — including delete propagation,
predicate eviction, crash-retry (fence + cursor repair), and a
two-hop chain."""

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from ais_etl_spark.lake import LakeTable, read_cursor, sync_incremental
from ais_etl_spark.lake.sync import _cursor_path

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


def _rows(tbl):
    return {
        r["url"]: (r["lang"], r["n"]) for r in tbl.read().collect()
    }


def _mk(spark, tmpdir_path, name, schema=SCHEMA):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, name), schema, n_buckets=4
    )


def test_sync_tracks_source_with_deletes(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path, "src")
    dst = _mk(spark, tmpdir_path, "dst")
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    src.merge(ev([
        (1, "I", "u1", T(1), "en", 10),
        (2, "I", "u2", T(1), "fr", 20),
    ]), "b1")
    r = sync_incremental(src, dst)
    assert r["applied"] and r["from_snapshot"] is None
    assert _rows(dst) == _rows(src)

    # update + delete + insert, across TWO upstream commits, one sync
    src.merge(ev([(3, "U", "u1", T(2), "de", 11)]), "b2")
    src.merge(ev([
        (4, "D", "u2", T(3), None, None),
        (5, "I", "u3", T(3), "en", 30),
    ]), "b3")
    r = sync_incremental(src, dst)
    assert r["applied"] and r["from_snapshot"] == 1 and r["to_snapshot"] == 3
    assert _rows(dst) == _rows(src) == {"u1": ("de", 11), "u3": ("en", 30)}

    # upstream unchanged → no-op, no new snapshot
    before = dst.current_snapshot_id()
    r = sync_incremental(src, dst)
    assert not r["applied"] and dst.current_snapshot_id() == before


def test_sync_transform_and_predicate_eviction(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path, "src")
    # downstream carries a derived column, not the raw payload
    dst = _mk(spark, tmpdir_path, "dst", schema=[
        ("url", "string"), ("warc_ts", "timestamp"), ("n2", "bigint"),
    ])
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    def tf(df):
        return df.select("url", "warc_ts", (F.col("n") * 2).alias("n2"))

    src.merge(ev([
        (1, "I", "u1", T(1), "en", 10),
        (2, "I", "u2", T(1), "en", 1),     # fails predicate n2 >= 10
    ]), "b1")
    sync_incremental(src, dst, transform=tf, predicate="n2 >= 10")
    assert _rows_n2(dst) == {"u1": 20}

    # u1's update drops it below the bar → EVICTED downstream;
    # u2's update lifts it in
    src.merge(ev([
        (3, "U", "u1", T(2), "en", 3),
        (4, "U", "u2", T(2), "en", 50),
    ]), "b2")
    sync_incremental(src, dst, transform=tf, predicate="n2 >= 10")
    assert _rows_n2(dst) == {"u2": 100}

    # incremental result == from-scratch recompute of the definition
    fresh = _mk(spark, tmpdir_path, "fresh", schema=[
        ("url", "string"), ("warc_ts", "timestamp"), ("n2", "bigint"),
    ])
    sync_incremental(src, fresh, name="boot", transform=tf,
                     predicate="n2 >= 10")
    assert _rows_n2(dst) == _rows_n2(fresh)


def _rows_n2(tbl):
    return {r["url"]: r["n2"] for r in tbl.read().collect()}


def test_sync_crash_retry_is_exactly_once(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path, "src")
    dst = _mk(spark, tmpdir_path, "dst")
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    src.merge(ev([(1, "I", "u1", T(1), "en", 10)]), "b1")
    sync_incremental(src, dst)
    src.merge(ev([(2, "U", "u1", T(2), "en", 11)]), "b2")
    r1 = sync_incremental(src, dst)
    assert r1["applied"]

    # simulate a crash BETWEEN merge-commit and cursor publish: roll
    # the cursor back to the pre-sync snapshot and retry — the fence
    # must turn the replay into a no-op and the cursor must be repaired
    snap_after = dst.current_snapshot_id()
    with open(_cursor_path(dst, "default")) as fh:
        cur = json.load(fh)
    cur["src_snapshot"] = r1["from_snapshot"]
    with open(_cursor_path(dst, "default"), "w") as fh:
        json.dump(cur, fh)

    r2 = sync_incremental(src, dst)
    assert not r2["applied"]                       # fence caught replay
    assert r2["batch_id"] == r1["batch_id"]
    assert dst.current_snapshot_id() == snap_after  # no duplicate commit
    assert read_cursor(dst, "default")["src_snapshot"] == r1["to_snapshot"]
    assert _rows(dst) == {"u1": ("en", 11)}


def test_sync_order_tie_update_still_wins(spark, tmpdir_path):
    """An upstream update with the SAME order value as the previously
    synced row (ts tie, newer upstream event_id) must still win
    downstream: the sync seq is the source snapshot id, monotone
    across syncs — a hashed/random seq would lose this tie."""
    src = _mk(spark, tmpdir_path, "src")
    dst = _mk(spark, tmpdir_path, "dst")
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    src.merge(ev([(1, "I", "u1", T(1), "en", 10)]), "b1")
    sync_incremental(src, dst)
    # same warc_ts, higher event_id: upstream LWW winner flips to n=99
    src.merge(ev([(2, "U", "u1", T(1), "en", 99)]), "b2")
    sync_incremental(src, dst)
    assert _rows(src) == _rows(dst) == {"u1": ("en", 99)}
    # and a same-ts delete propagates too
    src.merge(ev([(3, "D", "u1", T(1), None, None)]), "b3")
    sync_incremental(src, dst)
    assert _rows(dst) == {}


def test_streaming_ingest_with_downstream_sync_hook(spark, tmpdir_path):
    """run_ingest(on_batch_applied=sync) keeps a silver projection in
    lockstep with the streaming ingest, one changelog delta per
    micro-batch — and survives kill/resume (the hook replays into the
    sync fence)."""
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.streaming import run_ingest, write_feed_chunks

    feed_dir = os.path.join(tmpdir_path, "feed")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    silver = _mk(spark, tmpdir_path, "silver", schema=[
        ("url", "string"), ("warc_ts", "timestamp"),
        ("lang", "string"), ("n_chars", "bigint"),
    ])

    def hook(table):
        sync_incremental(
            table, silver, name="hop",
            transform=lambda df: df.select(
                "url", "warc_ts", "lang",
                F.length("text").cast("bigint").alias("n_chars"),
            ),
            predicate="lang = 'en'",
        )

    feed = synth_cdc_feed(spark, n_events=1500, n_urls=200, seed=11).cache()
    write_feed_chunks(feed.filter("event_id < 900"), feed_dir, 2)
    bronze = run_ingest(
        spark, feed_dir, os.path.join(tmpdir_path, "bronze"), ckpt,
        on_batch_applied=hook,
    )
    assert silver.read().count() > 0

    # new segment lands; resume from the same checkpoint
    feed.filter("event_id >= 900").write.parquet(
        os.path.join(feed_dir, "chunk-late.parquet"))
    bronze = run_ingest(
        spark, feed_dir, os.path.join(tmpdir_path, "bronze"), ckpt,
        on_batch_applied=hook,
    )
    want = (
        bronze.read()
        .filter("lang = 'en'")
        .select("url", "warc_ts", "lang",
                F.length("text").cast("bigint").alias("n_chars"))
    )
    got = silver.read()
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
    feed.unpersist()


def test_sync_two_hop_chain(spark, tmpdir_path):
    """bronze → silver → gold: each hop is a LakeTable, so the
    changelog-driven sync composes; the leaf equals the composed
    definition after interleaved syncs."""
    bronze = _mk(spark, tmpdir_path, "bronze")
    silver = _mk(spark, tmpdir_path, "silver")
    gold = _mk(spark, tmpdir_path, "gold", schema=[
        ("url", "string"), ("warc_ts", "timestamp"), ("lang", "string"),
    ])
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    bronze.merge(ev([
        (1, "I", "u1", T(1), "en", 10),
        (2, "I", "u2", T(1), "fr", 2),
        (3, "I", "u3", T(1), "en", 1),
    ]), "b1")
    sync_incremental(bronze, silver, name="b2s", predicate="n >= 2")
    sync_incremental(
        silver, gold, name="s2g",
        transform=lambda df: df.select("url", "warc_ts", "lang"),
    )
    assert set(_rows(silver)) == {"u1", "u2"}
    assert {r["url"]: r["lang"] for r in gold.read().collect()} == {
        "u1": "en", "u2": "fr"
    }

    # upstream delete + eviction propagate through both hops
    bronze.merge(ev([
        (4, "D", "u1", T(2), None, None),
        (5, "U", "u2", T(2), "fr", 0),     # evicted at silver
        (6, "U", "u3", T(2), "en", 9),     # enters silver
    ]), "b2")
    sync_incremental(bronze, silver, name="b2s", predicate="n >= 2")
    sync_incremental(
        silver, gold, name="s2g",
        transform=lambda df: df.select("url", "warc_ts", "lang"),
    )
    assert set(_rows(silver)) == {"u3"}
    assert {r["url"] for r in gold.read().collect()} == {"u3"}


def test_sync_from_mor_upstream(spark, tmpdir_path):
    """A merge-on-read upstream feeds the same changelog a CoW one
    would: sync lanes track it across delta commits, a CoW commit on
    the dirty table, and a compaction fold (which must produce ZERO
    change rows — carried data, new layout)."""
    src = _mk(spark, tmpdir_path, "src")
    dst = _mk(spark, tmpdir_path, "dst")
    ev = lambda rows: spark.createDataFrame(rows, EV_DDL)  # noqa: E731

    src.merge(ev([
        (1, "I", "u1", T(1), "en", 10),
        (2, "I", "u2", T(1), "fr", 20),
    ]), "b1", mode="mor")
    sync_incremental(src, dst)
    assert _rows(dst) == _rows(src)

    src.merge(ev([(3, "U", "u1", T(2), "de", 11)]), "b2", mode="mor")
    src.merge(ev([(4, "D", "u2", T(3), None, None)]), "b3", mode="cow")
    r = sync_incremental(src, dst)
    assert r["applied"]
    assert _rows(dst) == _rows(src) == {"u1": ("de", 11)}

    # a pure fold moves the snapshot but changes no logical rows
    src.compact_deltas()
    sync_incremental(src, dst)
    assert _rows(dst) == _rows(src) == {"u1": ("de", 11)}
