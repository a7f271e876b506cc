"""Deterministic hash sampling / splitting (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from ais_etl_spark.operators.sampling import hash_sample, hash_split


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(400)], "doc_id long")


def _u32(salt, key):
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16)


def test_hash_sample_deterministic_and_matches_python(ids):
    got1 = {r["doc_id"] for r in hash_sample(ids, 0.3).collect()}
    got2 = {r["doc_id"] for r in hash_sample(ids, 0.3).collect()}
    assert got1 == got2  # re-run stable
    want = {i for i in range(400) if _u32("sample", i) < int(0.3 * (1 << 32))}
    assert got1 == want
    # approximate rate on 400 keys (binomial, generous bound)
    assert 0.15 <= len(got1) / 400 <= 0.45
    # nested property: a higher-rate sample contains the lower one
    bigger = {r["doc_id"] for r in hash_sample(ids, 0.6).collect()}
    assert got1 <= bigger
    # different salt = independent draw
    other = {r["doc_id"] for r in hash_sample(ids, 0.3, salt="other").collect()}
    assert other != got1
    with pytest.raises(ValueError):
        hash_sample(ids, 1.5)


def test_hash_split_disjoint_exhaustive_stable(ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"] for r in hash_split(ids, w).collect()}
    assert len(got) == 400 and set(got.values()) == {"train", "val", "test"}
    # python twin: identical accumulation order (sorted names)
    total = sum(w.values())
    names = sorted(w)
    bounds = []
    acc = 0.0
    for nm in names[:-1]:
        acc += w[nm] / total
        bounds.append((int(acc * (1 << 32)), nm))
    for i in range(400):
        u = _u32("split", i)
        want = next((nm for b, nm in bounds if u < b), names[-1])
        assert got[i] == want, i
    # membership is stable under repartitioning
    got2 = {r["doc_id"]: r["split"]
            for r in hash_split(ids.repartition(7), w).collect()}
    assert got2 == got
