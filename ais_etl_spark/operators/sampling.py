"""Deterministic hash-based sampling and dataset splitting.

A 100 TB training-data pipeline cannot use RNG-based ``df.sample``:
re-runs, retries, and incremental refreshes must pick the SAME rows
(reproducible ablations, stable train/val membership across dataset
versions). The standard trick is a keyed hash threshold — a row's
fate is a pure function of its key, independent of partitioning,
ordering, cluster size, or history.

Portability discipline (same as operators/dedup.py): the hash is md5
(bit-identical in DuckDB), consumed as the first 8 hex chars → a
uniform 32-bit integer — so every operator here transliterates to an
ANSI-SQL oracle exactly (``check_contract.py --diag``).

Reference parity: the reference has no sampling at all (objects are
processed exhaustively); this module is part of the
beyond-the-reference curation family (SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_SPACE = 1 << 32


def _key_u32(key_col, salt: str) -> "F.Column":
    """Uniform u32 from md5(salt ':' key) — F.conv parses the first 8
    hex chars (the same strpos-arithmetic integer the SQL oracle
    derives)."""
    h8 = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key_col.cast("string"))), 1, 8)
    return F.conv(h8, 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a row iff u32(md5(salt:key)) < rate·2³² — a deterministic
    ``rate``-fraction sample, stable under re-runs, repartitioning,
    and incremental appends (new rows get an independent fair draw;
    existing rows never flip). ``salt`` decouples independent samples
    over the same keys. Pure projection+filter: no shuffle, pushed to
    the scan where the source supports it."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HASH_SPACE)
    return df.filter(_key_u32(F.col(key_col), salt) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given
    weights (e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``) by
    bucketing the key hash into cumulative weight ranges. Properties a
    training pipeline needs: (a) deterministic — a doc's split never
    changes across runs or dataset versions; (b) disjoint and
    exhaustive; (c) no shuffle — one projection. Split names are
    assigned in sorted order so the mapping is independent of dict
    ordering."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _key_u32(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = F.lit(int(acc * _HASH_SPACE))
        expr = (
            F.when(u < bound, F.lit(name))
            if expr is None
            else expr.when(u < bound, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)
