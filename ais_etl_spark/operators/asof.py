"""As-of (point-in-time) join — "what was the page state when X
happened?" — the natural query companion of a CDC table.

Spark has no ASOF JOIN; a naive formulation is a range join
(``l.url = r.url AND r.warc_ts <= l.ts`` + argmax) whose inner
inequality explodes into BroadcastNestedLoop or an O(n·m) sort-merge
range scan per key. The scalable formulation used here is the
union-sort trick:

    tag right rows (1) and probe rows (0) → union → ONE shuffle on the
    key → per-key sort by (ts, tag) → ``last(payload, ignorenulls)``
    over rows-unbounded-preceding → keep probe rows.

Cost = one shuffle + one per-key sort, linear in |probes| + |events| —
the same shape Flink's temporal join and DuckDB's native ASOF use.
Equal timestamps: the right row sorts BEFORE the probe (tag 1 < tag 0
is not used — see ``_TAG`` ordering below), i.e. a state change at
exactly t is visible to a probe at t (inclusive semantics, matching
DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

Right-side rows must be unique per (key, ts) for determinism — callers
dedup first (LWW on the tiebreak), as the contract query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# right rows get tag 0, probes tag 1 → at equal ts the right row sorts
# first and is therefore visible to the probe (inclusive match)
_TAG = "_asof_tag"


def asof_join(
    probes: DataFrame,
    states: DataFrame,
    key: str = "url",
    probe_ts: str = "ts",
    state_ts: str = "warc_ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row, attach the latest state row with
    ``state_ts <= probe_ts`` (per key); nulls when no state precedes.

    Output: probe columns + ``asof_ts`` + payload columns.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in states.columns if c not in (key, state_ts)
        ]
    probe_cols = [c for c in probes.columns if c not in (key, probe_ts)]

    s = states.select(
        F.col(key),
        F.col(state_ts).alias("_ts"),
        F.lit(0).alias(_TAG),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}") for c in probe_cols],
    )
    p = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(states.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    u = s.unionByName(p)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE last(ignorenulls) over a struct of (ts + all payload columns):
    # the matched row is a single state version even when payload fields
    # are NULL — per-column fills would let a NULL field inherit from an
    # OLDER state row (diverging from ASOF JOIN semantics).
    state_struct = F.when(
        F.col(_TAG) == 0,
        F.struct(
            F.col("_ts").alias("asof_ts"),
            *[F.col(c) for c in payload_cols],
        ),
    )
    filled = u.select(
        F.col(key),
        F.col("_ts"),
        F.col(_TAG),
        F.last(state_struct, ignorenulls=True).over(w).alias("_w"),
        *[F.col(f"_p_{c}") for c in probe_cols],
    )
    return filled.filter(F.col(_TAG) == 1).select(
        F.col(key),
        F.col("_ts").alias(probe_ts),
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        F.col("_w.asof_ts").alias("asof_ts"),
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
    )
