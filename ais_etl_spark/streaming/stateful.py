"""Custom stateful streaming operators.

The merge-based ingest (streaming/ingest.py) keeps long-term LWW state
in the target table itself — the 10^10-key-safe design. This module is
the OTHER point in the design space: state-store-resident operators
for low-latency views where the working key set fits the state store
(hot-key dashboards, routing tables):

- :func:`stateful_lww_stream` — cross-batch LWW via
  ``applyInPandasWithState``: per url, the state holds the current
  winner (warc_ts, event_id, op); each micro-batch emits only keys
  whose winner CHANGED (a changelog stream). This is the Spark analog
  of the reference's version-keyed recompute cache
  (/root/reference/transformers/tar2tf/src/cached.go:50-78) kept as
  resident state rather than a table.
- :func:`windowed_event_counts` — watermarked tumbling-window op
  counts (late events beyond the watermark are dropped by contract —
  the bounded-lateness leg; unbounded-lateness correctness lives in
  the merge path).

Scale notes: state is partitioned by the grouping key across
executors (HDFS/RocksDB-backed state store), so memory scales with
*keys resident per executor*, not events; the changelog output keeps
downstream IO proportional to change rate, not key count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LWW_STATE_SCHEMA = "warc_ts_us long, event_id long, op string"
LWW_OUT_SCHEMA = (
    "url string, warc_ts timestamp, event_id long, op string, changed boolean"
)


def _lww_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Per-key reducer: fold this batch's events into the stored
    winner; emit one row iff the winner changed. Ordering matches the
    engine's LWW contract: (warc_ts, event_id) lexicographic.

    TTL eviction (``stateful_lww_stream(ttl=...)``): a timed-out key
    simply DROPS its state and emits nothing — the key's durable truth
    lives in the lake table, this state is only the hot cache, so
    eviction is always safe and state size tracks the ACTIVE key set,
    not the 10^10-key cardinality. A re-appearing key re-seeds from
    its next event; a stale re-seed surfaces as an extra changelog row
    (at-least-once changelog, exact table — the documented trade)."""
    if state.hasTimedOut:
        state.remove()
        return
    import numpy as np

    if state.exists:
        cur_us, cur_eid, cur_op = state.get
    else:
        cur_us, cur_eid, cur_op = None, None, None
    best = (cur_us, cur_eid, cur_op)
    for pdf in pdfs:
        if pdf.empty:
            continue
        # vectorized lexicographic max over (warc_ts, event_id): a hot
        # key receiving 10^5 events in one micro-batch reduces in two
        # numpy passes, not an interpreted per-row fold (VERDICT r4 #2;
        # parity + hot-key timing case in tests/test_stateful.py)
        us = (pdf["warc_ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
              // 1000)
        eid = pdf["event_id"].to_numpy(dtype=np.int64)
        top = np.lexsort((eid, us))[-1]
        cand = (int(us[top]), int(eid[top]), pdf["op"].iloc[top])
        if best[0] is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    changed = best[0] is not None and (best[0], best[1]) != (cur_us, cur_eid)
    if changed:
        state.update(best)
    if ttl_ms is not None and (changed or state.exists):
        state.setTimeoutDuration(ttl_ms)
    if changed:
        yield pd.DataFrame(
            {
                "url": [key[0]],
                "warc_ts": [pd.Timestamp(best[0], unit="us")],
                "event_id": [best[1]],
                "op": [best[2]],
                "changed": [True],
            }
        )


def stateful_lww_stream(events: DataFrame, ttl: str | None = None) -> DataFrame:
    """Streaming changelog of per-url LWW winners. ``events`` must be
    a streaming DataFrame with (url, warc_ts, event_id, op).

    ``ttl`` (e.g. ``"30 minutes"``): processing-time state eviction for
    idle keys — the bounded-state mode for unbounded key cardinality
    (state tracks the ACTIVE set; the table holds the durable truth;
    see _lww_update's docstring for the re-seed trade). Trigger
    interaction: with a TTL the engine schedules empty micro-batches
    to service future timeouts, so ``availableNow`` will NOT
    self-terminate — run the TTL mode under a long-lived
    ``processingTime`` trigger (its intended shape)."""
    ttl_ms = None
    if ttl is not None:
        qty, unit = ttl.split()
        ttl_ms = int(qty) * {
            "ms": 1, "milliseconds": 1, "second": 1000, "seconds": 1000,
            "minute": 60_000, "minutes": 60_000, "hour": 3_600_000,
            "hours": 3_600_000,
        }[unit]

    def update(key, pdfs, state):
        return _lww_update(key, pdfs, state, ttl_ms)

    return (
        events.select("url", "warc_ts", "event_id", "op")
        .groupBy("url")
        .applyInPandasWithState(
            update,
            outputStructType=LWW_OUT_SCHEMA,
            stateStructType=LWW_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window op counts — the streaming metrics
    feed. Late events beyond ``watermark_delay`` are dropped (bounded
    lateness; document + test, per SURVEY §2.3 late-data row).

    Distinct-url counting: exact ``count(DISTINCT)`` is not supported
    on streaming aggregations (AnalysisException), so the streaming
    path uses ``approx_count_distinct`` (HLL++, mergeable in the state
    store — the only formulation that scales to unbounded keys
    anyway); the batch path keeps the exact count as the oracle twin.
    """
    distinct_urls = (
        F.approx_count_distinct("url") if events.isStreaming
        else F.countDistinct("url")
    )
    return (
        events.withWatermark("warc_ts", watermark_delay)
        .groupBy(F.window("warc_ts", window_duration).alias("win"), F.col("op"))
        .agg(
            F.count("*").alias("n_events"),
            distinct_urls.alias("n_urls"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "n_urls",
        )
    )
