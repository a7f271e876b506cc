"""Streaming health/readiness introspection.

The reference exposes per-pod liveness/readiness probes and ETL init
timeouts (transformers/echo/etl_spec.yaml:27-29, md5/pod.yaml:24-27);
the Spark-native analog is a ``StreamingQueryListener`` that turns the
engine's own progress events into health facts: input rate, batch
duration, state-store size, and a staleness verdict. Task-level
timeouts live in the session factory (``spark.task.maxFailures``,
``spark.network.timeout`` — see session.py).

Usage::

    listener = HealthListener(jsonl_path=".../health.jsonl")
    spark.streams.addListener(listener)
    ... run queries ...
    listener.snapshot()   # -> dict per query: healthy?, lag, rates
"""

from __future__ import annotations

import json
import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class HealthListener(StreamingQueryListener):
    """Collects per-batch progress for every streaming query on the
    session. Driver-side and O(1) per batch — safe at any scale.

    ``snapshot()`` returns, per query id: last batch id, cumulative
    input rows, last batch duration, seconds since last progress, and
    ``healthy`` (made progress within ``stale_after_s`` and not
    terminated by an exception). With ``jsonl_path`` each progress
    event is also appended as one JSON line (scrape target for an
    external prober — the pod-probe analog)."""

    def __init__(self, jsonl_path: str | None = None, stale_after_s: float = 300.0):
        self._lock = threading.Lock()
        self._state: dict[str, dict] = {}
        self.jsonl_path = jsonl_path
        self.stale_after_s = stale_after_s

    # -- listener callbacks (called from Spark's listener bus thread) --

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._state[str(event.id)] = {
                "name": event.name,
                "started_at": time.time(),
                "last_progress_at": None,
                "batches": 0,
                "input_rows": 0,
                "last_batch_duration_ms": None,
                "state_rows": None,
                "terminated": False,
                "exception": None,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
        }
        with self._lock:
            st = self._state.setdefault(str(p.id), {"batches": 0, "input_rows": 0})
            st["last_progress_at"] = time.time()
            st["batches"] = st.get("batches", 0) + 1
            st["input_rows"] = st.get("input_rows", 0) + (p.numInputRows or 0)
            st["last_batch_duration_ms"] = (p.durationMs or {}).get("triggerExecution")
            st["state_rows"] = rec["state_rows"]
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:
        with self._lock:
            st = self._state.get(str(event.id))
            if st is not None:
                st["last_progress_at"] = time.time()

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            st = self._state.setdefault(str(event.id), {})
            st["terminated"] = True
            st["exception"] = event.exception

    # -- probe surface --

    def snapshot(self) -> dict[str, dict]:
        now = time.time()
        out = {}
        with self._lock:
            for qid, st in self._state.items():
                # no progress yet → measure staleness from query start,
                # so a query that wedges before its first batch (the
                # init-timeout case the probe is modeled on) goes
                # unhealthy after stale_after_s instead of never
                last = st.get("last_progress_at") or st.get("started_at")
                stale = last is not None and (now - last) > self.stale_after_s
                out[qid] = {
                    **st,
                    "healthy": st.get("exception") is None and not stale,
                }
        return out
