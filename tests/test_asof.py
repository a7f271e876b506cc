from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ais_etl_spark.operators.asof import asof_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def states(spark):
    rows = [
        ("a", ts("2026-01-01 00:00:00"), 1, "v1"),
        ("a", ts("2026-01-01 01:00:00"), 2, "v2"),
        ("a", ts("2026-01-01 02:00:00"), 3, "v3"),
        ("b", ts("2026-01-01 00:30:00"), 4, "w1"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, event_id long, val string"
    )


def test_asof_basic(spark, states):
    probes = spark.createDataFrame(
        [
            ("a", ts("2026-01-01 00:30:00"), 10),  # between v1 and v2 → v1
            ("a", ts("2026-01-01 01:00:00"), 11),  # equal ts → inclusive → v2
            ("a", ts("2026-01-01 05:00:00"), 12),  # after all → v3
            ("a", ts("2025-12-31 00:00:00"), 13),  # before all → null
            ("b", ts("2026-01-01 01:00:00"), 14),  # → w1
            ("c", ts("2026-01-01 01:00:00"), 15),  # unknown key → null
        ],
        "url string, pts timestamp, probe_id long",
    )
    out = {
        r["probe_id"]: r
        for r in asof_join(
            probes, states, key="url", probe_ts="pts", state_ts="warc_ts"
        ).collect()
    }
    assert len(out) == 6
    assert out[10]["val"] == "v1"
    assert out[11]["val"] == "v2"  # inclusive at equal timestamps
    assert out[12]["val"] == "v3"
    assert out[13]["val"] is None and out[13]["asof_ts"] is None
    assert out[14]["val"] == "w1"
    assert out[15]["val"] is None
    assert out[10]["asof_ts"] == ts("2026-01-01 00:00:00")


def test_asof_payload_subset(spark, states):
    probes = spark.createDataFrame(
        [("a", ts("2026-01-01 03:00:00"), 1)],
        "url string, pts timestamp, probe_id long",
    )
    out = asof_join(
        probes, states, key="url", probe_ts="pts", state_ts="warc_ts",
        payload_cols=["event_id"],
    )
    assert set(out.columns) == {"url", "pts", "probe_id", "asof_ts", "event_id"}
    assert out.collect()[0]["event_id"] == 3


def test_asof_null_payload_fields_stay_in_one_version(spark):
    """A matched state row with a NULL payload field must NOT inherit
    that field from an older state version — the whole matched row is
    one state version (single struct fill)."""
    states = spark.createDataFrame(
        [
            ("k", ts("2026-01-01 00:00:00"), 1, "old-val", "old-tag"),
            ("k", ts("2026-01-01 01:00:00"), 2, None, "new-tag"),  # val is NULL
        ],
        "url string, warc_ts timestamp, event_id long, val string, tag string",
    )
    probes = spark.createDataFrame(
        [("k", ts("2026-01-01 02:00:00"), 10)],
        "url string, pts timestamp, probe_id long",
    )
    row = asof_join(
        probes, states, key="url", probe_ts="pts", state_ts="warc_ts",
        payload_cols=["event_id", "val", "tag"],
    ).collect()[0]
    assert row.event_id == 2 and row.tag == "new-tag"
    assert row.val is None  # NOT "old-val" leaked from version 1
