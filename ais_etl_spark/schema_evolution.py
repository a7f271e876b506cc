"""Schema-evolution event replay (north_rule: add/rename column events
replayed via table schema updates WITHOUT data rewrite).

A schema event is a control record interleaved with the data feed::

    {"fence_event_id": 5000, "kind": "add_column",
     "col_name": "quality", "col_type": "double"}
    {"fence_event_id": 9000, "kind": "rename_column",
     "col_name": "quality", "new_name": "quality_score"}

Ordering contract: the event takes effect before any data event with
``event_id >= fence_event_id`` is applied (a fence, like binlog DDL
statements ordered within the WAL). Replay is idempotent BY FENCE ID:
each applied fence_event_id is recorded durably in the table commit
(the binlog-GTID analog), so streaming epoch re-delivery after a crash
skips exactly the events already applied. Shape inspection ("is the
column already there?") is only a fallback for fences applied by
pre-fence-tracking code — it is ambiguous under chains like
add→widen→rename, where the renamed column makes a replayed add look
unapplied.

The reference has no schema system at all (SURVEY §1.1: schemaless
bytes, structure discovered at runtime); this module is where our
engine's explicit schema-as-data discipline replaces that.
"""

from __future__ import annotations

from ais_etl_spark.lake import LakeTable


def apply_schema_event(table: LakeTable, ev: dict) -> bool:
    """Apply one event if not already applied. Returns True if applied.

    Idempotency is decided by ``fence_event_id`` against the table's
    durable ``applied_fences`` set first; the schema-shape checks only
    guard fences from pre-tracking history (and genuinely no-op events
    like renaming a column that never existed)."""
    kind = ev["kind"]
    fence = ev.get("fence_event_id")
    if fence is not None and fence in table.applied_fences():
        return False  # exactly-once by fence id — crash-replay safe
    names = {c["name"] for c in table.schema_cols()}
    if kind == "add_column":
        if ev["col_name"] in names:
            return False
        table.alter_add_column(ev["col_name"], ev["col_type"], fence_id=fence)
        return True
    if kind == "rename_column":
        if ev["new_name"] in names or ev["col_name"] not in names:
            return False  # already renamed (or never existed)
        table.alter_rename_column(ev["col_name"], ev["new_name"], fence_id=fence)
        return True
    if kind == "widen_column":
        cur = {c["name"]: c["type"].lower() for c in table.schema_cols()}
        if cur.get(ev["col_name"]) == ev["col_type"].lower():
            return False  # already widened (idempotent replay)
        table.alter_widen_column(ev["col_name"], ev["col_type"], fence_id=fence)
        return True
    if kind == "drop_column":
        if ev["col_name"] not in names:
            return False  # already dropped
        table.alter_drop_column(ev["col_name"], fence_id=fence)
        return True
    raise ValueError(f"unknown schema event kind {kind!r}")


def apply_due_schema_events(
    table: LakeTable, events: list[dict], fence_hi: int
) -> int:
    """Apply, in fence order, every event with fence_event_id <= fence_hi.
    Returns how many were (newly) applied."""
    n = 0
    for ev in sorted(events, key=lambda e: e["fence_event_id"]):
        if ev["fence_event_id"] <= fence_hi and apply_schema_event(table, ev):
            n += 1
    return n
