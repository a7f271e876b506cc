"""Archive operators: member-wise map over tar payloads and
manifest-driven fan-out/fan-in assembly.

Reference parity:
- ``explode_tar`` / member-wise processing ≙ face_detection's tar
  dispatch: untar → transform image members, pass others through →
  re-tar (/root/reference/transformers/face_detection/
  fastapi_server.py:112-146,161-180).
- ``assemble_tar`` ≙ audio_manager's fan-out/fan-in: JSONL manifest →
  per-line fetch+transform → stream members into ONE tar, skipping and
  counting invalid lines (/root/reference/NeMo/.../audio_manager/
  fastapi_server.py:101-119,140-210).

Spark shapes:
- explode: one row per member via ``mapInPandas`` (iterator form — one
  Arrow batch resident per task, the transform_stream bound-memory
  analog).
- assemble: ``groupBy(group).applyInPandas`` building each archive
  from its sorted members — the shuffle routes members to their
  archive's task; group count = archive count, so a hot archive is one
  task (bound archives to ~thousands of members; the reference holds
  the same bound, one member in memory at a time).
- invalid-member policy: skipped + counted into a ``skipped`` column
  (the dead-letter/metrics row analog of audio_manager's counters).

Determinism: tar entries get fixed mtime=0, uid/gid=0, sorted member
order — byte-identical archives across runs/executors (replay bar).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXPLODE_SCHEMA = (
    "archive_id string, member_name string, member_bytes binary, member_size long"
)
ASSEMBLE_SCHEMA = "group_id string, tar binary, n_members int, skipped int"


def tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic tar from (name, payload) pairs (sorted by name,
    zeroed metadata)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in sorted(members, key=lambda m: m[0]):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def untar_bytes(data: bytes) -> list[tuple[str, bytes]]:
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        out = []
        for m in tf.getmembers():
            if m.isfile():
                out.append((m.name, tf.extractfile(m).read()))
        return out


def explode_tar(
    df: DataFrame, id_col: str = "archive_id", payload_col: str = "payload"
) -> DataFrame:
    """One output row per archive member (file entries only).
    Corrupt archives yield a single row with null member_name —
    quarantine rows, not task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"archive_id": [], "member_name": [], "member_bytes": [],
                    "member_size": []}
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    members = untar_bytes(bytes(payload))
                except tarfile.TarError:
                    rows["archive_id"].append(aid)
                    rows["member_name"].append(None)
                    rows["member_bytes"].append(None)
                    rows["member_size"].append(-1)
                    continue
                for name, data in members:
                    rows["archive_id"].append(aid)
                    rows["member_name"].append(name)
                    rows["member_bytes"].append(data)
                    rows["member_size"].append(len(data))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=EXPLODE_SCHEMA)


def assemble_tar(
    df: DataFrame,
    group_col: str = "group_id",
    name_col: str = "member_name",
    payload_col: str = "member_bytes",
) -> DataFrame:
    """Fan-in: one deterministic tar per group. Rows with null name or
    payload are skipped and counted (audio_manager's skip-and-count
    error policy)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        members, skipped = [], 0
        for name, payload in zip(pdf[name_col], pdf[payload_col]):
            if name is None or payload is None:
                skipped += 1
                continue
            members.append((str(name), bytes(payload)))
        return pd.DataFrame(
            {
                "group_id": [str(pdf[group_col].iloc[0])],
                "tar": [tar_bytes(members)],
                "n_members": [len(members)],
                "skipped": [skipped],
            }
        )

    return df.groupBy(group_col).applyInPandas(build, schema=ASSEMBLE_SCHEMA)
