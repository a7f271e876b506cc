"""TFRecord output for sample groups (the tar2tf record-format target).

Reference semantics being re-expressed: tar2tf converts a tar of
samples into a TFRecord of ``tf.train.Example`` protos and serves BYTE
RANGES of the produced record
(/root/reference/transformers/tar2tf/src/main.go:129-198,
src/transforms/job.go:166-188: SampleToTFExampleReader adds each
sample key as a bytes feature).

No tensorflow dependency: both wire formats are tiny and fixed, so
they are hand-rolled and unit-verified:

- ``tf.train.Example`` protobuf: Example{features:{feature: map<str,
  Feature{bytes_list:{value:[bytes]}}}} — length-delimited protobuf
  fields with varint lengths; map keys emitted in sorted order for
  byte determinism.
- TFRecord framing: length (uint64 LE) + masked crc32c(length) +
  payload + masked crc32c(payload), crc32c = Castagnoli, mask =
  ((c >> 15 | c << 17) + 0xa282ead8) mod 2^32.

Spark shape: sample rows are grouped into one TFRecord blob per
output object via ``groupBy().applyInPandas`` (the same fan-in bound
as the tar assembler); byte-range serving is a pure built-in
``substring`` over the binary column.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# crc32c (Castagnoli, table-driven) + TFRecord masking
# ---------------------------------------------------------------------------

_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal tf.train.Example encoder (bytes features only, like tar2tf)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _ld(field_no: int, payload: bytes) -> bytes:
    """Length-delimited protobuf field (wire type 2)."""
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def tf_example_bytes(features: dict[str, bytes]) -> bytes:
    """Serialize {name: value} as a tf.train.Example proto. Keys are
    emitted sorted — protobuf map order is unspecified, so we pin it
    for byte-deterministic replay."""
    entries = b""
    for name in sorted(features):
        bytes_list = _ld(1, features[name])           # BytesList.value
        feature = _ld(1, bytes_list)                  # Feature.bytes_list
        entry = _ld(1, name.encode()) + _ld(2, feature)  # map key/value
        entries += _ld(1, entry)                      # Features.feature
    return _ld(1, entries)                            # Example.features


def tfrecord_frame(example: bytes) -> bytes:
    """One TFRecord: len + masked_crc(len) + data + masked_crc(data)."""
    hdr = struct.pack("<Q", len(example))
    return (
        hdr
        + struct.pack("<I", _masked_crc(hdr))
        + example
        + struct.pack("<I", _masked_crc(example))
    )


def read_tfrecord_bytes(blob: bytes) -> list[bytes]:
    """Parse a TFRecord stream back to raw example payloads, verifying
    both CRCs (corruption surfaces as ValueError, the reference's
    invalid-msg path)."""
    out, i = [], 0
    while i < len(blob):
        (n,) = struct.unpack_from("<Q", blob, i)
        (hc,) = struct.unpack_from("<I", blob, i + 8)
        if hc != _masked_crc(blob[i : i + 8]):
            raise ValueError(f"tfrecord header crc mismatch at {i}")
        data = blob[i + 12 : i + 12 + n]
        (dc,) = struct.unpack_from("<I", blob, i + 12 + n)
        if dc != _masked_crc(data):
            raise ValueError(f"tfrecord data crc mismatch at {i}")
        out.append(data)
        i += 16 + n
    return out


def parse_tf_example(example: bytes) -> dict[str, bytes]:
    """Decode the subset of tf.train.Example this module writes
    (bytes features) — the read leg of the roundtrip."""

    def rd_varint(buf: bytes, i: int) -> tuple[int, int]:
        n = shift = 0
        while True:
            b = buf[i]
            n |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                return n, i
            shift += 7

    def fields(buf: bytes):
        i = 0
        while i < len(buf):
            tag, i = rd_varint(buf, i)
            assert tag & 7 == 2, "only length-delimited fields expected"
            ln, i = rd_varint(buf, i)
            yield tag >> 3, buf[i : i + ln]
            i += ln

    out: dict[str, bytes] = {}
    for _, features in fields(example):          # Example.features
        for _, entry in fields(features):        # Features.feature (map)
            name, feature = None, None
            for fno, val in fields(entry):
                if fno == 1:
                    name = val.decode()
                else:
                    feature = val
            for _, bytes_list in fields(feature):    # Feature.bytes_list
                for _, value in fields(bytes_list):  # BytesList.value
                    out[name] = value
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def samples_to_tfrecords(
    df: DataFrame,
    group_col: str = "group_id",
    name_col: str = "member_name",
    payload_col: str = "member_bytes",
    order_col: str | None = None,
) -> DataFrame:
    """Fan-in: one TFRecord blob per group — each row becomes one
    Example with features {"__key__": name, "data": payload} (tar2tf's
    sample→Example mapping). Rows are framed in ``order_col`` (default
    name) order for byte determinism. Output: (group_id, tfrecord,
    n_examples, tfrecord_size)."""
    order_by = order_col or name_col

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        blob = bytearray()
        n = 0
        for name, payload in zip(pdf[name_col], pdf[payload_col]):
            if name is None or payload is None:
                continue
            ex = tf_example_bytes(
                {"__key__": str(name).encode(), "data": bytes(payload)}
            )
            blob += tfrecord_frame(ex)
            n += 1
        return pd.DataFrame(
            {
                "group_id": [str(pdf[group_col].iloc[0])],
                "tfrecord": [bytes(blob)],
                "n_examples": [n],
                "tfrecord_size": [len(blob)],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        build,
        schema="group_id string, tfrecord binary, n_examples int, tfrecord_size long",
    )


def explode_tfrecord(
    df: DataFrame, id_col: str = "group_id", payload_col: str = "tfrecord"
) -> DataFrame:
    """Read leg: one row per Example in each TFRecord blob (CRC
    verified). Corrupt blobs yield a single quarantine row with null
    member_name (same policy as archive.explode_tar)."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"group_id": [], "member_name": [], "member_bytes": []}
            for gid, blob in zip(pdf[id_col], pdf[payload_col]):
                if blob is None:
                    continue
                try:
                    examples = read_tfrecord_bytes(bytes(blob))
                    parsed = [parse_tf_example(e) for e in examples]
                except (ValueError, AssertionError, IndexError):
                    rows["group_id"].append(gid)
                    rows["member_name"].append(None)
                    rows["member_bytes"].append(None)
                    continue
                for feats in parsed:
                    rows["group_id"].append(gid)
                    rows["member_name"].append(feats.get("__key__", b"").decode())
                    rows["member_bytes"].append(feats.get("data"))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema="group_id string, member_name string, member_bytes binary"
    )


def byte_range(
    df: DataFrame,
    start: int,
    length: int,
    payload_col: str = "tfrecord",
    dst: str = "chunk",
) -> DataFrame:
    """Byte-range serving over a binary column (tar2tf's HTTP Range
    handler, main.go:139-163): clamp to the payload size; a start at
    or past the end yields an EMPTY chunk plus the total size so the
    caller can answer 416 with `bytes */size`. Pure built-ins —
    substring on binary is JVM-side."""
    size = F.length(F.col(payload_col)).cast("long")
    clamped = F.least(F.lit(length).cast("long"), size - F.lit(start))
    chunk = F.when(
        (F.lit(start) >= 0) & (F.lit(start) < size),
        F.expr(f"substring({payload_col}, {start + 1}, {length})"),
    ).otherwise(F.lit(b""))
    return df.withColumn(dst, chunk).withColumn(
        "range_length",
        F.when((F.lit(start) >= 0) & (F.lit(start) < size), F.greatest(clamped, F.lit(0)))
        .otherwise(F.lit(0)).cast("long"),
    ).withColumn("total_size", size)
