"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, batching, partition
sizing) real and the codec-library calls stubbed.

Reference parity: this is the Spark re-expression of the media
transformers — FFmpeg audio transcode
(/root/reference/transformers/FFmpeg/fastapi_server.py:65-97),
torchvision/keras image preprocess
(/root/reference/transformers/torchvision_preprocess/fastapi_server.py:52-109),
face_detection inference + tar member-wise map
(/root/reference/transformers/face_detection/fastapi_server.py:57-180),
audio_splitter range trim
(/root/reference/NeMo/.../audio_splitter/fastapi_server.py:65-119).

The image/audio libs (PIL, ffmpeg, torchvision) are not in this
container; PNG and baseline-JPEG decode are REAL anyway via the
stdlib codecs (operators/png.py, operators/jpeg.py), other formats
are either a clearly-marked ``NotImplementedError`` (real mode) or a
deterministic fake (test mode) — and everything Spark-side is real
and tested: BinaryType
round-trip through Arrow, iterator-form ``mapInPandas`` (bounded
memory per batch, the transform_stream analog), metadata struct
schema, and pass-through routing on media type (the reference's
extension-dispatch at FFmpeg/fastapi_server.py:74-79).

Scale notes: media rows are MBs — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for these stages
(bench uses 10k for text; media pipelines want 32–256) and size file
splits by bytes not rows; ``mapInPandas``'s iterator form keeps one
Arrow batch in memory per task regardless of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_type", StringType()),  # image|audio|video|other
        StructField("payload", BinaryType()),
        StructField("meta_format", StringType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

# image feature-extraction output: id + fixed-dim feature vector
FEATURE_SCHEMA = "media_id string, media_type string, feature array<float>"

_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG"
_RIFF_MAGIC = b"RIFF"


def classify_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte media-type detection — built-ins only (substring on
    binary), mirroring the compress transformer's magic validation
    (/root/reference/transformers/compress/fastapi_server.py:129,133)."""
    head = F.substring(F.col(payload_col), 1, 4)
    return df.withColumn(
        "detected_type",
        F.when(F.substring(F.col(payload_col), 1, 3) == F.lit(_JPEG_MAGIC), "image")
        .when(head == F.lit(_PNG_MAGIC), "image")
        .when(head == F.lit(_RIFF_MAGIC), "audio")
        .otherwise("other"),
    )


def _has_pil() -> bool:
    """Runtime codec detection — the extension-dispatch analog of the
    reference's lib checks; decide per process, not per import."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _decode_image_features_real(payload: bytes, dim: int) -> list[float]:
    """Real decode path: decode → grayscale → dim×dim resize → per-row
    mean intensity. PIL when installed; otherwise the pure-stdlib
    codecs handle PNG (operators/png.py) AND baseline JPEG
    (operators/jpeg.py, round 4) payloads — both real decode legs run
    in this codec-free sandbox. Other formats (or progressive/
    arithmetic JPEG) stay a clearly-marked NotImplementedError."""
    if _has_pil():  # pragma: no cover - lib absent in sandbox
        import io

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, dim))
        px = list(img.getdata())
        return [sum(px[r * dim : (r + 1) * dim]) / (dim * 255.0) for r in range(dim)]
    if bytes(payload[:4]) == _PNG_MAGIC or bytes(payload[:3]) == _JPEG_MAGIC:
        from ais_etl_spark.operators import png
        from ais_etl_spark.transforms.raster import decode_any

        w, h, ch, rows, _fmt = decode_any(bytes(payload))
        gray = png.to_gray(w, ch, rows)
        small = png.resize_box(w, h, 1, gray, dim, dim)
        return [sum(r) / (dim * 255.0) for r in small]
    raise NotImplementedError(
        "non-PNG/JPEG image decode requires PIL (not installed); "
        "use fake_decode=True for the deterministic test path"
    )


def _resize_image_real(payload: bytes, width: int, height: int) -> bytes:
    """Real resize, preserving the source format: PIL when installed,
    else the stdlib codecs (decode → box resample → re-encode in the
    source format) for PNG and baseline-JPEG payloads — the tar2tf
    Resize analog on actual pixels
    (/root/reference/transformers/tar2tf/src/transforms/job.go:146-164)."""
    if _has_pil():  # pragma: no cover - lib absent in sandbox
        import io

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(payload))
        fmt = img.format or "PNG"
        out = io.BytesIO()
        img.resize((width, height)).save(out, format=fmt)
        return out.getvalue()
    if bytes(payload[:4]) == _PNG_MAGIC or bytes(payload[:3]) == _JPEG_MAGIC:
        from ais_etl_spark.operators import png
        from ais_etl_spark.transforms.raster import decode_any, encode_fmt

        w, h, ch, rows, fmt = decode_any(bytes(payload))
        return encode_fmt(
            fmt, width, height, ch, png.resize_box(w, h, ch, rows, width, height)
        )
    raise NotImplementedError(
        "non-PNG/JPEG image resize requires PIL (not installed); "
        "use fake_decode=True for the deterministic test path"
    )


def _fake_image_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': features derived from payload
    bytes only — stable across runs/executors, so the Spark plumbing
    (batching, schema, ordering) is testable without codec libs.

    Hashes the lowercase-hex rendering of the payload (not the raw
    bytes) so the correctness oracle can recompute the same value in
    ANSI SQL, where md5 accepts only text (md5(lower(hex(blob))))."""
    import hashlib

    h = hashlib.md5(bytes(payload).hex().encode()).digest()
    return [((h[i % 16] * 17 + i) % 256) / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    dim: int = 8,
    fake_decode: bool | None = None,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Media → feature vectors via iterator-form ``mapInPandas``
    (transform_stream analog: one Arrow batch resident per task).
    Non-media rows pass through with null features (extension-dispatch
    pass-through semantics). ``fake_decode=None`` auto-detects: real
    PIL decode when the lib is installed, the deterministic fake
    otherwise (pin ``True`` for oracle-reproducible output)."""
    if fake_decode is None:
        fake_decode = not _has_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if payload is None or mtype not in ("image", "audio"):
                    feats.append(None)
                elif fake_decode:
                    feats.append(_fake_image_features(payload, dim))
                else:
                    feats.append(_decode_image_features_real(bytes(payload), dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, fake_decode: bool | None = None
) -> DataFrame:
    """Image resize stage (torchvision Resize analog). Fake mode tags
    the payload with a deterministic 8-byte header recording the new
    dims (so tests assert the plumbing end-to-end); real mode (auto
    when PIL is installed) decodes and re-encodes at the new size."""
    if fake_decode is None:
        fake_decode = not _has_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = b"RSZ1" + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                elif fake_decode:
                    out.append(hdr + bytes(payload))
                else:
                    out.append(_resize_image_real(bytes(payload), width, height))
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["meta_width"] = width
            pdf["meta_height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Video frame-sampling stage (FFmpeg analog): one output row per
    sampled frame — a flatMap, expressed with mapInPandas's row-count
    freedom. Fake mode emits one frame per ``every_ms`` of
    meta_duration_ms with payload = md5-tagged slice marker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_duration_ms"]
            ):
                # Arrow → pandas renders null ints as NaN floats
                if payload is None or dur is None or pd.isna(dur):
                    continue
                n = max(int(dur) // every_ms, 1)
                for i in range(n):
                    if not fake_decode:  # pragma: no cover
                        raise NotImplementedError(
                            "video decode requires ffmpeg (not installed)"
                        )
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(
                        b"FRM1" + i.to_bytes(4, "big") + bytes(payload[:16])
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, schema="media_id string, frame_idx int, frame_ts_ms int, frame binary"
    )
