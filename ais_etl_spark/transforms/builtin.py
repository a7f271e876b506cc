"""Built-in transformers — every §2.1 reference transformer, Spark-first.

Rule of thumb (performance contract): use a pyspark built-in function
(JVM, whole-stage-codegen) whenever semantics allow; drop to an
Arrow-batched ``pandas_udf`` only where Spark genuinely lacks the
primitive (bytes-level gzip/bz2, html parsing). Never a row-at-a-time
Python UDF.

Reference parity map (file:line into /root/reference):

- echo                    → identity projection        transformers/echo/fastapi_server.py:15-16
- hello_world             → constant projection        transformers/hello_world/fastapi_server.py:18-19
- md5                     → F.md5 (built-in)           transformers/md5/fastapi_server.py:22-26
- hash_with_args          → F.xxhash64 / seeded UDF    transformers/hash_with_args/fastapi_server.py:56-86
- compress                → gzip/bz2 pandas UDFs       transformers/compress/fastapi_server.py:73-146
- batch_rename            → regex_route                transformers/batch_rename/fastapi_server.py:44-61
- FFmpeg / keras / torchvision / face_detection → binary-payload UDF
  pattern; our domain instances are extract_text / extract_lang; the
  media decodes themselves are stubbed in operators/multimodal.py
  (libs not in container).
"""

from __future__ import annotations

import bz2 as _bz2
import gzip as _gzip

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ais_etl_spark import html as htmlmod
from ais_etl_spark.transforms.registry import register

# --------------------------------------------------------------------------
# Vectorized pandas UDFs (Arrow batch in / Arrow batch out)
# --------------------------------------------------------------------------


@pandas_udf(StringType())
def extract_text_udf(data: pd.Series) -> pd.Series:
    """html binary → extracted text (byte-identical invariant)."""
    return data.map(htmlmod.extract_text_bytes)


@pandas_udf(StringType())
def extract_lang_udf(data: pd.Series) -> pd.Series:
    """html binary → declared lang tag."""
    return data.map(htmlmod.extract_lang_bytes)


@pandas_udf(
    StructType(
        [StructField("text", StringType()), StructField("lang", StringType())]
    )
)
def extract_text_lang_udf(data: pd.Series) -> pd.DataFrame:
    """html binary → (text, lang) struct in ONE gunzip+decode pass —
    the fused twin of the two UDFs above (guide §4: don't decode the
    payload twice); byte-identical outputs, parity-tested."""
    pairs = data.map(htmlmod.extract_text_lang_bytes)
    return pd.DataFrame(
        {"text": pairs.map(lambda p: p[0]), "lang": pairs.map(lambda p: p[1])}
    )


@pandas_udf(BinaryType())
def synth_html_udf(url: pd.Series, text: pd.Series, lang: pd.Series) -> pd.Series:
    """Deterministic (url, text, lang) → gzip html payload (feed gen)."""
    return pd.Series(
        [
            None if t is None else htmlmod.synth_html(u, t, lg)
            for u, t, lg in zip(url, text, lang)
        ],
        dtype=object,
    )


def _codec_udf(mode: str, algorithm: str):
    """compress transformer: mode×algorithm from config, magic-checked
    decompress (compress/fastapi_server.py:96-133)."""
    comp = {"gzip": lambda b: _gzip.compress(b, mtime=0), "bz2": _bz2.compress}[algorithm]
    decomp = {"gzip": _gzip.decompress, "bz2": _bz2.decompress}[algorithm]
    magic = {"gzip": b"\x1f\x8b", "bz2": b"BZh"}[algorithm]

    if mode == "compress":
        fn = lambda b: None if b is None else comp(bytes(b))  # noqa: E731
    else:

        def fn(b):
            if b is None:
                return None
            b = bytes(b)
            if not b.startswith(magic):
                raise ValueError(f"payload lacks {algorithm} magic bytes")
            return decomp(b)

    @pandas_udf(BinaryType())
    def codec(data: pd.Series) -> pd.Series:
        return data.map(fn)

    return codec


gzip_compress_udf = _codec_udf("compress", "gzip")
gzip_decompress_udf = _codec_udf("decompress", "gzip")
bz2_compress_udf = _codec_udf("compress", "bz2")
bz2_decompress_udf = _codec_udf("decompress", "bz2")


# --- pure-Python xxHash64 (XXH64) -----------------------------------------
# Spec: https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md
# Verified bit-identical to Spark's JVM XxHash64 at seed 42 in
# tests/test_transforms.py (same algorithm, arbitrary seed).

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _as_bytes(b) -> bytes:
    """String columns hash their UTF-8 bytes (Spark semantics)."""
    return b.encode("utf-8") if isinstance(b, str) else bytes(b)


def _xx_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _XXP2) & _M64, 31) * _XXP1) & _M64


def xxhash64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with an arbitrary ``seed`` — unsigned 64-bit."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xx_round(0, v)) * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl64(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = ((_rotl64(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxhash_seeded_udf(seed: int):
    """Parameterized xxhash64 (hash_with_args seed resolution,
    hash_with_args/fastapi_server.py:44-86): seed 42 = Spark's JVM
    built-in (whole-stage codegen); any other seed = an Arrow-batched
    pandas UDF over :func:`xxhash64_py` (the C ``xxhash`` package is
    used instead when importable). Output: 16-char lowercase hex."""
    if seed == 42:
        # F.hex strips leading zeros — lpad to the fixed 16-char digest
        return lambda col: F.lpad(F.lower(F.hex(F.xxhash64(col))), 16, "0")
    try:
        import xxhash  # noqa: F401

        def one(b):  # pragma: no cover - lib absent in sandbox
            import xxhash

            if b is None:
                return None
            return xxhash.xxh64(_as_bytes(b), seed=seed).hexdigest()
    except ImportError:

        def one(b):
            return None if b is None else f"{xxhash64_py(_as_bytes(b), seed):016x}"

    @pandas_udf(StringType())
    def hasher(data: pd.Series) -> pd.Series:
        return data.map(one)

    return lambda col: hasher(col)


def xxhash64_py_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 in the JVM builtin's SIGNED int64 domain — the single
    definition of the unsigned→signed reinterpretation that both the
    parity UDF and LakeTable.lookup's driver-side bucket computation
    must share (bucket pruning is only correct while this stays
    bit-identical to ``F.xxhash64``)."""
    u = xxhash64_py(data, seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_py_udf(seed: int):
    """Pure-Python XXH64 emitted as SIGNED int64 — the JVM builtin's
    output domain — so ``xxhash64_py_udf(42)(c) == F.xxhash64(c)`` is a
    row-level parity assertion between the two implementations (used by
    the ``tf_xxhash`` gate query)."""
    from pyspark.sql.types import LongType

    def one(b):
        if b is None:
            return None
        return xxhash64_py_signed(_as_bytes(b), seed)

    @pandas_udf(LongType())
    def hasher(data: pd.Series) -> pd.Series:
        return data.map(one)

    return lambda col: hasher(col)


# --------------------------------------------------------------------------
# Registered DataFrame-level transforms (name → fn(df, **params) -> df)
# --------------------------------------------------------------------------


@register("echo", doc="identity — returns input unchanged")
def t_echo(df, **_):
    return df


@register("hello_world", doc="constant column", dst="greeting")
def t_hello_world(df, dst="greeting", **_):
    return df.withColumn(dst, F.lit("Hello World!"))


@register("md5", doc="hex md5 digest of a binary/string column", src="html", dst="md5")
def t_md5(df, src="html", dst="md5", **_):
    return df.withColumn(dst, F.md5(F.col(src).cast("binary")))


@register("xxhash", doc="xxhash64 (seed 42 built-in; other seeds via UDF)",
          src="html", dst="xxh", seed=42)
def t_xxhash(df, src="html", dst="xxh", seed=42, **_):
    return df.withColumn(dst, xxhash_seeded_udf(seed)(F.col(src)))


@register("compress", doc="gzip/bz2 codec over a binary column",
          src="html", dst=None, mode="compress", algorithm="gzip")
def t_compress(df, src="html", dst=None, mode="compress", algorithm="gzip", **_):
    udf = _codec_udf(mode, algorithm)
    return df.withColumn(dst or src, udf(F.col(src)))


@register("extract_text", doc="html binary → text", src="html", dst="text")
def t_extract_text(df, src="html", dst="text", **_):
    return df.withColumn(dst, extract_text_udf(F.col(src)))


@register("extract_lang", doc="html binary → declared lang", src="html", dst="lang")
def t_extract_lang(df, src="html", dst="lang", **_):
    return df.withColumn(dst, extract_lang_udf(F.col(src)))


def batch_rename_write(
    df,
    dst_path: str,
    src: str = "url",
    pattern: str = ".*",
    dst_prefix: str = "routed/",
    payload_cols: list[str] | None = None,
    mode: str = "overwrite",
):
    """batch_rename's dual-sink semantics (copy, NOT move — the
    reference echoes the original AND puts matching objects under
    ``dst_prefix + basename`` in a second bucket,
    batch_rename/fastapi_server.py:44-61): write matching rows to a
    second sink keyed by their routed name, return the input
    UNCHANGED (pass-through). ``mode='overwrite'`` makes a re-run
    byte-idempotent."""
    payload_cols = payload_cols or [c for c in df.columns if c != src]
    routed = t_regex_route(df, src=src, pattern=pattern, dst_prefix=dst_prefix)
    matched = routed.filter(F.col("route_match")).select(
        F.col("route_dst").alias("dst_key"), *payload_cols
    )
    matched.write.mode(mode).parquet(dst_path)
    return df


def batch_rename_foreach_batch(dst_path: str, **kw):
    """Streaming leg: a ``foreachBatch`` function writing each
    micro-batch's matches to ``dst_path/batch_id=N``. A replayed batch
    overwrites its own subdirectory — exactly-once at the sink without
    coordination (same idempotence pattern as LakeTable's batch-id
    commit log)."""
    import os

    def fn(batch_df, batch_id: int):
        batch_rename_write(
            batch_df, os.path.join(dst_path, f"batch_id={batch_id}"), **kw
        )

    return fn


@register(
    "regex_route",
    doc="batch_rename: flag rows whose key matches a pattern and compute "
    "their destination name; caller fans matching rows to a second sink",
    src="url", pattern=".*", dst_prefix="routed/",
)
def t_regex_route(df, src="url", pattern=".*", dst_prefix="routed/", **_):
    basename = F.element_at(F.split(F.col(src), "/"), -1)
    return df.withColumn("route_match", F.col(src).rlike(pattern)).withColumn(
        "route_dst",
        F.when(F.col("route_match"), F.concat(F.lit(dst_prefix), basename)),
    )
