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
from pyspark.sql.types import BinaryType, StringType

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


def xxhash_seeded_udf(seed: int):
    """Parameterized xxhash64 (hash_with_args seed resolution,
    hash_with_args/fastapi_server.py:44-86). Spark's F.xxhash64 pins
    seed=42; arbitrary seeds need the xxhash lib — gated import, with
    the built-in as the seed-42 fast path."""
    if seed == 42:
        return lambda col: F.lower(F.hex(F.xxhash64(col)))
    try:
        import xxhash  # noqa: F401
    except ImportError as e:  # pragma: no cover - lib absent in sandbox
        raise NotImplementedError(
            "arbitrary-seed xxhash64 needs the 'xxhash' package; "
            "seed=42 uses Spark's built-in F.xxhash64"
        ) from e

    @pandas_udf(StringType())
    def hasher(data: pd.Series) -> pd.Series:
        import xxhash

        return data.map(
            lambda b: None if b is None else xxhash.xxh64(bytes(b), seed=seed).hexdigest()
        )

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
