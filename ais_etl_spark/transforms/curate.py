"""Single-pass curation enrichment: html → (text, lang, simhash,
token count, fingerprint, quality flag) in ONE Arrow-batched UDF.

This is the representative per-record work of a training-data ingest
at Common-Crawl scale: every winning page gets extraction + the
curation statistics the dedup/quality stages consume downstream. One
pandas UDF returning a struct = one JVM↔Python Arrow round-trip per
batch (vs one per stat), and the scalar logic is shared with the
batch operators (operators/dedup.simhash32, operators/textstats) so
engine and operator results agree by construction.

The reference analog: ais-etl transformer chains where one container
pass computes the derived artifact (e.g. tar2tf's decode→rotate→
resize pipeline per record, /root/reference/transformers/tar2tf/src/
transforms/pipeline.go:32-48).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ais_etl_spark import html as htmlmod
from ais_etl_spark.operators.dedup import TOKEN_RE, simhash32

from pyspark.sql.types import (  # noqa: E402
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# explicit type objects: a DDL string here would need an active
# SparkSession at import time (pandas_udf parses DDL via the JVM)
CURATE_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("simhash", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("fingerprint", StringType()),
        StructField("quality_keep", BooleanType()),
    ]
)

_TOK_RE = re.compile(TOKEN_RE)
_STOP = frozenset(
    ["the", "and", "of", "to", "is", "with", "that", "a", "in", "it",
     "for", "on", "as", "are"]
)


def curate_one(data: bytes | None) -> dict | None:
    """Scalar reference implementation (unit-test oracle)."""
    if data is None:
        return None
    text = htmlmod.extract_text_bytes(data)
    lang = htmlmod.extract_lang_bytes(data)
    toks = _TOK_RE.findall(text.lower())
    n = len(toks)
    mean_wlen = (sum(len(t) for t in toks) / n) if n else 0.0
    punct = sum(text.count(c) for c in ".,;:!?")
    keep = bool(
        n >= 10
        and 2.0 <= mean_wlen <= 12.0
        and punct / max(len(text), 1) <= 0.2
    )
    from ais_etl_spark.operators.textstats import normalize_ws_py

    norm = normalize_ws_py(text)
    return {
        "text": text,
        "lang": lang,
        "simhash": simhash32(text),
        "n_tokens": n,
        "fingerprint": hashlib.md5(norm.encode()).hexdigest(),
        "quality_keep": keep,
    }


@pandas_udf(CURATE_STRUCT)
def curate_udf(data: pd.Series) -> pd.DataFrame:
    rows = [curate_one(None if d is None else bytes(d)) for d in data]
    empty = {
        "text": None, "lang": None, "simhash": None, "n_tokens": None,
        "fingerprint": None, "quality_keep": None,
    }
    return pd.DataFrame([r if r is not None else dict(empty) for r in rows])


def curate_events(events: DataFrame) -> DataFrame:
    """The curation post-dedup transform for LakeTable.merge."""
    out = events.withColumn("_c", curate_udf(F.col("html")))
    for name in ("text", "lang", "simhash", "n_tokens", "fingerprint",
                 "quality_keep"):
        out = out.withColumn(name, F.col(f"_c.{name}"))
    return out.drop("_c")


CURATED_PAGES_SCHEMA: list[tuple[str, str]] = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
    ("simhash", "bigint"),
    ("n_tokens", "int"),
    ("fingerprint", "string"),
    ("quality_keep", "boolean"),
]
