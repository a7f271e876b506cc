"""Text analysis for corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

The reference's text handling is byte-level only (gzip codecs, md5);
these operators are the curation layer a Common-Crawl training
pipeline needs on top. Everything here is pyspark built-ins (JVM,
whole-stage codegen) except the winnowing fingerprint, which is an
Arrow-batched pandas UDF (stateful rolling window — not expressible
as a one-pass column expression).

Every built-in formulation transliterates 1:1 to the DuckDB oracle
SQL in __spark_entry__.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ais_etl_spark.operators.dedup import TOKEN_RE, tokens

# Tiny per-language stopword marker sets (n-gram/stopword heuristic —
# deliberately small + fixed so the oracle embeds the same literals).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "mit", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "avec", "pour"],
    "es": ["el", "los", "las", "es", "con", "para", "una"],
    "zh": ["de", "shi", "bu", "le", "wo", "zai", "you"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "in", "it", "for", "on", "as", "are"]

# BPE-ish token regex: letter runs, digit runs, single non-space symbol
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# Python twin of the engine normalizer lower(regexp_replace(trim(text),
# '\s+', ' ')): Spark's trim strips SPACES only, and Java \s is
# [ \t\n\x0b\f\r] — NOT Python str.split()'s unicode whitespace
# (\x1c-\x1f etc. differ: found by a hypothesis property test).
import re as _re

_JAVA_WS_RE = _re.compile(r"[ \t\n\x0b\f\r]+")


def normalize_ws_py(text: str) -> str:
    """Exact Python equivalent of the JVM/SQL whitespace-normalize +
    lowercase used by the fingerprint operators."""
    return _JAVA_WS_RE.sub(" ", text.strip(" ")).lower()


def _lang_cols(text_col: str) -> list:
    t = F.array_distinct(tokens(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    return [
        *[scores[lg].alias(f"score_{lg}") for lg in langs],
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("pred_lang"),
    ]


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count distinct marker-word hits per
    language over the token set; argmax with fixed tie order (en > de >
    fr > es > zh). One projection — no shuffle, no UDF."""
    return df.select(F.col(id_col), *_lang_cols(text_col))


def quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features: length, word count, mean word length,
    punctuation ratio, stopword ratio, plus a boolean keep flag with
    C4-style thresholds. Pure projections."""
    return df.select(F.col(id_col), *_quality_cols(text_col))


def _quality_cols(text_col: str) -> list:
    t = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(t)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "[.,;:!?]", "")
    )
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    mean_wlen = F.round(
        F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
        / F.greatest(n_words, F.lit(1)),
        4,
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
    return [
        n_chars.alias("n_chars_text"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (
            (n_words >= 10)
            & (mean_wlen >= 2.0)
            & (mean_wlen <= 12.0)
            & (punct_ratio <= 0.2)
        ).alias("keep"),
    ]


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting: whitespace tokens, word tokens, BPE-ish regex
    tokens, distinct-word count. The per-corpus token total is one
    map-side-combined sum away."""
    return df.select(F.col(id_col), *_token_cols(text_col))


def _token_cols(text_col: str) -> list:
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    words = tokens(F.col(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
    return [
        ws.alias("n_ws_tokens"),
        F.size(words).alias("n_word_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    ]


def _fingerprint_col(text_col: str) -> "F.Column":
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    return F.md5(norm).alias("fingerprint")


def fingerprint_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace-normalized md5 fingerprint — the cheap exact-dup key
    (case-fold + collapse whitespace, then md5)."""
    return df.select(F.col(id_col), _fingerprint_col(text_col))


def doc_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All four per-doc text-analysis operators — language ID, quality
    features, token counts, md5 fingerprint — as ONE wide projection
    (no join, no shuffle): the single-pass shape a 100 TB curation
    sweep wants, and one gate query instead of four."""
    return df.select(
        F.col(id_col),
        *_lang_cols(text_col),
        *_quality_cols(text_col),
        *_token_cols(text_col),
        _fingerprint_col(text_col),
    )


def winnow_fingerprint_udf(k: int = 5, window: int = 4):
    """Winnowing (rolling-hash) fingerprint: min hash per sliding
    window over k-gram rolling hashes; returns the sorted distinct
    fingerprint set as hex strings. Stateful sliding window ⇒ pandas
    UDF (Arrow-batched), per SURVEY's "UDF only where built-ins can't".
    """

    def winnow_one(text: str | None) -> list[str] | None:
        if text is None:
            return None
        s = normalize_ws_py(text)
        if len(s) < k:
            return []
        hashes = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(s) - k + 1)
        ]
        picks = set()
        for i in range(max(len(hashes) - window + 1, 1)):
            picks.add(min(hashes[i : i + window]))
        return sorted(f"{h:08x}" for h in picks)

    @pandas_udf("array<string>")
    def winnow(text: pd.Series) -> pd.Series:
        return text.map(winnow_one)

    return winnow


# PII patterns: engine-portable regex subset (no lookarounds; RE2-safe
# for the DuckDB oracle, java.util.regex-safe for Spark)
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_URL_RE = "https?://[^\\s]+"
PII_PHONE_RE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub for training-data curation: emails → <EMAIL>, urls →
    <URL>, phone-like digit runs → <PHONE>, applied in that fixed
    order (url after email so mailto-ish text is already collapsed;
    phone last so it cannot eat scheme digits). Pure JVM regex
    projection — no UDF, no shuffle; transliterates 1:1 to the oracle
    (DuckDB regexp_replace with the 'g' flag)."""
    scrubbed = F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_URL_RE, "<URL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        (scrubbed != F.col(text_col)).alias("had_pii"),
    )


def doc_frequency(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_df: int = 2
) -> DataFrame:
    """Corpus document-frequency table (the IDF building block for
    quality filtering / rare-token pruning at scale): explode DISTINCT
    tokens per doc → one hash-agg count per token. Map-side combine
    collapses each partition to its vocabulary before the shuffle, so
    shuffle volume is bounded by |vocab| × partitions, not corpus
    size; a hot token (stopword) is exactly one combiner row per
    partition — skew-free by construction."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )
