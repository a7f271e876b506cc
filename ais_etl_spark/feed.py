"""Deterministic synthetic CDC feed of Common-Crawl-style page changes.

The engine's input (BASELINE.json input_hint): a binlog/WAL-style
change stream over pages keyed by ``url`` with event-time ``warc_ts``
and gzip html payloads. Two generators:

- :func:`synth_cdc_feed` — the real feed: fully *distributed*
  generation from ``spark.range`` (no driver-side data, scales to the
  10^10-event design point by construction), deterministic from
  ``seed`` via ``xxhash64``; skewed hot urls, out-of-order event time,
  duplicates, I/U/D ops, gzip html payloads.
- :func:`cdc_feed_from_events` + :data:`CDC_FEED_ORACLE_CTE` — a
  SQL-expressible derivation of a CDC feed from the driver's ``events``
  table, implemented identically in the DataFrame API and ANSI SQL so
  DuckDB can replay it as a correctness oracle (the driver's
  ``queries()``/``oracle_sql()`` contract).

Feed schema::

    event_id    bigint     -- unique, monotone per source; LWW tiebreak
    op          string     -- 'I' | 'U' | 'D'
    url         string     -- key (skewed)
    warc_ts     timestamp  -- event time / LWW ordinal (out of order)
    html        binary     -- gzip synthetic page; null for 'D'
    source_part int        -- source partition (lineage offset ranges)
    offset      bigint     -- offset within source_part
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ais_etl_spark.transforms.builtin import synth_html_udf

BASE_TS = "2026-01-01 00:00:00"  # fixed epoch base — replay-deterministic

LANGS = ["en", "de", "fr", "es", "zh"]


def _h(col, seed: int, salt: int):
    """Deterministic per-row int64 stream: xxhash64(value, seed+salt)."""
    return F.xxhash64(col, F.lit(seed + salt))


def synth_cdc_feed(
    spark: SparkSession,
    n_events: int = 100_000,
    n_urls: int | None = None,
    seed: int = 42,
    hot_urls: int = 4,
    hot_pct: int = 20,
    delete_pct: int = 5,
    dup_pct: int = 3,
    jitter_seconds: int = 3600,
    n_source_parts: int = 32,
    num_partitions: int | None = None,
    with_html: bool = True,
) -> DataFrame:
    """Distributed deterministic CDC feed.

    Skew: ``hot_pct`` percent of events target one of ``hot_urls`` urls
    (the hot-domain case the north rule requires salting/AQE for).
    ``dup_pct`` percent of events are exact duplicates of the previous
    event_id's content (at-least-once delivery). ``jitter_seconds``
    bounds event-time disorder (watermark tests). Everything is a pure
    function of (seed, event_id) → identical across re-runs, executors,
    and parallelism levels.
    """
    if n_urls is None:
        n_urls = max(1, n_events // 10)
    df = spark.range(0, n_events, numPartitions=num_partitions or spark.sparkContext.defaultParallelism)
    eid = F.col("id")

    # dup_pct% of rows replay the previous row's content (same url/ts/op,
    # different event_id) — dedup/idempotence fodder.
    content_id = F.when(
        (F.pmod(_h(eid, seed, 7), F.lit(100)) < dup_pct) & (eid > 0), eid - 1
    ).otherwise(eid)

    is_hot = F.pmod(_h(content_id, seed, 1), F.lit(100)) < hot_pct
    url_idx = F.when(is_hot, F.pmod(_h(content_id, seed, 2), F.lit(hot_urls))).otherwise(
        F.pmod(_h(content_id, seed, 3), F.lit(n_urls))
    )
    domain = F.pmod(url_idx, F.lit(997))
    url = F.concat(
        F.lit("https://site-"), domain.cast("string"),
        F.lit(".example.com/page/"), url_idx.cast("string"),
    )

    opr = F.pmod(_h(content_id, seed, 4), F.lit(100))
    op = (
        F.when(opr < delete_pct, F.lit("D"))
        .when(opr < delete_pct + 40, F.lit("U"))
        .otherwise(F.lit("I"))
    )

    jitter = F.pmod(_h(content_id, seed, 5), F.lit(2 * jitter_seconds)) - jitter_seconds
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + content_id + jitter
    )

    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (F.pmod(_h(content_id, seed, 6), F.lit(len(LANGS))) + 1).cast("int"),
    )
    text = F.concat(
        F.lit("Synthetic Common Crawl page body for "), url,
        F.lit(" revision "), content_id.cast("string"),
        F.lit("\nSecond paragraph with stable filler text & entities <ok>."),
    )

    out = df.select(
        eid.alias("event_id"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.when(op != "D", text).alias("_text"),
        F.when(op != "D", lang).alias("_lang"),
        F.pmod(_h(eid, seed, 8), F.lit(n_source_parts)).cast("int").alias("source_part"),
        eid.alias("offset"),
    )
    if with_html:
        out = out.withColumn(
            "html", synth_html_udf(F.col("url"), F.col("_text"), F.col("_lang"))
        )
    else:
        out = out.withColumn("html", F.lit(None).cast("binary"))
    return out.drop("_text", "_lang")


# --------------------------------------------------------------------------
# Oracle-facing feed: identical derivation in Spark and ANSI SQL (DuckDB)
# --------------------------------------------------------------------------

# Keep this CTE in lockstep with cdc_feed_from_events below. Only
# engine-portable constructs: integer %, CASE, string concat, CAST.
CDC_FEED_ORACLE_CTE = """
cdc AS (
    SELECT
        event_id,
        CASE WHEN event_id % 11 = 0 THEN 'D'
             WHEN event_id % 3 = 0 THEN 'U'
             ELSE 'I' END AS op,
        'https://site-' || CAST(user_id % 37 AS VARCHAR)
            || '.example.com/page/' || CAST(user_id % 211 AS VARCHAR) AS url,
        ts AS warc_ts,
        CASE user_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
             WHEN 3 THEN 'es' ELSE 'zh' END AS lang,
        'page rev ' || CAST(event_id % 7 AS VARCHAR) || ' of '
            || 'https://site-' || CAST(user_id % 37 AS VARCHAR)
            || '.example.com/page/' || CAST(user_id % 211 AS VARCHAR) AS text
    FROM events
)
"""


def cdc_feed_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of :data:`CDC_FEED_ORACLE_CTE` over the driver's
    ``events`` parquet — the CDC feed the DuckDB oracle can reproduce."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    url = F.concat(
        F.lit("https://site-"), (F.col("user_id") % 37).cast("string"),
        F.lit(".example.com/page/"), (F.col("user_id") % 211).cast("string"),
    )
    return ev.select(
        F.col("event_id"),
        F.when(F.col("event_id") % 11 == 0, "D")
        .when(F.col("event_id") % 3 == 0, "U")
        .otherwise("I")
        .alias("op"),
        url.alias("url"),
        F.col("ts").alias("warc_ts"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
            ((F.col("user_id") % 5) + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("page rev "), (F.col("event_id") % 7).cast("string"),
            F.lit(" of "), url,
        ).alias("text"),
    )
