"""Structured Streaming ingest loop: feed → dedup → transform → MERGE."""

from ais_etl_spark.streaming.ingest import (  # noqa: F401
    FEED_SCHEMA,
    apply_cdc_batch,
    run_ingest,
    write_feed_chunks,
)
