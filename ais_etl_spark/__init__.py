"""ais_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of NVIDIA/ais-etl
(reference read-only at /root/reference) on top of Apache Spark:

- a binlog/WAL-style change feed of Common-Crawl-style web pages
  (insert/update/delete per url) — :mod:`ais_etl_spark.feed`
- stateful last-writer-wins dedup/ordering per (url, warc_ts) —
  :mod:`ais_etl_spark.operators.lww`
- MERGE-INTO upserts on an Iceberg-semantics lakehouse table with
  exactly-once, checkpoint-resumable commits, metadata-only schema
  evolution, snapshot time travel — :mod:`ais_etl_spark.lake`
- all extraction/transformation (html→text, lang tagging, hashing,
  codecs) as vectorized Arrow/pandas UDFs mirroring ais-etl's
  user-defined transformer contract (``transform(bytes, path, args)
  -> bytes``, /root/reference/runtime/README.md:52-56) with zero
  per-row Python — :mod:`ais_etl_spark.transforms`
- training-data-pipeline operators: dedup (exact/minhash/simhash),
  similarity search, text analysis — :mod:`ais_etl_spark.operators`

Everything is DataFrame-first; Catalyst/AQE do the physical planning.
"""

__version__ = "0.1.0"

from ais_etl_spark.session import get_spark  # noqa: F401
