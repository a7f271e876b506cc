"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`ais_etl_spark.contract`, which holds one
(spark, sf_dir) -> DataFrame callable per implemented operator from
SURVEY.md §2 plus the DuckDB oracle SQL twins (same column names, same
engine-portable arithmetic). The only queries without an oracle entry
are the genuinely non-SQL-expressible ones — seeded xxhash64 (DuckDB
has no compatible hash) and the two approximate-ANN variants (recall
asserted in tests instead) — the driver records the weaker rows-only
check for those.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ais_etl_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: live-page counts per
    language after full CDC replay (LWW dedup + tombstone filter)."""
    return contract.QUERIES["cdc_snapshot_by_lang"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.all_queries()


def oracle_sql() -> dict[str, str]:
    return contract.all_oracles()
