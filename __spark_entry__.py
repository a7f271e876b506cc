"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`ais_etl_spark.contract`, which holds one
(spark, sf_dir) -> DataFrame callable per implemented operator from
SURVEY.md §2 plus the DuckDB oracle SQL twins (same column names, same
engine-portable arithmetic). ALL 50 queries are value-hash-checked —
including ``tf_xxhash``, whose oracle transliterates XXH64 into DuckDB
SQL (``oracle_xxhash.py``: recursive-CTE stripe loop, UHUGEINT wrap
arithmetic — round 5 closed the last rows-only exception; the query
additionally carries a per-row ``jvm_py_equal`` assertion of the JVM
builtin vs the pure-Python twin). The formerly rows-only
approximate-ANN pair is exactly reproducible too: sim_lsh_topk /
sim_ivf_topk use deterministic md5 hyperplanes and exact-decimal
k-means training so the oracle replays the same approximation. Round 4:
every cosine is quantized-exact (6-dp int64 components, integer
dot/norms, explicit floor-rounds) — bit-identical across engines by
construction, hypothesis-tested head-on in
tests/test_properties.py::test_quantized_cosine_engine_bit_equality.
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
