"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`ais_etl_spark.contract`, which holds one
(spark, sf_dir) -> DataFrame callable per implemented operator from
SURVEY.md §2 plus the DuckDB oracle SQL twins (same column names, same
engine-portable arithmetic). The ONLY query without an oracle entry is
``tf_xxhash`` — permanently rows-only because DuckDB has no
Spark-compatible xxhash64 and a pure-SQL XXH64 is unreasonable; as a
substitute the query itself carries a per-row ``jvm_py_equal``
assertion (JVM builtin vs the pure-Python twin), and the twin is
hypothesis-property-tested bit-identical at seed 42. Every other
query, including the formerly rows-only approximate-ANN pair, is
value-hash-checked: sim_lsh_topk/sim_ivf_topk were made exactly
reproducible (deterministic md5 hyperplanes; exact-decimal k-means
training) so the oracle replays the same approximation. Round 4:
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
