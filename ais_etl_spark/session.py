"""SparkSession factory with scale-appropriate defaults.

Single place where execution knobs live so tests, bench, and the
driver entry point all agree. Mirrors the reference's init-time env
configuration model (/root/reference/transformers/FFmpeg/etl_spec.yaml:5-13)
— but here the "env" is Spark conf and everything else is declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ais-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults follow the sandbox contract: ``local[$SPARK_GRAFT_CPUS]``
    (32 if unset). On a real cluster pass ``master=None`` and let
    spark-submit supply it; every other conf below is cluster-safe.

    Scale rationale (100 TB / 1000 executors):
    - AQE on: runtime shuffle-partition coalescing + skew-join splits
      are the named mechanism for hot-domain skew (north_rule).
    - Arrow enabled + large batch: all our UDFs are pandas/Arrow
      vectorized; batch size bounds executor memory per task.
    - UTC session TZ: event-time (warc_ts) must compare identically
      across engines (and vs the DuckDB oracle).
    - shuffle.partitions ~ cores locally; on a cluster AQE coalesces
      from a deliberately high initial number.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (the legacy default) writes NO column statistics, which
        # blanks the manifest's order-column ranges; micros carries
        # proper min/max for metrics-based file skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # --- timeouts / failure policy (the reference's initTimeout /
        # probe analog, transformers/echo/etl_spec.yaml:27-29): bound
        # how long a wedged task or broadcast can stall the pipeline
        .config("spark.task.maxFailures", "4")
        .config("spark.network.timeout", "120s")
        .config("spark.sql.broadcastTimeout", "300")
        .config("spark.python.worker.faulthandler.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
