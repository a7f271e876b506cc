"""Benchmark harness — ONE JSON line on stdout.

Headline: the north-rule metric — change-events/sec applied from
binlog-segment read through committed lake snapshot (synthetic
Common-Crawl CDC events with gzip html payloads, skewed hot urls).
Feed materialization is NOT timed (it is the upstream system); the
timed span is read feed → vectorized html→text/lang extraction → LWW
dedup → bucketed CoW MERGE → atomic snapshot commit.

Also times a set of contract queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1). Scaling evidence (local[8] vs local[32]) lives
in bench_scaling.py (separate JVMs per parallelism level).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_EVENTS (override event count), BENCH_SKIP_QUERIES=1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


# --- host-speed calibration -------------------------------------------------
# This VM's sustained throughput drifts 3-6x over minutes (vCPU steal,
# bimodal episodes — BENCH.md methodology). A fixed-work single-thread
# CPU probe timed immediately before each bench section makes every
# record SELF-DESCRIBING: drift_factor ~1 means a quiet window,
# drift_factor >> 1 means the section ran inside a host episode and
# its numbers understate the engine. REF = the probe's wall time
# measured on a quiet window of this host (min of repeated runs).

CALIB_REF_SEC = 2.56  # pinned: min of repeated quiet-window runs, 2026-08-17
_CALIB_PASSES = 400   # ~2.5-5 s nominal: 400 × xxhash64_py over 64 KiB


def calibrate() -> dict:
    """Fixed-work CPU probe (pure-Python XXH64 over a constant buffer —
    single-threaded, allocation-free, deterministic instruction count).
    Returns the measured time and the drift factor vs the pinned
    quiet-window reference."""
    from ais_etl_spark.transforms.builtin import xxhash64_py

    data = bytes(range(256)) * 256  # 64 KiB
    t0 = time.time()
    for _ in range(_CALIB_PASSES):
        xxhash64_py(data, 42)
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "ref_sec": CALIB_REF_SEC,
        "drift_factor": round(dt / CALIB_REF_SEC, 3),
    }


def run_ingest_bench(spark, n_events: int, n_buckets: int = 64) -> dict:
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.lake import LakeTable
    from ais_etl_spark.streaming.ingest import PAGES_SCHEMA, apply_cdc_batch

    tmp = tempfile.mkdtemp(prefix="ais-etl-bench-")
    try:
        feed_path = os.path.join(tmp, "feed")
        # materialize the binlog segment (untimed: upstream's job);
        # partition count ~ 4x cores so every thread stays busy
        par = spark.sparkContext.defaultParallelism * 4
        synth_cdc_feed(
            spark, n_events=n_events, seed=42, hot_pct=20, num_partitions=par
        ).write.parquet(feed_path)
        # size input splits to cores: the 128MB default packs a small
        # compressed feed into a handful of splits, capping the map
        # side regardless of parallelism (see BENCH.md methodology)
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(feed_path) for f in fs
        )
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            str(max(total // (cores * 3), 1024 * 1024)),
        )
        spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))

        # untimed warmup batch: JIT/codegen compile for every stage of
        # the pipeline — the reported number is the steady-state
        # throughput of a long-running ingest, not first-batch compile
        warm_path = os.path.join(tmp, "warm")
        synth_cdc_feed(
            spark, n_events=20_000, seed=7, num_partitions=par
        ).write.parquet(warm_path)
        warm_table = LakeTable.create(
            spark, os.path.join(tmp, "warm_pages"), PAGES_SCHEMA,
            key="url", order_col="warc_ts", n_buckets=n_buckets,
        )
        apply_cdc_batch(warm_table, spark.read.parquet(warm_path), batch_id="w0")

        # best-of-N timed runs (fresh table each, same feed bytes): this
        # sandbox VM's sustained-load throughput drifts 3-6x over minutes
        # (vCPU steal) — a single timed run can record a host episode
        # instead of the engine. Best-of isolates engine capability; all
        # raw runs are reported so the drift is visible in the record.
        events = spark.read.parquet(feed_path)
        runs: list[dict] = []
        for i in range(int(os.environ.get("BENCH_INGEST_RUNS", "3"))):
            table = LakeTable.create(
                spark, os.path.join(tmp, f"pages-{i}"), PAGES_SCHEMA,
                key="url", order_col="warc_ts", n_buckets=n_buckets,
            )
            t0 = time.time()
            lineage = apply_cdc_batch(table, events, batch_id="bench-0")
            dt = time.time() - t0
            runs.append(
                {
                    "events": n_events,
                    "ingest_sec": round(dt, 3),
                    "events_per_sec": round(n_events / dt, 1),
                    "rows_after": lineage.get("rows_after"),
                    "snapshot_id": lineage.get("snapshot_id"),
                }
            )
        # Headline = MEDIAN of the timed runs, not best-of: this VM's
        # sustained-load throughput drifts 3-6x over minutes (vCPU
        # steal), so the best-of overstates what an arbitrary driver
        # run can reproduce. The best and all raw runs are still
        # reported so capability vs drift stays visible in the record.
        by_rate = sorted(runs, key=lambda r: r["events_per_sec"])
        med = dict(by_rate[len(runs) // 2])
        med["raw_ingest_sec"] = [r["ingest_sec"] for r in runs]
        med["best_events_per_sec"] = by_rate[-1]["events_per_sec"]
        return med
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_mor_vs_cow_bench(
    spark, n_base: int, n_updates: int, n_buckets: int = 64
) -> dict:
    """Write-amplification comparison: apply ONE update-heavy batch to
    an EXISTING base table under cow (rewrites every hit base file) vs
    mor (appends delta files only; read-time LWW resolution). Base
    build is untimed; the timed span is the apply. The gap grows with
    base-file size — at 100 TB the cow apply rewrites GBs per touched
    bucket while mor writes only the batch — so the small-SF number
    here is a LOWER bound on the mor advantage."""
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.lake import LakeTable
    from ais_etl_spark.streaming.ingest import PAGES_SCHEMA, apply_cdc_batch

    tmp = tempfile.mkdtemp(prefix="ais-etl-bench-mor-")
    par = spark.sparkContext.defaultParallelism * 4
    try:
        base_path = os.path.join(tmp, "base_feed")
        upd_path = os.path.join(tmp, "upd_feed")
        synth_cdc_feed(
            spark, n_events=n_base, seed=42, hot_pct=20, num_partitions=par
        ).write.parquet(base_path)
        # same url population (url space is indexed 0..n_urls-1 either
        # way), different seed for a fresh draw; event ids and
        # timestamps shifted PAST the base so the updates mostly WIN
        # (the update-heavy steady state, not a stale-noop storm)
        n_urls = max(1, n_base // 10)
        upd = synth_cdc_feed(
            spark, n_events=n_updates, seed=99, hot_pct=20,
            n_urls=n_urls, num_partitions=par,
        )
        upd = (
            upd.withColumn("event_id", F.col("event_id") + F.lit(n_base))
            .withColumn("offset", F.col("offset") + F.lit(n_base))
            .withColumn(
                "warc_ts",
                F.timestamp_seconds(F.unix_timestamp("warc_ts") + F.lit(n_base + 10**7)),
            )
        )
        upd.write.parquet(upd_path)
        base_events = spark.read.parquet(base_path)
        upd_events = spark.read.parquet(upd_path)
        out: dict = {"base_events": n_base, "update_events": n_updates}
        for mode in ("cow", "mor"):
            table = LakeTable.create(
                spark, os.path.join(tmp, f"pages-{mode}"), PAGES_SCHEMA,
                key="url", order_col="warc_ts", n_buckets=n_buckets,
            )
            apply_cdc_batch(table, base_events, batch_id="base")  # untimed
            t0 = time.time()
            lin = apply_cdc_batch(table, upd_events, batch_id="upd", merge_mode=mode)
            dt = time.time() - t0
            out[f"{mode}_apply_sec"] = round(dt, 3)
            out[f"{mode}_apply_events_per_sec"] = round(n_updates / dt, 1)
            out[f"{mode}_files_written"] = lin.get("files_written")
            if mode == "mor":
                # fold cost (amortized over many batches in production)
                t0 = time.time()
                table.compact_deltas()
                out["mor_compact_sec"] = round(time.time() - t0, 3)
        out["mor_speedup"] = round(
            out["cow_apply_sec"] / out["mor_apply_sec"], 2
        )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


QUERY_NAMES = [
    "tf_codec_transcode",
    "cdc_lww_snapshot",
    "cdc_snapshot_by_lang",
    "cdc_engine_replay",
    "cdc_changelog",
    "cdc_point_lookup",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_top_orders_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "txt_doc_profile",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_lsh_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from ais_etl_spark import contract, get_spark

    # same execution env as bench_scaling.py's spark-submit runs so the
    # two benches measure the same engine: shuffle on tmpfs (a real
    # cluster node brings its own NVMe; the sandbox's shared disk is the
    # one resource that doesn't scale with cores) and a 24g driver heap
    # (below the 32g CompressedOops cliff; 8g spills the 2M-event merge)
    spark = get_spark(
        app_name="ais-etl-bench",
        extra_conf={
            "spark.local.dir": os.environ.get(
                "BENCH_LOCAL_DIR", "/dev/shm/ais-etl-shuffle"
            ),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    cores = spark.sparkContext.defaultParallelism

    # events scale with sf, clipped for wall-clock sanity in the
    # per-round driver run. 2M at sf0.1: large enough that per-batch
    # fixed overhead (job setup, commit, footer scan) is amortized and
    # the headline reflects steady-state throughput (at 300k the fixed
    # cost dominated and understated it ~4x — see BENCH.md).
    n_events = int(os.environ.get("BENCH_EVENTS", 0)) or min(
        max(int(sf * 20_000_000), 30_000), 2_000_000
    )
    calib_ingest = calibrate()
    ingest = run_ingest_bench(spark, n_events)
    mor = None
    if os.environ.get("BENCH_SKIP_MOR") != "1":
        mor = run_mor_vs_cow_bench(
            spark, n_base=max(n_events // 2, 10_000),
            n_updates=max(n_events // 8, 2_500),
        )
    calib_queries = calibrate()

    # each query runs twice: first execution pays whole-stage-codegen
    # compile (hundreds of ms to seconds of fixed cost unrelated to the
    # data volume); "queries" reports the steady-state (2nd) run — what
    # a 1000-executor job re-executing the stage thousands of times
    # actually sees — and "queries_cold" keeps the compile-included run
    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    if os.environ.get("BENCH_SKIP_QUERIES") != "1":
        for name in QUERY_NAMES:
            fn = contract.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            queries_cold[name] = round(time.time() - t0, 3)
            t0 = time.time()
            fn(spark, sf_dir).count()
            queries[name] = round(time.time() - t0, 3)

    total = round(
        ingest["ingest_sec"] + sum(queries.values()) + sum(queries_cold.values()), 3
    )
    out = {
        "metric": "change-events/sec applied (ingest→committed snapshot)",
        "value": ingest["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "queries_cold": queries_cold,
        "sf": sf,
        "cores": cores,
        "ingest": ingest,
        "mor_vs_cow": mor,
        "total_sec": total,
        # fixed-work host-speed probes timed immediately before the
        # ingest and query sections: drift_factor ~1 = quiet window,
        # >>1 = the section ran inside a host drift episode (this VM
        # drifts 3-6x; see BENCH.md) and understates the engine
        "calibration": {
            "before_ingest": calib_ingest,
            "before_queries": calib_queries,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
