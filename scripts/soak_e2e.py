"""10x end-to-end soak (VERDICT r5 #8): one composed pipeline run at
20M events exercising every path the optimization round touched, with
a mid-run crash + exactly-once resume, validated against a full-replay
oracle computed independently of batch boundaries.

Pipeline under test (all checkpointed/fenced/cursored):

    20M-event synthetic CDC feed (3% dup, 20% hot-url skew, 5% deletes,
    + injected malformed ops on event_id % 9973 == 0)
      -> streaming run_ingest (availableNow, maxFilesPerTrigger=8,
         malformed -> quarantine dead-letter, merge fast path on batch
         0, full CoW merge path afterwards, fused text/lang extraction)
      -> per-batch on_batch_applied hook: sync_incremental to a silver
         table (predicate lang != 'zh' -- exercises predicate eviction
         tombstones) + MaterializedAggregate.refresh (per-lang counts)
      -> inline maintenance every 4 batches (compact_small_files +
         expire_snapshots(keep_last=3))
    CRASH: the hook raises after 3 applied batches on the first call;
    the second run_ingest call must resume from the checkpoint, replay
    the already-committed epoch as a fence no-op, re-run the
    idempotent hook, and finish.

Oracle (batch-boundary independent by construction -- unbounded
lateness, malformed-only quarantine):

    expected bronze = LWW over valid events (op in I/U/D), winners with
        op != 'D', text/lang re-derived from the WINNING html payloads
        (the extractor itself is parity-tested separately)
    expected quarantine = exactly the event_id % 9973 rows
    expected silver = expected bronze where lang != 'zh'
    expected matview = expected bronze counts per lang

Prints one JSON line with PASS/FAIL per check. ~20M events end to end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from ais_etl_spark import get_spark
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.lake import LakeTable
    from ais_etl_spark.lake.matview import MaterializedAggregate
    from ais_etl_spark.lake.sync import sync_incremental
    from ais_etl_spark.operators.lww import lww_latest
    from ais_etl_spark.streaming.ingest import (
        PAGES_SCHEMA,
        enrich_events,
        run_ingest,
        write_feed_chunks,
    )

    n_events = int(os.environ.get("SOAK_EVENTS", "20000000"))
    merge_mode = os.environ.get("SOAK_MERGE_MODE", "cow")
    spark = get_spark(
        app_name="soak-e2e",
        extra_conf={
            "spark.local.dir": os.environ.get(
                "BENCH_LOCAL_DIR", "/dev/shm/ais-etl-shuffle"
            ),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    tmp = tempfile.mkdtemp(prefix="soak-e2e-")
    feed_dir = os.path.join(tmp, "feed")
    bronze_p = os.path.join(tmp, "bronze")
    silver_p = os.path.join(tmp, "silver")
    mv_p = os.path.join(tmp, "mv")
    ckpt = os.path.join(tmp, "ckpt")
    t_start = time.time()

    # ---- feed with injected malformed ops ---------------------------
    feed = synth_cdc_feed(
        spark, n_events=n_events, seed=77, hot_pct=20,
        num_partitions=spark.sparkContext.defaultParallelism * 4,
    ).withColumn(
        "op",
        F.when(F.col("event_id") % 9973 == 0, F.lit(None)).otherwise(F.col("op")),
    )
    write_feed_chunks(feed, feed_dir, n_chunks=16)
    t_feed = time.time()

    # ---- pipeline hook: sync hop + matview refresh + crash bomb -----
    silver = LakeTable.create(
        spark, silver_p, PAGES_SCHEMA, key="url", order_col="warc_ts",
        n_buckets=32,
    )
    state = {"applied": 0, "mv": None, "bombed": False}

    def hook(table: LakeTable) -> None:
        sync_incremental(
            table, silver, name="soak",
            predicate=F.col("lang") != "zh",
        )
        if state["mv"] is None:
            state["mv"] = MaterializedAggregate.create(
                spark, mv_p, table, group_cols=["lang"], sum_cols=[]
            )
        else:
            state["mv"].refresh(table)
        state["applied"] += 1
        if state["applied"] == 3 and not state["bombed"]:
            state["bombed"] = True
            raise RuntimeError("soak: injected crash after 3 batches")

    crashed = False
    try:
        run_ingest(
            spark, feed_dir, bronze_p, ckpt,
            max_files_per_trigger=8, n_buckets=32,
            maintenance_every=4, keep_snapshots=3,
            on_batch_applied=hook, merge_mode=merge_mode,
        )
    except Exception as e:  # the injected crash (wrapped by streaming)
        crashed = "injected crash" in str(e)
        if not crashed:
            raise
    bronze = run_ingest(  # resume: fence no-ops + idempotent hook
        spark, feed_dir, bronze_p, ckpt,
        max_files_per_trigger=8, n_buckets=32,
        maintenance_every=4, keep_snapshots=3,
        on_batch_applied=hook, merge_mode=merge_mode,
    )
    # final catch-up for the downstream lane + view
    sync_incremental(bronze, silver, name="soak",
                     predicate=F.col("lang") != "zh")
    state["mv"].refresh(bronze)
    t_pipe = time.time()

    # ---- full-replay oracle (independent of batch boundaries) -------
    valid = feed.filter(F.col("op").isin("I", "U", "D"))
    winners = lww_latest(
        valid.select("url", "warc_ts", F.col("event_id").alias("_seq"),
                     "op", "html"),
        key="url", order_cols=("warc_ts", "_seq"),
        payload_cols=["op", "html"],
    )
    exp_live = enrich_events(
        winners.filter(F.col("op") != "D")
    ).select("url", "warc_ts", "text", "lang").localCheckpoint(eager=True)

    def cmp(name, got_df, exp_df):
        extra = got_df.exceptAll(exp_df).count()
        missing = exp_df.exceptAll(got_df).count()
        ok = extra == 0 and missing == 0
        results[name] = {"ok": ok, "extra": extra, "missing": missing,
                         "rows": got_df.count()}

    results: dict = {"crashed_and_resumed": crashed}
    got_bronze = bronze.read().select("url", "warc_ts", "text", "lang")
    cmp("bronze_vs_replay", got_bronze, exp_live)
    got_silver = silver.read().select("url", "warc_ts", "text", "lang")
    cmp("silver_vs_replay", got_silver, exp_live.filter(F.col("lang") != "zh"))
    got_mv = state["mv"].read().select("lang", "n_rows")
    cmp("matview_vs_replay", got_mv,
        exp_live.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_rows")))
    exp_malformed = feed.filter(F.col("op").isNull()).select("event_id")
    got_q = bronze.quarantine()
    results["quarantine_reasons"] = {
        r["reason"]: r["n"] for r in
        got_q.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    cmp("quarantine_vs_injected", got_q.select("event_id"), exp_malformed)
    t_done = time.time()

    results["events"] = n_events
    results["merge_mode"] = merge_mode
    results["feed_sec"] = round(t_feed - t_start, 1)
    results["pipeline_sec"] = round(t_pipe - t_feed, 1)
    results["oracle_sec"] = round(t_done - t_pipe, 1)
    results["pass"] = crashed and all(
        v["ok"] for v in results.values() if isinstance(v, dict) and "ok" in v
    )
    print(json.dumps(results))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
