"""spark-submit entry point for the STREAMING ingest loop (the north
rule's run mode applied to the actual engine loop, not just the batch
merge):

    spark-submit --master local[N] --py-files dist/ais_etl_spark.zip \
        scripts/stream_job.py --feed-dir /data/binlog \
        --table /lake/pages --checkpoint /lake/_ckpt

Tails whatever binlog segments are present (availableNow), applies
them exactly-once through the checkpointed foreachBatch MERGE, and
prints one JSON line {rows, snapshot_id, batches}. Re-running with the
same checkpoint resumes; without --feed-dir a synthetic feed is
materialized first (smoke mode). --curate switches the per-winner
transform to the full curation profile.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed-dir", default=None)
    ap.add_argument("--table", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--events", type=int, default=100_000,
                    help="synthetic feed size when --feed-dir is absent")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--maintenance-every", type=int, default=None)
    ap.add_argument("--curate", action="store_true")
    ap.add_argument("--merge-mode", choices=["cow", "mor"], default="cow",
                    help="mor = merge-on-read delta merges (fold via "
                         "--maintenance-every)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ais-etl-stream-job")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )

    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.streaming.ingest import run_ingest, write_feed_chunks

    transform = table_schema = None
    if args.curate:
        from ais_etl_spark.transforms.curate import CURATED_PAGES_SCHEMA, curate_events

        transform, table_schema = curate_events, CURATED_PAGES_SCHEMA

    work = tempfile.mkdtemp(prefix="ais-etl-stream-job-")
    feed_dir = args.feed_dir
    if feed_dir is None:
        feed_dir = os.path.join(work, "feed")
        feed = synth_cdc_feed(spark, n_events=args.events, seed=42, hot_pct=20)
        write_feed_chunks(feed, feed_dir, n_chunks=4)

    table = run_ingest(
        spark,
        feed_dir=feed_dir,
        table_path=args.table or os.path.join(work, "pages"),
        checkpoint_dir=args.checkpoint or os.path.join(work, "ckpt"),
        n_buckets=args.n_buckets,
        maintenance_every=args.maintenance_every,
        transform=transform,
        table_schema=table_schema,
        merge_mode=args.merge_mode,
    )
    c = table.commit()
    print(
        json.dumps(
            {
                "rows": table.read().count(),
                "snapshot_id": c["snapshot_id"],
                "batches": len(c.get("batches", [])),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
