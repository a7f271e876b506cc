"""A/B cdc_engine_replay feed-materialization strategies (measurement
only): whole-feed localCheckpoint (current) vs per-batch quarter
checkpoints. Interleaved reps; prints per-rep seconds."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F


def main() -> None:
    from ais_etl_spark import get_spark
    from ais_etl_spark.contract import _feed_with_html
    from ais_etl_spark.feed import cdc_feed_from_events
    from ais_etl_spark.lake import LakeTable
    from ais_etl_spark.streaming.ingest import PAGES_SCHEMA, apply_cdc_batch

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile-replay",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )

    def run_whole():
        feed = _feed_with_html(spark, sf_dir).localCheckpoint(eager=True)
        lo, hi = feed.agg(F.min("event_id"), F.max("event_id")).first()
        tmp = tempfile.mkdtemp(prefix="prof-replay-a-")
        table = LakeTable.create(
            spark, os.path.join(tmp, "pages"), PAGES_SCHEMA, key="url",
            order_col="warc_ts", n_buckets=16,
        )
        step = (hi - lo) // 4 + 1
        for b in range(4):
            chunk = feed.filter(
                (F.col("event_id") >= lo + b * step)
                & (F.col("event_id") < lo + (b + 1) * step)
            )
            apply_cdc_batch(table, chunk, batch_id=f"a-{b}")
        return table.read().count()

    def run_quarters():
        lo, hi = (
            cdc_feed_from_events(spark, sf_dir)
            .agg(F.min("event_id"), F.max("event_id")).first()
        )
        base = _feed_with_html(spark, sf_dir)
        tmp = tempfile.mkdtemp(prefix="prof-replay-b-")
        table = LakeTable.create(
            spark, os.path.join(tmp, "pages"), PAGES_SCHEMA, key="url",
            order_col="warc_ts", n_buckets=16,
        )
        step = (hi - lo) // 4 + 1
        for b in range(4):
            chunk = base.filter(
                (F.col("event_id") >= lo + b * step)
                & (F.col("event_id") < lo + (b + 1) * step)
            ).localCheckpoint(eager=True)
            apply_cdc_batch(table, chunk, batch_id=f"b-{b}")
        return table.read().count()

    for rep in range(4):
        t0 = time.time(); n1 = run_whole(); t1 = time.time()
        n2 = run_quarters(); t2 = time.time()
        print(f"rep{rep} whole {t1-t0:.2f}s quarters {t2-t1:.2f}s "
              f"rows {n1}/{n2}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
