"""Explain + re-time the narrow vs wide struct-max anomaly."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from ais_etl_spark import get_spark
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.operators.lww import lww_latest

    spark = get_spark(
        app_name="profile-lww2",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="prof-lww2-")
    feed_path = os.path.join(tmp, "feed")
    synth_cdc_feed(spark, n_events=2_000_000, seed=42, hot_pct=20,
                   num_partitions=sc.defaultParallelism * 4
                   ).write.parquet(feed_path)
    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(feed_path) for f in fs)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(total // (sc.defaultParallelism * 3), 1024 * 1024)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))
    events = spark.read.parquet(feed_path)

    narrow = (events.select("url", "warc_ts", "event_id").groupBy("url")
              .agg(F.max(F.struct("warc_ts", "event_id")).alias("w")))
    # variant: max_by-free two-col max
    narrow2 = (events.groupBy("url")
               .agg(F.max(F.struct("warc_ts", "event_id")).alias("w")))
    wide = lww_latest(
        events.select("url", "warc_ts", F.col("event_id").alias("_seq"),
                      "op", "html"),
        key="url", order_cols=("warc_ts", "_seq"), payload_cols=["op", "html"])

    print("=== narrow plan ===")
    narrow.explain("formatted")
    print("=== wide plan ===")
    wide.explain("formatted")

    for name, df in [("narrow", narrow), ("narrow2", narrow2),
                     ("wide", wide)] * 2:
        t0 = time.time()
        noop(df)
        print(name, round(time.time() - t0, 3), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
