"""A/B the merge write-job's LWW formulation on the bench ingest shape
(measurement only). Variants, each timed with a noop sink:

  scan      : full feed scan (materialize all columns)
  narrow    : narrow (key,order,seq) scan + struct-max agg (winner keys)
  structmax : current path — full-payload struct-max LWW
  bjoin     : narrow winner agg + broadcast equi-join back to the feed
  structmax_w / bjoin_w : same + extraction UDF + bucket repartition +
              sort + parquet write (the whole write job, minus commit)
"""

from __future__ import annotations

import json
import os
import shutil
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
    from ais_etl_spark.streaming.ingest import enrich_events

    spark = get_spark(
        app_name="profile-lww",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )
    sc = spark.sparkContext
    n_events = int(os.environ.get("PROF_EVENTS", "2000000"))
    tmp = tempfile.mkdtemp(prefix="prof-lww-")
    feed_path = os.path.join(tmp, "feed")
    par = sc.defaultParallelism * 4
    synth_cdc_feed(
        spark, n_events=n_events, seed=42, hot_pct=20, num_partitions=par
    ).write.parquet(feed_path)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(feed_path) for f in fs
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(max(total // (sc.defaultParallelism * 3), 1024 * 1024)),
    )
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024))
    events = spark.read.parquet(feed_path)

    payload = ["op", "html"]

    def winners_structmax():
        ev = events.select("url", "warc_ts", F.col("event_id").alias("_seq"),
                           *payload)
        return lww_latest(ev, key="url", order_cols=("warc_ts", "_seq"),
                          payload_cols=payload)

    def winners_bjoin():
        ev = events.select("url", "warc_ts", F.col("event_id").alias("_seq"),
                           *payload)
        wk = (ev.groupBy("url")
              .agg(F.max(F.struct("warc_ts", "_seq")).alias("w"))
              .select("url", F.col("w.warc_ts").alias("warc_ts"),
                      F.col("w._seq").alias("_seq")))
        return ev.join(F.broadcast(wk), ["url", "warc_ts", "_seq"])

    def full_write(winners, out_name):
        w = winners.withColumnRenamed("_seq", "event_id")
        w = enrich_events(w).drop("op")
        w = w.withColumn(
            "_bucket", F.pmod(F.xxhash64("url", F.lit(42)), F.lit(64))
        )
        out = os.path.join(tmp, out_name)
        (w.repartition(64, "_bucket")
         .sortWithinPartitions("_bucket", "url")
         .write.option("maxRecordsPerFile", 1 << 20)
         .partitionBy("_bucket").parquet(out))
        shutil.rmtree(out, ignore_errors=True)

    timings: dict = {"feed_bytes": total, "events": n_events}

    def t(name, fn, reps=3):
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        timings[name] = runs
        print(name, runs, flush=True)

    t("scan_full", lambda: noop(events))
    t("narrow_agg", lambda: noop(
        events.select("url", "warc_ts", "event_id").groupBy("url")
        .agg(F.max(F.struct("warc_ts", "event_id")).alias("w"))))
    t("structmax", lambda: noop(winners_structmax()))
    t("bjoin", lambda: noop(winners_bjoin()))
    t("structmax_write", lambda: full_write(winners_structmax(), "o1"))
    t("bjoin_write", lambda: full_write(winners_bjoin(), "o2"))
    # interleaved second pass to control drift
    t("structmax_write2", lambda: full_write(winners_structmax(), "o3"))
    t("bjoin_write2", lambda: full_write(winners_bjoin(), "o4"))

    print(json.dumps(timings))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
