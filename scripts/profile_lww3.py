"""Quantify SortAggregate costs in the merge path and candidate
hash-agg formulations (measurement only).

  stats_cur    : _batch_stats agg WITH string min/max(key)  (SortAgg)
  stats_nostr  : same agg minus the string min/max          (HashAgg?)
  win_struct   : groupBy(url).max(struct(ts, seq))          (SortAgg)
  win_dec      : groupBy(url).max(decimal ordinal)          (HashAgg?)
  bjoin_dec_write / structmax_write : full write-job twins
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

TWO62 = 4611686018427387904
TWO63 = 9223372036854775808
TWO64 = 18446744073709551616


def ordinal(ts_col, seq_col):
    two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(20,0))")
    two63 = F.expr("CAST('9223372036854775808' AS DECIMAL(19,0))")
    return (
        (F.unix_micros(F.col(ts_col)).cast("decimal(19,0)") + F.lit(TWO62))
        * two64
        + (F.col(seq_col).cast("decimal(19,0)") + two63)
    ).cast("decimal(38,0)")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from ais_etl_spark import get_spark
    from ais_etl_spark.feed import synth_cdc_feed
    from ais_etl_spark.operators.lww import lww_latest
    from ais_etl_spark.streaming.ingest import enrich_events

    spark = get_spark(
        app_name="profile-lww3",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )
    sc = spark.sparkContext
    tmp = tempfile.mkdtemp(prefix="prof-lww3-")
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
    bucket = F.pmod(F.xxhash64("url", F.lit(42)), F.lit(64))

    # --- stats twins -------------------------------------------------
    disp = F.lit(0).alias("_disp")
    base = events.select(F.col("url"), F.col("warc_ts"), bucket.alias("_b"),
                         disp, F.col("source_part"), F.col("offset"))
    stats_cur = base.groupBy("source_part", "_b", "_disp").agg(
        F.min("offset"), F.max("offset"), F.count("*"),
        F.min("url"), F.max("url"), F.max("warc_ts"))
    stats_nostr = base.groupBy("source_part", "_b", "_disp").agg(
        F.min("offset"), F.max("offset"), F.count("*"), F.max("warc_ts"))
    # ranges from winners instead (tiny second agg over 200k rows)
    # --- winner twins ------------------------------------------------
    win_struct = (events.groupBy("url")
                  .agg(F.max(F.struct("warc_ts", "event_id")).alias("w")))
    win_dec = (events.groupBy("url")
               .agg(F.max(ordinal("warc_ts", "event_id")).alias("m")))

    def structmax_write(out_name):
        ev = events.select("url", "warc_ts", F.col("event_id").alias("_seq"),
                           "op", "html")
        w = lww_latest(ev, key="url", order_cols=("warc_ts", "_seq"),
                       payload_cols=["op", "html"])
        _write(w, out_name)

    def bjoin_dec_write(out_name):
        wk = (events.groupBy("url")
              .agg(F.max(ordinal("warc_ts", "event_id")).alias("_m")))
        w = (events.withColumn("_m", ordinal("warc_ts", "event_id"))
             .join(F.broadcast(wk), ["url", "_m"])
             .select("url", "warc_ts", F.col("event_id").alias("_seq"),
                     "op", "html"))
        _write(w, out_name)

    def _write(w, out_name):
        w = w.withColumnRenamed("_seq", "event_id")
        w = enrich_events(w).drop("op")
        w = w.withColumn("_bucket", bucket)
        out = os.path.join(tmp, out_name)
        (w.repartition(64, "_bucket")
         .sortWithinPartitions("_bucket", "url")
         .write.option("maxRecordsPerFile", 1 << 20)
         .partitionBy("_bucket").parquet(out))
        shutil.rmtree(out, ignore_errors=True)

    print("=== win_dec plan ===")
    win_dec.explain()
    print("=== stats_nostr plan ===")
    stats_nostr.explain()

    work = [
        ("stats_cur", lambda: stats_cur.collect()),
        ("stats_nostr", lambda: stats_nostr.collect()),
        ("win_struct", lambda: noop(win_struct)),
        ("win_dec", lambda: noop(win_dec)),
        ("structmax_write", lambda: structmax_write("o1")),
        ("bjoin_dec_write", lambda: bjoin_dec_write("o2")),
    ]
    res: dict[str, list] = {n: [] for n, _ in work}
    for _rep in range(3):
        for n, fn in work:
            t0 = time.time()
            fn()
            res[n].append(round(time.time() - t0, 3))
    for n, runs in res.items():
        print(n, runs, "min", min(runs))
    spark.stop()


if __name__ == "__main__":
    main()
