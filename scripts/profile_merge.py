"""Phase profiler for the merge path (guide §1) — measurement only,
no engine change. Times _batch_stats / spark write / footer harvest /
commit+lineage per merge, on two shapes:

  replay : the cdc_engine_replay gate shape (contract feed, 16 buckets,
           4 fenced batches) at $SPARK_GRAFT_SF_DIR
  ingest : the bench headline shape (synth feed, 2M events, 64 buckets)

Usage: python scripts/profile_merge.py [replay|ingest|both]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

PHASES: list[dict] = []


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        out = orig(self, *a, **kw)
        PHASES.append({"phase": name, "sec": round(time.time() - t0, 3)})
        return out

    setattr(cls, name, timed)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from ais_etl_spark import get_spark
    from ais_etl_spark.lake import LakeTable
    from ais_etl_spark.lake import table as table_mod

    spark = get_spark(
        app_name="profile-merge",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )

    for m in ("_batch_stats", "_write_data", "_write_commit",
              "_append_lineage", "_exact_probe", "_footer_stats_all"):
        if hasattr(LakeTable, m):
            _wrap(LakeTable, m)

    # split _write_data: time the spark parquet write itself
    from pyspark.sql.readwriter import DataFrameWriter

    _orig_pq = DataFrameWriter.parquet

    def timed_pq(self, *a, **kw):
        t0 = time.time()
        out = _orig_pq(self, *a, **kw)
        PHASES.append({"phase": "spark_parquet_write", "sec": round(time.time() - t0, 3)})
        return out

    DataFrameWriter.parquet = timed_pq

    # split _write_data into spark-write vs footer harvest: time the
    # pool.map separately by wrapping _footer_stats calls in bulk is
    # awkward; instead wrap ThreadPoolExecutor.map duration via a
    # sub-wrap of _footer_stats accumulating total count only.

    from ais_etl_spark.streaming.ingest import PAGES_SCHEMA, apply_cdc_batch

    out: dict = {}

    if which in ("replay", "both"):
        from ais_etl_spark.contract import _feed_with_html

        t00 = time.time()
        feed = _feed_with_html(spark, sf_dir).localCheckpoint(eager=True)
        lo, hi = feed.agg(F.min("event_id"), F.max("event_id")).first()
        t_feed = time.time() - t00
        tmp = tempfile.mkdtemp(prefix="prof-replay-")
        table = LakeTable.create(
            spark, os.path.join(tmp, "pages"), PAGES_SCHEMA, key="url",
            order_col="warc_ts", n_buckets=16,
        )
        n_batches = 4
        step = (hi - lo) // n_batches + 1
        batches = []
        for b in range(n_batches):
            PHASES.clear()
            t0 = time.time()
            chunk = feed.filter(
                (F.col("event_id") >= lo + b * step)
                & (F.col("event_id") < lo + (b + 1) * step)
            )
            apply_cdc_batch(table, chunk, batch_id=f"prof-{b}")
            wall = round(time.time() - t0, 3)
            batches.append({"batch": b, "wall": wall, "phases": list(PHASES)})
        t0 = time.time()
        n = table.read().count()
        out["replay"] = {
            "feed_checkpoint_sec": round(t_feed, 3),
            "batches": batches,
            "final_read_sec": round(time.time() - t0, 3),
            "rows": n,
        }

    if which in ("ingest", "both"):
        from ais_etl_spark.feed import synth_cdc_feed

        n_events = int(os.environ.get("PROF_EVENTS", "2000000"))
        tmp = tempfile.mkdtemp(prefix="prof-ingest-")
        feed_path = os.path.join(tmp, "feed")
        par = spark.sparkContext.defaultParallelism * 4
        synth_cdc_feed(
            spark, n_events=n_events, seed=42, hot_pct=20, num_partitions=par
        ).write.parquet(feed_path)
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
        events = spark.read.parquet(feed_path)
        runs = []
        for i in range(3):
            PHASES.clear()
            table = LakeTable.create(
                spark, os.path.join(tmp, f"pages-{i}"), PAGES_SCHEMA,
                key="url", order_col="warc_ts", n_buckets=64,
            )
            t0 = time.time()
            apply_cdc_batch(table, events, batch_id="prof-0")
            wall = round(time.time() - t0, 3)
            runs.append({"run": i, "wall": wall, "phases": list(PHASES)})
        out["ingest"] = {"feed_bytes": total, "events": n_events, "runs": runs}

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
