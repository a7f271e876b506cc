"""Feed generator: determinism, skew, dup, disorder properties."""

from pyspark.sql import functions as F

from ais_etl_spark.feed import synth_cdc_feed


def test_deterministic_across_runs(spark):
    a = synth_cdc_feed(spark, n_events=500, seed=11)
    b = synth_cdc_feed(spark, n_events=500, seed=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_deterministic_across_parallelism(spark):
    a = synth_cdc_feed(spark, n_events=500, seed=11, num_partitions=2)
    b = synth_cdc_feed(spark, n_events=500, seed=11, num_partitions=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_and_ops(spark):
    f = synth_cdc_feed(spark, n_events=300, seed=3)
    assert set(f.columns) == {"event_id", "op", "url", "warc_ts", "html",
                              "source_part", "offset"}
    ops = {r.op for r in f.select("op").distinct().collect()}
    assert ops == {"I", "U", "D"}
    # D events carry no payload
    assert f.filter("op = 'D' and html is not null").count() == 0
    assert f.filter("op <> 'D' and html is null").count() == 0


def test_skew_present(spark):
    f = synth_cdc_feed(spark, n_events=2000, seed=5, hot_urls=2, hot_pct=30)
    top = (f.groupBy("url").count().orderBy(F.desc("count")).limit(2)
           .agg(F.sum("count")).first()[0])
    assert top > 0.2 * 2000  # two hot urls absorb >20% of events


def test_duplicates_present(spark):
    f = synth_cdc_feed(spark, n_events=2000, seed=5, dup_pct=5)
    dup_groups = (f.groupBy("url", "warc_ts", "op").count().filter("count > 1").count())
    assert dup_groups > 0


def test_event_time_disorder_bounded(spark):
    f = synth_cdc_feed(spark, n_events=1000, seed=5, jitter_seconds=600)
    # |warc_ts - (BASE + content_id)| <= jitter; disorder exists but bounded
    x = f.select(
        (F.unix_timestamp("warc_ts") - F.unix_timestamp(F.lit("2026-01-01 00:00:00").cast("timestamp"))
         - F.col("event_id")).alias("d")
    ).agg(F.min("d"), F.max("d")).first()
    assert x[0] >= -2 * 600 and x[1] <= 2 * 600
