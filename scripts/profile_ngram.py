"""A/B dedup_ngram_jaccard: current (separate shingle explodes in the
minhash and jaccard chains) vs shared-distinct-shingles (both chains
consume ONE exploded+distinct subtree; min over a set equals min over
the multiset, so band signatures are bit-identical). Verifies result
parity, then interleaved timing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F


def main() -> None:
    from ais_etl_spark import get_spark
    from ais_etl_spark.operators import dedup as D
    from ais_etl_spark.operators.dedup import shingles

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile-ngram",
        extra_conf={
            "spark.local.dir": "/dev/shm/ais-etl-shuffle",
            "spark.driver.memory": "24g",
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )

    def current():
        cand = D.minhash_lsh_pairs(docs, k=16, bands=4, shingle_n=3)
        return D.ngram_jaccard_pairs(
            docs, shingle_n=3, threshold=0.5, candidates=cand
        )

    def shared():
        k, bands, rows_per_band = 16, 4, 4
        sh = docs.select(
            F.col("doc_id"),
            F.explode_outer(shingles(F.col("text"), 3)).alias("s"),
        ).distinct()
        mins = [
            F.min(D._mh(F.lit(j), F.col("s"))).alias(f"_h{j}") for j in range(k)
        ]
        sigs = sh.groupBy("doc_id").agg(*mins).filter(F.col("_h0").isNotNull())
        per_band = F.array(
            *[
                F.md5(F.concat_ws("|", *[F.col(f"_h{b*rows_per_band+j}")
                                         for j in range(rows_per_band)]))
                for b in range(bands)
            ]
        )
        band = sigs.select(F.col("doc_id"), F.posexplode(per_band).alias("band", "sig"))
        a = band.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        b = band.select(F.col("doc_id").alias("doc_b"), "band", "sig")
        cand = (a.join(b, ["band", "sig"]).filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b").distinct())
        sizes = sh.groupBy("doc_id").agg(F.count("s").alias("n_sh"))
        aa = sh.select(F.col("doc_id").alias("doc_a"), "s")
        bb = sh.select(F.col("doc_id").alias("doc_b"), "s")
        inter = (cand.join(aa, "doc_a").join(bb, ["doc_b", "s"])
                 .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
        return (inter.join(sa, "doc_a").join(sb, "doc_b")
                .withColumn("jaccard", F.round(
                    F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
                .filter(F.col("jaccard") >= 0.5)
                .select("doc_a", "doc_b", "jaccard"))

    r1 = {tuple(r) for r in current().collect()}
    r2 = {tuple(r) for r in shared().collect()}
    print("parity:", r1 == r2, len(r1), len(r2), flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for rep in range(4):
        t0 = time.time(); noop(current()); t1 = time.time()
        noop(shared()); t2 = time.time()
        print(f"rep{rep} current {t1-t0:.2f}s shared {t2-t1:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
