"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual contract queries with the noop sink (computation only,
no count-based column pruning) and optionally dumps
``.explain("formatted")`` per query. Usage:

    python bench_extra.py [query ...]            # default: all 18 bench queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 \
    BENCH_EXTRA_PLANS=plans/r06 BENCH_EXTRA_SUFFIX=_before \
        python bench_extra.py dedup_simhash_pairs

Prints one JSON line: {"sf":..., "queries": {name: {"cold":s,"warm":s}}}.
Same session conf as bench.py (tmpfs shuffle, 24g driver heap).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS")
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "")
    from ais_etl_spark import contract, get_spark

    spark = get_spark(
        app_name="ais-etl-bench-extra",
        extra_conf={
            "spark.local.dir": os.environ.get(
                "BENCH_LOCAL_DIR", "/dev/shm/ais-etl-shuffle"
            ),
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    names = sys.argv[1:] or [
        "tf_codec_transcode", "cdc_lww_snapshot", "cdc_snapshot_by_lang",
        "cdc_engine_replay", "cdc_changelog", "cdc_point_lookup",
        "rel_pricing_summary", "rel_revenue_by_nation",
        "rel_top_orders_per_customer", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash_pairs", "dedup_embedding_cosine", "dedup_ngram_jaccard",
        "txt_doc_profile", "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_topk",
    ]
    out: dict = {}
    for name in names:
        fn = contract.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name} cold")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        spark.sparkContext.setJobDescription(f"bench_extra: {name} warm")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
