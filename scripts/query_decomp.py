"""Per-query wall decomposition: build (driver-side fn invocation,
including any eager sub-jobs), final-plan compile, and noop execution.

Usage: python scripts/query_decomp.py q1 q2 ...   (default: the heavy set)

For each query, reps x (t_build, t_plan, t_exec, n_jobs) with min-of-N
per component; jobs counted via the status tracker. This is the guide
§1 "where is the time" step for a local[32] bench whose inputs are
KB-to-MB scale: the interesting split is driver/plan overhead vs
executed work, not stage-level skew.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_event_stream_spark.catalog import load_catalog
from solana_event_stream_spark.session import get_spark

HEAVY = [
    "embedding_curation", "dedup_embedding_cosine", "dex_pipeline_throughput",
    "dedup_clusters", "text_battery", "q578_nation_trade_flows",
    "dedup_ngram_jaccard", "pubkey_short_by_mint", "nation_rollup_coverage",
    "dex_event_ordering", "dedup_minhash_lsh", "dex_events_by_type",
    "dedup_exact", "ann_ivf_topk", "q1_pricing_summary", "dedup_simhash",
]


def main() -> None:
    names = sys.argv[1:] or HEAVY
    spark = get_spark("decomp")
    sc = spark.sparkContext
    catalog = load_catalog()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_DECOMP_RUNS", "3"))
    print(f"{'query':32s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s} {'jobs':>5s}")
    for name in names:
        spec = catalog[name]
        # warm (footer cache, worker spin-up)
        df = spec.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        bb = bp = be = float("inf")
        jobs = 0
        for _ in range(reps):
            j0 = sc.statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            bb = min(bb, t1 - t0)
            bp = min(bp, t2 - t1)
            be = min(be, t3 - t2)
            jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - len(j0)
        print(f"{name:32s} {bb:7.3f} {bp:7.3f} {be:7.3f} "
              f"{bb + bp + be:7.3f} {jobs:5d}", flush=True)


if __name__ == "__main__":
    main()
