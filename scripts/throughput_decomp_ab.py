"""Localize the dex_pipeline_throughput cur-vs-base gap (VERDICT r19
item 1): time the query's layers interleaved in ONE JVM —
  jvm   = build_decode_input(scaled)          (JVM half only)
  dec   = build_events_core(scaled)           (+ both decode stages? no:
                                               core = one decode pass)
  full  = the catalog query                   (build_events + checksum)
for the current checkout vs a baseline checkout
(SPARK_GRAFT_BENCH_BASELINE_CATALOG), min-of-N per layer per arm.

Usage: SPARK_GRAFT_BENCH_BASELINE_CATALOG=... python scripts/throughput_decomp_ab.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solana_event_stream_spark.session import get_spark

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def make_layers(pipe_mod, queries_mod, spark):
    """(name -> zero-arg fn returning a DataFrame) for one checkout."""
    raw = pipe_mod.load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    n = int(os.environ.get("SPARK_GRAFT_PIPE_SCALE", "2000"))

    def scaled():
        return (raw.crossJoin(spark.range(n).select(F.col("id").alias("rep")))
                .withColumn("signature", F.concat_ws("_", "signature", "rep"))
                .withColumn("slot", F.col("slot") + F.col("rep") * 10000)
                .drop("rep")
                .repartition(int(spark.conf.get(
                    "spark.sql.shuffle.partitions", "32"))))

    import json as _json
    with open(os.path.join(FIXTURES, "meta.json")) as f:
        bot = _json.load(f)["bot_wallet"]
    return {
        "jvm": lambda: pipe_mod.build_decode_input(scaled()),
        "core": lambda: pipe_mod.build_events_core(scaled()),
        "events": lambda: pipe_mod.build_events(scaled(), bot_wallet=bot),
        "full": lambda: queries_mod.dex_pipeline_throughput(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1")),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("tp-decomp-ab")
    import importlib
    from solana_event_stream_spark.plans import pipeline as cur_pipe
    from solana_event_stream_spark.plans import pipeline_queries as cur_q
    base_dir = os.environ.get("SPARK_GRAFT_BENCH_BASELINE_CATALOG")
    sys.path.insert(0, "__nonexistent__")
    # reuse bench.py's baseline loader for the worker-visible rename
    import bench
    bench._load_baseline_catalog(spark, base_dir)
    base_pipe = importlib.import_module("ses_baseline.plans.pipeline")
    base_q = importlib.import_module("ses_baseline.plans.pipeline_queries")

    cur = make_layers(cur_pipe, cur_q, spark)
    base = make_layers(base_pipe, base_q, spark)
    out = {}
    for layer in ("jvm", "core", "events", "full"):
        force(cur[layer]()); force(base[layer]())      # warm both
        bc = bb = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); force(cur[layer]())
            bc = min(bc, time.perf_counter() - t0)
            t0 = time.perf_counter(); force(base[layer]())
            bb = min(bb, time.perf_counter() - t0)
        out[layer] = {"cur": round(bc, 3), "base": round(bb, 3),
                      "ratio": round(bc / bb, 3)}
        print(layer, out[layer], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
