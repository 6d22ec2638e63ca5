"""A/B a RUNTIME-settable conf set inside one JVM, interleaved per rep
(the same steal-immunity argument as bench.py's baseline-catalog mode:
host noise hits both arms equally).

Usage:
  python scripts/conf_ab.py 'k=v;k2=v2' q1 q2 ...

Arm A = session defaults, arm B = the overrides; each timed run is a
noop write of the query rebuilt fresh (plan-build included, matching
bench.py's methodology).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_event_stream_spark.catalog import load_catalog
from solana_event_stream_spark.session import get_spark


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    overrides = dict(kv.split("=", 1) for kv in sys.argv[1].split(";"))
    names = sys.argv[2:]
    spark = get_spark("conf-ab")
    saved = {k: spark.conf.get(k, None) for k in overrides}

    def set_b():
        for k, v in overrides.items():
            spark.conf.set(k, v)

    def set_a():
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    catalog = load_catalog()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    print(f"{'query':32s} {'A(base)':>8s} {'B(conf)':>8s} {'B/A':>6s}")
    for name in names:
        fn = catalog[name].spark_fn
        set_a(); force(fn(spark, sf_dir))          # warm both arms
        set_b(); force(fn(spark, sf_dir))
        best_a = best_b = float("inf")
        for _ in range(reps):
            set_a()
            t0 = time.perf_counter(); force(fn(spark, sf_dir))
            best_a = min(best_a, time.perf_counter() - t0)
            set_b()
            t0 = time.perf_counter(); force(fn(spark, sf_dir))
            best_b = min(best_b, time.perf_counter() - t0)
        set_a()
        print(f"{name:32s} {best_a:8.3f} {best_b:8.3f} "
              f"{best_b / best_a:6.3f}", flush=True)


if __name__ == "__main__":
    main()
