"""Whole-stage-codegen x JIT-tier experiment (static JVM opts — needs a
fresh JVM per arm, so arms alternate across PROCESSES; each arm reports
min-of-N per query and the max single-run wall so a C2 freeze is
visible as an outlier).

Arms:
  off   — session default in this sandbox (codegen off, full tiered JIT)
  c1    — codegen ON + -XX:TieredStopAtLevel=1 (no C2: the freeze mode
          documented in BENCH_NOTES r8 cannot trigger)
  full  — codegen ON, full tiered JIT (the real-cluster config; in this
          sandbox historically stalls 10-170 s on C2 compiles)

Usage: python scripts/jit_ab.py <arm> q1 q2 ...   (child mode)
       python scripts/jit_ab.py --drive q1 q2 ... (alternate off/c1 3x)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def child(arm: str, names: list) -> None:
    from pyspark.sql import SparkSession

    from solana_event_stream_spark import session as S
    conf = dict(S._STATIC_CONF)
    conf["spark.sql.shuffle.partitions"] = str(S.n_cpus())
    b = SparkSession.builder.appName(f"jit-{arm}").master(
        f"local[{S.n_cpus()}]")
    if arm in ("c1", "full"):
        extra = "-XX:TieredStopAtLevel=1" if arm == "c1" else ""
        conf["spark.driver.extraJavaOptions"] = extra
        codegen = "true"
    else:
        codegen = "false"
    for k, v in conf.items():
        b = b.config(k, v)
    for k, v in S._RUNTIME_CONF.items():
        b = b.config(k, v)
    b = b.config("spark.sql.codegen.wholeStage", codegen)
    spark = b.getOrCreate()
    from solana_event_stream_spark.catalog import load_catalog
    catalog = load_catalog()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {}
    for name in names:
        fn = catalog[name].spark_fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(runs), 4), "max": round(max(runs), 4)}
    print("JITAB " + json.dumps({"arm": arm, "queries": out}))


def drive(names: list) -> None:
    results = {}
    for rep in range(3):
        for arm in ("off", "c1"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), arm] + names,
                capture_output=True, text=True, cwd=ROOT)
            for line in p.stdout.splitlines():
                if line.startswith("JITAB "):
                    rec = json.loads(line[6:])
                    for q, v in rec["queries"].items():
                        results.setdefault((rec["arm"], q), []).append(v)
    print(f"{'query':28s} {'off(min)':>9s} {'c1(min)':>9s} {'c1/off':>7s} "
          f"{'off(max)':>9s} {'c1(max)':>9s}")
    qs = sorted({q for (_, q) in results})
    for q in qs:
        off = results.get(("off", q), [])
        c1 = results.get(("c1", q), [])
        if not off or not c1:
            continue
        omin = min(v["min"] for v in off)
        cmin = min(v["min"] for v in c1)
        omax = max(v["max"] for v in off)
        cmax = max(v["max"] for v in c1)
        print(f"{q:28s} {omin:9.3f} {cmin:9.3f} {cmin / omin:7.3f} "
              f"{omax:9.3f} {cmax:9.3f}")


if __name__ == "__main__":
    if sys.argv[1] == "--drive":
        drive(sys.argv[2:])
    else:
        child(sys.argv[1], sys.argv[2:])
