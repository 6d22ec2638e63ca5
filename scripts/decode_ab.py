"""Interleaved A/B of the decode stage: vectorized (decode_vec specs)
vs per-row Python decoders, on the scale-probe corpus (VERDICT r8
item 1 "done" gate: >= 1.5x at the 940k-tx point).

Method: build decode_input for the replicated fixture corpus ONCE,
write it to parquet (so both arms re-read identical bytes and the JVM
prep cost is out of the decode delta), then alternate
vectorized=True/False runs of the SAME mapInArrow stage + count() in
one JVM, best-of-N per arm reported alongside every rep (this sandbox's
wall clock swings under gVisor; interleaving is the control).

Run:  python scripts/decode_ab.py [scale]     (default 20000 = 940k tx)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solana_event_stream_spark.session import get_spark

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("decode-ab")
    from solana_event_stream_spark.plans.pipeline import (
        _decode_batches, build_decode_input, load_raw_transactions)
    from solana_event_stream_spark.schemas import EVENT_SCHEMA

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    raw = (raw.crossJoin(spark.range(scale).select(F.col("id").alias("rep")))
           .withColumn("signature", F.concat_ws("_", "signature", "rep"))
           .withColumn("slot", F.col("slot") + F.col("rep") * 10000)
           .drop("rep"))

    tmp = tempfile.mkdtemp(prefix="decode_ab_")
    din_path = os.path.join(tmp, "decode_input")
    (build_decode_input(raw)
     .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
     .write.mode("overwrite").parquet(din_path))
    din = spark.read.parquet(din_path)
    n_rows = din.count()
    print(f"# decode_input rows: {n_rows} (scale {scale})", flush=True)

    schema = EVENT_SCHEMA

    def run(vectorized: bool) -> float:
        out = din.mapInArrow(
            lambda it: _decode_batches(it, None, vectorized=vectorized),
            schema=schema)
        t0 = time.perf_counter()
        out.select(F.count(F.lit(1))).collect()
        return time.perf_counter() - t0

    # In-process single-core probe (same method as the r7 profile): the
    # materialized batches through _decode_batches directly, interleaved,
    # no scan/collect/task noise — the pure stage-level ratio.
    tbl = din.limit(400_000).toArrow().combine_chunks()
    batches = tbl.to_batches(max_chunksize=10_000)

    def run_inproc(vectorized: bool) -> float:
        t0 = time.perf_counter()
        nr = 0
        for out in _decode_batches(iter(batches), None,
                                   vectorized=vectorized):
            nr += out.num_rows
        assert nr > 0
        return time.perf_counter() - t0

    run_inproc(True), run_inproc(False)          # warm
    ip = {"vec": [], "py": []}
    for _ in range(reps):
        ip["vec"].append(round(run_inproc(True), 3))
        ip["py"].append(round(run_inproc(False), 3))
    print(json.dumps({
        "probe": "decode_ab_inproc_1core", "rows": tbl.num_rows,
        "vec_sec": ip["vec"], "py_sec": ip["py"],
        "speedup": round(min(ip["py"]) / min(ip["vec"]), 3),
        "events_per_sec_per_core": round(tbl.num_rows / min(ip["vec"])),
    }), flush=True)

    # warm both code paths once (worker reuse, JIT, imports)
    run(True)
    run(False)

    times = {"vec": [], "py": []}
    for _ in range(reps):
        times["vec"].append(round(run(True), 3))
        times["py"].append(round(run(False), 3))
    best_vec, best_py = min(times["vec"]), min(times["py"])
    print(json.dumps({
        "probe": "decode_ab", "scale": scale, "rows": n_rows,
        "vec_sec": times["vec"], "py_sec": times["py"],
        "best_vec": best_vec, "best_py": best_py,
        "speedup": round(best_py / best_vec, 3),
        "events_per_sec_vec": round(n_rows / best_vec),
    }), flush=True)


if __name__ == "__main__":
    main()
