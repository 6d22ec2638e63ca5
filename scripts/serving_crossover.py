"""LSH vs IVF serving crossover matrix (VERDICT r16 item 3).

The r16 decade sweep showed LSH serving growing with the codes scan
and IVF growing with queries x (nprobe/n_cells) x corpus — but the
IVF point used a deliberately-coarse 16-cell fixture. This probe runs
both serving methods at the DEPLOYMENT geometry (n_cells = sqrt(corpus),
nprobe=2, rerank_m=3k over the float tier — the README's recommended
serving config) across three corpus decades x three query volumes and
records which method wins where. The README serving recommendation
cites the resulting BENCH_NOTES table.

Corpora are seeded directly in the maintained deployment layout
(int8 codes [+ cell stamping, (cell, vec_id)-clustered] + float
re-rank tier + manifest) via maintenance_scale.seed_embedding; the
sqrt-sized quantizers at 500k (707 cells x 16 dims) cross the
4096-literal ceiling, so the Arrow assignment/probe backends are the
ones measured — the backends a real deployment runs.

Usage: python scripts/serving_crossover.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# scripts dir must be on sys.path BEFORE the maintenance_scale import
# below, so the module also imports when loaded from elsewhere (not
# just run as a script, where Python adds the dir automatically)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from maintenance_scale import seed_embedding, synth_vecs  # noqa: E402

DECADES = (5_000, 50_000, 500_000)
VOLUMES = (16, 256, 2_048)
K = 10
RERANK_M = 3 * K


def main() -> None:
    from solana_event_stream_spark.operators.similarity import (
        apply_ann_serving_batch)

    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 2)
    spark = get_spark("serving-crossover")
    out: dict[str, dict] = {}

    for n in DECADES:
        n_cells = max(2, int(round(n ** 0.5)))
        vecs = synth_vecs(spark, n)
        # sqrt(corpus) centroids drawn deterministically from the same
        # generator family (disjoint id range so they are not corpus
        # members) — uniform-ish occupancy over uniform synthetic data
        cents = [list(map(float, r.embedding)) for r in
                 sorted(synth_vecs(spark, 9_000_000 + n_cells)
                        .filter(F.col("vec_id") >= 9_000_000)
                        .collect(), key=lambda r: r.vec_id)]
        arms = []
        with tempfile.TemporaryDirectory() as dl, \
                tempfile.TemporaryDirectory() as di:
            cl, il = seed_embedding(spark, dl, vecs)
            ci, ii = seed_embedding(spark, di, synth_vecs(spark, n),
                                    centroids=cents)
            arms = [("lsh", cl, il,
                     dict(method="lsh", width=16, corpus_rows=n)),
                    ("ivf", ci, ii, dict(method="ivf", nprobe=2))]
            for q in VOLUMES:
                queries = (synth_vecs(spark, q)
                           .select(F.col("vec_id").alias("query_id"),
                                   "embedding").localCheckpoint())
                for name, cdir, idir, kw in arms:
                    odir = os.path.join(os.path.dirname(cdir), "out")
                    apply_ann_serving_batch(       # warm
                        spark, queries, 0, cdir, idir, odir, k=K,
                        rerank_m=RERANK_M, **kw)
                    best = float("inf")
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        apply_ann_serving_batch(
                            spark, queries, 0, cdir, idir, odir, k=K,
                            rerank_m=RERANK_M, **kw)
                        best = min(best, time.perf_counter() - t0)
                    key = f"n={n} q={q} {name}"
                    out[key] = {"wall_s": round(best, 3),
                                "n_cells": n_cells if name == "ivf"
                                else None,
                                "ms_per_query": round(best / q * 1e3,
                                                      2)}
                    print(json.dumps({key: out[key]}), flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
