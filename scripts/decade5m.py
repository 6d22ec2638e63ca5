"""VERDICT r17 item 5: push the maintained-index decade sweep to 5M
rows. Every 100 TB claim so far extrapolates from the 500k decade;
this run re-measures 500k IN THE SAME WINDOW (anchor against the r17
tables) and adds the 5M point for each maintained-state shape:

- minhash maintenance: one 300-doc trigger's full-commit wall +
  the narrow tier probe (the r15 flatness claim, two decades on);
  per-trigger state reads are the band index + hashed-shingle tier,
  so the wall must stay ~flat while corpus bytes grow 10x.
- embedding serving: per-trigger wall at q=16 for the quantized-LSH
  arm and the IVF arm at the deployment geometry (n_cells =
  sqrt(corpus), nprobe=2) + the manifest corpus-resolve cost. The
  r17 crossover says LSH grows with the codes scan while IVF stays
  flat — 5M is the decade where that gap should widen.
- quantizer refit: refit_ivf_centroids wall with the fit sample
  capped at 50k (the sample_frac knob) — r17 measured 1.8x wall for
  100x corpus (4.9 -> 8.9 s at 5k -> 500k); the only O(corpus) terms
  are one Arrow assignment pass + the cluster-preserving rewrite, so
  5M should stay on that near-flat line.

Unlike one_trigger's copy-aside/restore (too much IO at 5M state),
trigger reps here use SUCCESSIVE batch ids — the state grows by
300 docs per rep, noise against a 5M corpus.

Usage: python scripts/decade5m.py [reps] [--small] (--small swaps in
5k/50k decades for a fast harness check).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from maintenance_scale import (  # noqa: E402
    du, fresh_batch, seed, seed_embedding, synth_docs, synth_vecs)

K_QUERIES = 16
FIT_CAP = 50_000


def main() -> None:
    from solana_event_stream_spark.operators.dedup_index import (
        apply_dedup_maintenance_batch, dedup_pairs_cross_indexed,
        open_dedup_index, refit_ivf_centroids)
    from solana_event_stream_spark.operators.similarity import (
        apply_ann_serving_batch)

    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 2)
    decades = (5_000, 50_000) if "--small" in sys.argv \
        else (500_000, 5_000_000)
    spark = get_spark("decade5m")
    out: dict[str, dict] = {}

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- minhash maintenance: trigger wall + tier probe ----
    for n in decades:
        docs = synth_docs(spark, n)
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed(spark, d, docs)
            store = open_dedup_index(idir)
            wall = float("inf")
            for r in range(reps):
                batch = fresh_batch(spark, 300, 9_000_000 + r * 1_000)
                t0 = time.perf_counter()
                assert apply_dedup_maintenance_batch(
                    spark, batch, r + 1, cdir, idir)
                wall = min(wall, time.perf_counter() - t0)
            store = open_dedup_index(idir)
            idx = store.load(spark)
            tier = spark.read.parquet(*[
                os.path.join(idir, b)
                for b in store.meta["verify_batches"]])
            probe = float("inf")
            batch = fresh_batch(spark, 300, 9_900_000)
            for _ in range(reps):
                t0 = time.perf_counter()
                force(dedup_pairs_cross_indexed(batch, None, idx,
                                                seen_verify=tier))
                probe = min(probe, time.perf_counter() - t0)
            out[f"minhash seen={n}"] = {
                "trigger_wall_s": round(wall, 3),
                "tier_probe_s": round(probe, 3),
                "corpus_text_bytes": du(cdir),
                "verify_tier_bytes": sum(
                    du(os.path.join(idir, b))
                    for b in store.meta["verify_batches"]),
            }
            print(json.dumps({f"minhash seen={n}":
                              out[f"minhash seen={n}"]}), flush=True)

    # ---- embedding serving + refit at deployment geometry ----
    queries = (synth_vecs(spark, K_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())
    for n in decades:
        n_cells = max(16, int(n ** 0.5))
        cents = [list(map(float, r.embedding)) for r in
                 sorted(synth_vecs(spark, 100 + n_cells).filter(
                     F.col("vec_id") >= 100).collect(),
                     key=lambda r: r.vec_id)]
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed_embedding(spark, d, synth_vecs(spark, n),
                                        centroids=cents)
            t0 = time.perf_counter()
            open_dedup_index(idir)
            spark.read.parquet(os.path.join(cdir, "batch=0")) \
                .limit(1).collect()
            resolve = time.perf_counter() - t0
            odir = os.path.join(d, "out")
            arms = {}
            for arm, kw in (("lsh_quant", dict(method="lsh", width=16,
                                               corpus_rows=n)),
                            ("ivf", dict(method="ivf", nprobe=2))):
                apply_ann_serving_batch(spark, queries, 0, cdir, idir,
                                        odir, k=10, **kw)    # warm
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    apply_ann_serving_batch(spark, queries, 0, cdir,
                                            idir, odir, k=10, **kw)
                    best = min(best, time.perf_counter() - t0)
                arms[arm] = round(best, 3)
            t0 = time.perf_counter()
            refit_ivf_centroids(spark, cdir, idir,
                                sample_frac=min(1.0, FIT_CAP / n),
                                iters=4)
            refit = time.perf_counter() - t0
            out[f"embedding n={n}"] = {
                "n_cells": n_cells,
                "resolve_s": round(resolve, 4),
                "serving_wall_s": arms,
                "refit_wall_s": round(refit, 3),
                "codes_bytes": du(os.path.join(cdir, "batch=0")),
            }
            print(json.dumps({f"embedding n={n}":
                              out[f"embedding n={n}"]}), flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
