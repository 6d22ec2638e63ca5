"""Scale points for the r15 maintenance-loop rework (VERDICT r14
items 1 and 8):

Arm A — seen-size flatness: per-trigger wall of ONE 300-doc minhash
maintenance trigger (apply_dedup_maintenance_batch, full commit
protocol) against a maintained corpus seeded at 5k vs 50k docs. With
the hashed-shingle verify tier the trigger's seen-side reads are the
band index + the narrow tier only — the wide corpus text is
write-only — so the wall must be ~flat across 10x seen (the substring
arm's r14 shape, reproduced on the modality that used to read
1.2 -> 2.8 s). Disk sizes of the corpus (text) vs verify tier are
reported as the bytes-read proxy: the tier is what a trigger scans
now.

Arm B — trigger-volume amortization: the same loop at 300 / 3,000 /
10,000 docs per trigger against the 5k seen corpus. The r14 floor
decomposition claims the ~2.4 s trigger is fixed local-mode overhead
that amortizes at real volumes: docs/s at 10k must be >= 3x the
300-doc figure.

Each measurement copies the seeded state aside and restores it, so
every rep commits against identical history.

Usage: python scripts/maintenance_scale.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from solana_event_stream_spark.operators.dedup_index import (  # noqa: E402
    apply_dedup_maintenance_batch, create_minhash_index,
    minhash_index_rows, minhash_verify_rows, open_dedup_index)

SMALL = "/root/testdata/sf0.1"
BIG = "/root/repo/.bench_data/sf1.0"


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def seed(spark, d: str, seen_docs) -> tuple[str, str]:
    """Commit ``seen_docs`` as the maintained state DIRECTLY (corpus
    dir + verify tier + index rows + manifest meta, the loop's layout)
    — NOT through a maintenance trigger: sf1.0's replica docs are
    near-dups of sf0.1's (per-replica ' rN' suffix), so a loop-driven
    seed would dedup 50k back to ~5k and the big arm would not be 10x
    seen at all."""
    cdir, idir = os.path.join(d, "corpus"), os.path.join(d, "index")
    create_minhash_index(idir)
    store = open_dedup_index(idir)
    seen_docs.write.parquet(os.path.join(cdir, "batch=0"))
    (minhash_verify_rows(seen_docs).sortWithinPartitions("doc_id")
     .write.parquet(os.path.join(idir, "verify=0")))
    store.append(minhash_index_rows(seen_docs), meta_update={
        "last_stream_batch": 0, "corpus_batches": ["batch=0"],
        "verify_batches": ["verify=0"]})
    return cdir, idir


def one_trigger(spark, cdir, idir, batch, batch_id, reps) -> float:
    """min-of-reps wall of one full commit trigger, state restored
    between reps (identical history every time)."""
    best = float("inf")
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as snap:
            shutil.copytree(cdir, os.path.join(snap, "c"))
            shutil.copytree(idir, os.path.join(snap, "i"))
            t0 = time.perf_counter()
            assert apply_dedup_maintenance_batch(
                spark, batch, batch_id, cdir, idir)
            best = min(best, time.perf_counter() - t0)
            shutil.rmtree(cdir)
            shutil.rmtree(idir)
            shutil.copytree(os.path.join(snap, "c"), cdir)
            shutil.copytree(os.path.join(snap, "i"), idir)
    return best


def fresh_batch(spark, n: int, id_base: int):
    """A trigger batch of ~90% FRESH docs (unique per-doc vocabulary —
    zero index candidates, isolating the seen-side scan cost from
    candidate-volume growth) + 10% near-dups of sf0.1 originals (the
    probe still verifies real hits)."""
    n_dup = max(1, n // 10)
    dups = (spark.read.parquet(os.path.join(SMALL, "documents.parquet"))
            .select("doc_id", "text").filter(F.col("doc_id") < n_dup)
            .select((F.col("doc_id") + id_base).alias("doc_id"),
                    F.concat("text", F.lit(" xdup")).alias("text")))
    fresh = spark.range(n - n_dup).select(
        (F.col("id") + id_base + 500_000).alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{j}x"), F.col("id").cast("string"))
            for j in range(40)]).alias("text"))
    return dups.unionByName(fresh).localCheckpoint()




def synth_docs(spark, n: int):
    """n synthetic docs with DISJOINT per-doc vocabulary (no cross-doc
    near-dups), generated JVM-side — the 500k decade can't come from
    the sf fixtures (sf1.0 tops out at 50k and its replicas are
    near-dups), and one generator for every decade keeps the doc
    shape identical across scale points."""
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda p: F.concat(F.lit("s"),
                               F.col("doc_id").cast("string"),
                               F.lit("w"), p.cast("string"))), " ")
    return (spark.range(n).select(F.col("id").alias("doc_id"))
            .select("doc_id", text.alias("text")))


def synth_vecs(spark, n: int, width: int = 16):
    """n deterministic pseudo-random embeddings, JVM-side."""
    cols = [(F.pmod(F.xxhash64(F.col("id") * 31 + d), F.lit(20001))
             / 10000.0 - 1.0).alias(f"_d{d}") for d in range(width)]
    return (spark.range(n).select(F.col("id").alias("vec_id"), *cols)
            .select("vec_id", F.array(*[F.col(f"_d{d}")
                                        for d in range(width)])
                    .alias("embedding")))


def seed_embedding(spark, d: str, vecs, width: int = 16,
                   centroids: list | None = None):
    """Commit vecs DIRECTLY as a quantized maintained embedding corpus
    with a float re-rank tier (the serving deployment layout);
    ``centroids`` pins the IVF coarse quantizer and stamps cells
    (cell, vec_id)-clustered, the r16 IVF serving tier."""
    from solana_event_stream_spark.operators.dedup_index import (
        _assign_ivf_cells, create_embedding_index, embedding_index_rows,
        float_tier_path)
    from solana_event_stream_spark.operators.similarity import (
        quantize_embeddings_int8)

    cdir, idir = os.path.join(d, "corpus"), os.path.join(d, "index")
    create_embedding_index(idir, n_planes=12, width=width, n_bands=2,
                           ivf_centroids=centroids)
    store = open_dedup_index(idir)
    vecs = vecs.localCheckpoint()
    q = quantize_embeddings_int8(vecs)
    order = ["vec_id"]
    if centroids is not None:
        # ceiling-aware assignment (r17): a sqrt(corpus)-sized
        # quantizer crosses IVF_LITERAL_CEILING — the shared helper
        # switches to the Arrow backend exactly like the loop
        cells = _assign_ivf_cells(vecs, centroids)
        q = q.join(cells, "vec_id")
        order = ["cell", "vec_id"]
    (q.repartitionByRange(8, *order).sortWithinPartitions(*order)
     .write.parquet(os.path.join(cdir, "batch=0")))
    (vecs.repartitionByRange(8, "vec_id")
     .sortWithinPartitions("vec_id")
     .write.parquet(os.path.join(float_tier_path(cdir), "batch=0")))
    store.append(
        embedding_index_rows(vecs, 2, 12, width=width),
        meta_update={"last_stream_batch": 0,
                     "corpus_batches": ["batch=0"],
                     "corpus_quantized": True, "float_tier": True,
                     "float_batches": ["batch=0"]})
    return cdir, idir


def main_decade(reps: int) -> None:
    """VERDICT r15 item 4: one more decade of seen. Arm A's flatness
    proof at synthetic 5k/50k/500k (identical doc shape per decade;
    bytes decomposed per seen-side source), plus the serving stream's
    per-trigger wall + corpus-resolve cost against maintained
    embedding corpora at the same decades."""
    from solana_event_stream_spark.operators.dedup_index import (
        dedup_pairs_cross_indexed)
    from solana_event_stream_spark.operators.similarity import (
        apply_ann_serving_batch)

    spark = get_spark("maintenance-scale-decade")
    out: dict[str, dict] = {}
    batch = fresh_batch(spark, 300, 9_000_000)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for n in (5_000, 50_000, 500_000):
        seen = synth_docs(spark, n).localCheckpoint()
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed(spark, d, seen)
            one_trigger(spark, cdir, idir, batch, 1, 1)       # warm
            wall = one_trigger(spark, cdir, idir, batch, 1, reps)
            store = open_dedup_index(idir)
            idx = store.load(spark)
            tier = spark.read.parquet(os.path.join(idir, "verify=0"))
            force(dedup_pairs_cross_indexed(batch, None, idx,
                                            seen_verify=tier))
            probe = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                force(dedup_pairs_cross_indexed(batch, None, idx,
                                                seen_verify=tier))
                probe = min(probe, time.perf_counter() - t0)
            out[f"minhash seen={n}"] = {
                "trigger_wall_s": round(wall, 3),
                "tier_probe_s": round(probe, 3),
                "corpus_text_bytes": du(cdir),
                "index_bytes": du(os.path.join(
                    idir, store._batches[0])),
                "verify_tier_bytes": du(os.path.join(idir,
                                                     "verify=0")),
            }
            print(json.dumps({f"minhash seen={n}":
                              out[f"minhash seen={n}"]}), flush=True)

    queries = (synth_vecs(spark, 16)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())
    # 16 coarse centroids drawn deterministically from the same
    # generator (ids 100..115 — present in every corpus decade)
    cents = [list(map(float, r.embedding)) for r in
             sorted(synth_vecs(spark, 116).filter(
                 F.col("vec_id") >= 100).collect(),
                 key=lambda r: r.vec_id)]
    for n in (5_000, 50_000, 500_000):
        vecs = synth_vecs(spark, n)
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed_embedding(spark, d, vecs)
            t0 = time.perf_counter()
            store = open_dedup_index(idir)
            spark.read.parquet(os.path.join(cdir, "batch=0"))                 .limit(1).collect()
            resolve = time.perf_counter() - t0
            odir = os.path.join(d, "out")
            for arm, rr in (("quant", None), ("rerank", 30)):
                apply_ann_serving_batch(          # warm
                    spark, queries, 0, cdir, idir, odir, k=10,
                    rerank_m=rr, method="lsh", width=16,
                    corpus_rows=n)
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    apply_ann_serving_batch(
                        spark, queries, 0, cdir, idir, odir, k=10,
                        rerank_m=rr, method="lsh", width=16,
                        corpus_rows=n)
                    best = min(best, time.perf_counter() - t0)
                out[f"serving n={n} {arm}"] = {
                    "trigger_wall_s": round(best, 3),
                    "resolve_s": round(resolve, 4),
                    "codes_bytes": du(os.path.join(cdir, "batch=0")),
                    "float_tier_bytes": du(os.path.join(
                        cdir, "float", "batch=0")),
                }
                print(json.dumps({f"serving n={n} {arm}":
                                  out[f"serving n={n} {arm}"]}),
                      flush=True)
        # IVF serving arm (r16): cell-stamped corpus, nprobe=2 of 16
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed_embedding(spark, d, synth_vecs(spark, n),
                                        centroids=cents)
            odir = os.path.join(d, "out")
            apply_ann_serving_batch(spark, queries, 0, cdir, idir,
                                    odir, k=10, method="ivf",
                                    nprobe=2)       # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                apply_ann_serving_batch(spark, queries, 0, cdir, idir,
                                        odir, k=10, method="ivf",
                                        nprobe=2)
                best = min(best, time.perf_counter() - t0)
            out[f"serving n={n} ivf"] = {
                "trigger_wall_s": round(best, 3),
                "codes_bytes": du(os.path.join(cdir, "batch=0"))}
            print(json.dumps({f"serving n={n} ivf":
                              out[f"serving n={n} ivf"]}), flush=True)

    print(json.dumps(out, indent=2))


def main() -> None:
    # first numeric token anywhere in argv, so both
    # `maintenance_scale.py 5 --decade` and `... --decade 5` work
    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 3)
    if "--decade" in sys.argv:
        main_decade(reps)
        return
    spark = get_spark("maintenance-scale")
    out: dict[str, dict] = {}

    batch = fresh_batch(spark, 300, 9_000_000)

    # ---- Arm A: seen-size flatness -------------------------------
    # r15 loop (narrow verify tier) vs the r14 shape (the same probe
    # but verifying from the WIDE corpus text — still reachable via
    # dedup_pairs_cross_indexed's seen_docs form), both at 1x and 10x
    # seen. The r15 wall must stay flat; the r14 shape pays the full
    # text scan.
    from solana_event_stream_spark.operators.dedup_index import (
        dedup_pairs_cross_indexed)

    for label, path in (("seen=5k", SMALL), ("seen=50k", BIG)):
        seen = (spark.read.parquet(os.path.join(path,
                                                "documents.parquet"))
                .select("doc_id", "text"))
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed(spark, d, seen)
            # warm (separate id space so the timed trigger's dedup
            # work is identical across reps)
            one_trigger(spark, cdir, idir, batch, 1, 1)
            wall = one_trigger(spark, cdir, idir, batch, 1, reps)
            # the r14 probe shape: same candidates, verify re-attached
            # from the wide corpus read (probe only — no commit, which
            # only ADDS identical write cost to both shapes)
            store = open_dedup_index(idir)
            idx = store.load(spark)
            corpus = spark.read.parquet(os.path.join(cdir, "batch=0"))

            def force(df):
                df.write.format("noop").mode("overwrite").save()

            force(dedup_pairs_cross_indexed(batch, corpus, idx))  # warm
            old = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                force(dedup_pairs_cross_indexed(batch, corpus, idx))
                old = min(old, time.perf_counter() - t0)
            # the r15 probe shape, apples to apples (probe only, no
            # commit): verify from the narrow tier
            tier = spark.read.parquet(os.path.join(idir, "verify=0"))
            force(dedup_pairs_cross_indexed(batch, None, idx,
                                            seen_verify=tier))
            new_p = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                force(dedup_pairs_cross_indexed(batch, None, idx,
                                                seen_verify=tier))
                new_p = min(new_p, time.perf_counter() - t0)
            out[f"trigger {label}"] = {
                "wall_s": round(wall, 3),
                "r15_tier_probe_s": round(new_p, 3),
                "r14_wide_probe_s": round(old, 3),
                "corpus_text_bytes": du(cdir),
                "index_plus_tier_bytes": du(idir),
            }

    # ---- Arm B: trigger-volume amortization ----------------------
    seen = (spark.read.parquet(os.path.join(SMALL, "documents.parquet"))
            .select("doc_id", "text"))
    for n in (300, 3000, 10000):
        vol = fresh_batch(spark, n, 9_000_000)
        with tempfile.TemporaryDirectory() as d:
            cdir, idir = seed(spark, d, seen)
            one_trigger(spark, cdir, idir, vol, 1, 1)   # warm
            wall = one_trigger(spark, cdir, idir, vol, 1, reps)
            out[f"volume n={n}"] = {
                "wall_s": round(wall, 3),
                "docs_per_s": round(n / wall, 1),
            }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
