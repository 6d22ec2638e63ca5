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
    apply_dedup_maintenance_batch, create_minhash_index)

SMALL = "/root/testdata/sf0.1"
BIG = "/root/repo/.bench_data/sf1.0"


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def seed(spark, d: str, seen_docs) -> tuple[str, str]:
    cdir, idir = os.path.join(d, "corpus"), os.path.join(d, "index")
    create_minhash_index(idir)
    assert apply_dedup_maintenance_batch(spark, seen_docs, 0, cdir, idir)
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


def fresh_batch(spark, src_dir: str, n: int, id_base: int):
    return (spark.read.parquet(os.path.join(src_dir,
                                            "documents.parquet"))
            .select("doc_id", "text").filter(F.col("doc_id") < n)
            .select((F.col("doc_id") + id_base).alias("doc_id"),
                    F.concat("text", F.lit(" xdup")).alias("text"))
            .localCheckpoint())


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("maintenance-scale")
    out: dict[str, dict] = {}

    batch = fresh_batch(spark, SMALL, 300, 9_000_000)

    # ---- Arm A: seen-size flatness -------------------------------
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
            out[f"trigger {label}"] = {
                "wall_s": round(wall, 3),
                "corpus_text_bytes": du(cdir),
                "index_plus_tier_bytes": du(idir),
            }

    # ---- Arm B: trigger-volume amortization ----------------------
    seen = (spark.read.parquet(os.path.join(SMALL, "documents.parquet"))
            .select("doc_id", "text"))
    for n in (300, 3000, 10000):
        vol = fresh_batch(spark, BIG if n > 5000 else SMALL, n,
                          9_000_000)
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
