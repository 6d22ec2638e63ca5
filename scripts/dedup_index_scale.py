"""Scale point for the materialized dedup index (VERDICT r12 item 1):
per-batch wall of the index-backed cross-pair probe must be ~flat in
seen-corpus size, while the recompute form (re-hash history every
batch) grows with it.

Two seen corpora (sf0.1 documents = 5k docs; sf1.0 = 50k docs, a
strict superset), ONE fixed batch (200 sf0.1 docs with planted ' xdup'
near-copies under fresh ids). For each corpus: time the recompute
``dedup_pairs_cross`` and the index-backed
``dedup_pairs_cross_indexed`` (index pre-built — the build is the
amortized one-off an append-only pipeline pays once per batch at
APPEND time, also reported), interleaved best-of-N. Embedding analog
with the 2k / 20k embeddings tables.

Usage: python scripts/dedup_index_scale.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from solana_event_stream_spark.operators.dedup import (  # noqa: E402
    dedup_pairs_cross, embedding_pairs_cross)
from solana_event_stream_spark.operators.dedup_index import (  # noqa: E402
    create_embedding_index, create_minhash_index,
    dedup_pairs_cross_indexed, embedding_index_rows,
    embedding_pairs_cross_indexed, minhash_index_rows)

SMALL = "/root/testdata/sf0.1"
BIG = "/root/repo/.bench_data/sf1.0"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("dedup-index-scale")
    out: dict[str, dict] = {}

    batch_src = (spark.read.parquet(os.path.join(SMALL,
                                                 "documents.parquet"))
                 .select("doc_id", "text").filter(F.col("doc_id") < 200))
    batch = (batch_src.select((F.col("doc_id") + 9_000_000)
                              .alias("doc_id"),
                              F.concat("text", F.lit(" xdup"))
                              .alias("text"))
             .localCheckpoint())

    for label, path in (("seen=5k", SMALL), ("seen=50k", BIG)):
        seen = (spark.read.parquet(os.path.join(path,
                                                "documents.parquet"))
                .select("doc_id", "text"))
        with tempfile.TemporaryDirectory() as d:
            store = create_minhash_index(os.path.join(d, "mh"))
            t0 = time.perf_counter()
            store.append(minhash_index_rows(seen))
            build = time.perf_counter() - t0
            idx = store.load(spark)
            force(dedup_pairs_cross(batch, seen))            # warm
            force(dedup_pairs_cross_indexed(batch, seen, idx))
            res = {"recompute": [], "indexed": []}
            for _ in range(reps):
                res["recompute"].append(timed(
                    lambda: force(dedup_pairs_cross(batch, seen)), 1))
                res["indexed"].append(timed(
                    lambda: force(dedup_pairs_cross_indexed(
                        batch, seen, idx)), 1))
            n_pairs = dedup_pairs_cross_indexed(batch, seen,
                                                idx).count()
            out[f"minhash {label}"] = {
                "recompute_s": round(min(res["recompute"]), 3),
                "indexed_s": round(min(res["indexed"]), 3),
                "index_build_s": round(build, 3),
                "verified_pairs": n_pairs,
            }

    # substring kind (r14): per-batch coverage probe must be ~flat in
    # seen size (narrow fp-index scan), recompute re-fingerprints the
    # whole seen corpus every batch
    from solana_event_stream_spark.operators.dedup import (  # noqa: E402
        substring_incremental_survivors)
    from solana_event_stream_spark.operators.dedup_index import (  # noqa: E402
        create_substring_index, substring_incremental_survivors_indexed,
        substring_index_rows)

    for label, path in (("seen=5k", SMALL), ("seen=50k", BIG)):
        seen = (spark.read.parquet(os.path.join(path,
                                                "documents.parquet"))
                .select("doc_id", "text"))
        with tempfile.TemporaryDirectory() as d:
            store = create_substring_index(os.path.join(d, "ss"))
            t0 = time.perf_counter()
            store.append(substring_index_rows(seen))
            build = time.perf_counter() - t0
            force(substring_incremental_survivors(batch, seen))   # warm
            force(substring_incremental_survivors_indexed(
                store, batch, commit=False))
            res = {"recompute": [], "indexed": []}
            for _ in range(reps):
                res["recompute"].append(timed(
                    lambda: force(substring_incremental_survivors(
                        batch, seen)), 1))
                res["indexed"].append(timed(
                    lambda: force(substring_incremental_survivors_indexed(
                        store, batch, commit=False)), 1))
            n_surv = substring_incremental_survivors_indexed(
                store, batch, commit=False).count()
            out[f"substring {label}"] = {
                "recompute_s": round(min(res["recompute"]), 3),
                "indexed_s": round(min(res["indexed"]), 3),
                "index_build_s": round(build, 3),
                "survivors": n_surv,
            }

    ebatch_src = (spark.read.parquet(os.path.join(
        SMALL, "embeddings.parquet")).filter(F.col("vec_id") < 100))
    ebatch = (ebatch_src.select(
        (F.col("vec_id") + 9_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001))
        .alias("embedding")).localCheckpoint())

    for label, path in (("seen=2k", SMALL), ("seen=20k", BIG)):
        seen = (spark.read.parquet(os.path.join(path,
                                                "embeddings.parquet"))
                .select("vec_id", "embedding"))
        with tempfile.TemporaryDirectory() as d:
            store = create_embedding_index(os.path.join(d, "emb"),
                                           n_planes=10, width=64,
                                           n_bands=4)
            t0 = time.perf_counter()
            store.append(embedding_index_rows(seen, 4, 10, width=64))
            build = time.perf_counter() - t0
            idx = store.load(spark)
            force(embedding_pairs_cross(ebatch, seen, n_planes=10,
                                        width=64))
            force(embedding_pairs_cross_indexed(ebatch, seen, idx, 4,
                                                10, width=64))
            res = {"recompute": [], "indexed": []}
            for _ in range(reps):
                res["recompute"].append(timed(
                    lambda: force(embedding_pairs_cross(
                        ebatch, seen, n_planes=10, width=64)), 1))
                res["indexed"].append(timed(
                    lambda: force(embedding_pairs_cross_indexed(
                        ebatch, seen, idx, 4, 10, width=64)), 1))
            n_pairs = embedding_pairs_cross_indexed(
                ebatch, seen, idx, 4, 10, width=64).count()
            out[f"embedding {label}"] = {
                "recompute_s": round(min(res["recompute"]), 3),
                "indexed_s": round(min(res["indexed"]), 3),
                "index_build_s": round(build, 3),
                "verified_pairs": n_pairs,
            }

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
