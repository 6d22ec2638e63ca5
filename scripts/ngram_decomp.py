"""dedup_ngram_jaccard tail decomposition (VERDICT r13 item 8): the
query is the battery's worst sf0.1->sf1.0 exponent (e=0.74). Decompose
the wall into (a) signature/banding, (b) candidate generation (band
self-join + distinct), (c) verify (gram re-attach + intersect), and
report candidate/verified pair counts and band-bucket population
stats at both SFs — the numbers that say whether the exponent is
candidate blowup (band-tune it) or simply data-proportional verify
work on a denser planted-dup corpus (the workload's floor).

Usage: python scripts/ngram_decomp.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from solana_event_stream_spark.operators.dedup import (  # noqa: E402
    _JAC_BANDS, _JAC_ROWS, _hash_ints, _minhash_cols, docs_with_dups)

SMALL = "/root/testdata/sf0.1"
BIG = "/root/repo/.bench_data/sf1.0"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def stage_frames(spark, sf_dir):
    docs = docs_with_dups(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                              F.element_at(words, i + 2))))
    grams = docs.select("doc_id", bigrams.alias("g")).localCheckpoint()
    sigs = (grams.select("doc_id", _hash_ints(F.col("g")).alias("xs"))
            .select("doc_id", *_minhash_cols(F.col("xs"))))
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col(f"mh{b * _JAC_ROWS + r}")
                               for r in range(_JAC_ROWS)])
            for b in range(_JAC_BANDS)
        ])).alias("band_idx", "band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"]))
    cand_ids = (pairs.select(F.col("doc_a").alias("doc_id"))
                .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
                .distinct())
    cand_grams = grams.join(cand_ids, "doc_id", "left_semi")
    ga, gb = cand_grams.alias("ga"), cand_grams.alias("gb")
    attached = (pairs
                .join(ga, F.col("ga.doc_id") == F.col("doc_a"))
                .join(gb, F.col("gb.doc_id") == F.col("doc_b"))
                .select("doc_a", "doc_b", F.col("ga.g").alias("g_a"),
                        F.col("gb.g").alias("g_b")))
    n_inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    jac = n_inter.cast("double") / (
        F.size("g_a") + F.size("g_b") - n_inter)
    verified = (attached.select("doc_a", "doc_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= 0.5))
    return grams, bands, pairs, verified


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("ngram-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, path in (("sf0.1", SMALL), ("sf1.0", BIG)):
        grams, bands, pairs, verified = stage_frames(spark, path)
        # warm the gram checkpoint once (part of every arm's input)
        grams.count()
        res = {"sig_band_s": [], "pairs_s": [], "full_s": []}
        for _ in range(reps):
            t0 = time.perf_counter()
            force(bands)
            res["sig_band_s"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            pairs_ck = pairs.localCheckpoint()
            res["pairs_s"].append(time.perf_counter() - t0)
            del pairs_ck
            t0 = time.perf_counter()
            force(verified)
            res["full_s"].append(time.perf_counter() - t0)
        n_docs = grams.count()
        n_cand = pairs.count()
        n_ver = verified.count()
        buckets = (bands.groupBy("band_idx", "band_val")
                   .agg(F.count(F.lit(1)).alias("n")))
        bstats = buckets.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_pop"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2)
            .alias("implied_pairs")).collect()[0]
        out[label] = {
            "n_docs": n_docs,
            "n_candidate_pairs": n_cand,
            "n_verified_pairs": n_ver,
            "n_band_buckets": int(bstats.n_buckets),
            "max_bucket_pop": int(bstats.max_pop),
            "implied_band_pairs": int(bstats.implied_pairs),
            "sig_band_s": round(min(res["sig_band_s"]), 3),
            "cand_pairs_s": round(min(res["pairs_s"]), 3),
            "full_s": round(min(res["full_s"]), 3),
        }
    a, b = out["sf0.1"], out["sf1.0"]
    import math
    out["ratios_10x_data"] = {
        "full_wall": round(b["full_s"] / a["full_s"], 2),
        "exponent": round(math.log10(b["full_s"] / a["full_s"]), 3),
        "candidates": round(b["n_candidate_pairs"]
                            / max(1, a["n_candidate_pairs"]), 2),
        "verified": round(b["n_verified_pairs"]
                          / max(1, a["n_verified_pairs"]), 2),
        "sig_band_wall": round(b["sig_band_s"] / a["sig_band_s"], 2),
        "cand_wall": round(b["cand_pairs_s"] / a["cand_pairs_s"], 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
