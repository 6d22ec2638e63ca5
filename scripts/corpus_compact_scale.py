"""Corpus-side small-files scale point (VERDICT r13 item 1): after
>= 64 per-trigger corpus batch directories, the maintained-corpus read
(the per-trigger ``seen_docs`` union AND ``load_maintained_corpus``)
must show the same planning/file-open degradation the round-13 index
measurement showed (2,048 files -> 1.43 s), and
``compact_maintained_corpus`` must cure it — read wall ~flat after
compaction.

Method: drive the REAL commit path (store.append with the maintenance
loop's meta_update) for N tiny trigger batches so the manifest carries
N corpus dirs of 1 file each, time the manifest-driven read
(count + a text-length aggregate, forcing file opens) best-of-R, then
compact and re-time. Also reports the per-trigger probe read at three
growth points (N/4, N/2, N) to show the no-compaction trend.

Usage: python scripts/corpus_compact_scale.py [n_batches] [reps]
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
from solana_event_stream_spark.operators.dedup_index import (  # noqa: E402
    compact_maintained_corpus, create_minhash_index,
    load_maintained_corpus, minhash_index_rows, open_dedup_index)


def timed_read(spark, cdir, idir, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        (load_maintained_corpus(spark, cdir, idir)
         .agg(F.count(F.lit(1)), F.sum(F.length("text"))).collect())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("corpus-compact-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_batches": n_batches, "growth": []}
    with tempfile.TemporaryDirectory() as d:
        cdir, idir = os.path.join(d, "corpus"), os.path.join(d, "index")
        store = create_minhash_index(idir)
        text = ("alpha bravo charlie delta echo foxtrot golf hotel "
                "india juliet kilo lima mike november oscar papa " * 4)
        for bid in range(n_batches):
            bdf = spark.createDataFrame(
                [(bid * 1000 + j, text + f" uniq{bid}_{j}")
                 for j in range(20)],
                "doc_id long, text string")
            cname = f"batch={bid}"
            (bdf.coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(cdir, cname)))
            store.append(
                minhash_index_rows(bdf),
                meta_update={"last_stream_batch": bid,
                             "corpus_batches":
                             store.meta.get("corpus_batches", [])
                             + [cname]})
            if bid + 1 in (n_batches // 4, n_batches // 2, n_batches):
                out["growth"].append({
                    "n_dirs": bid + 1,
                    "read_s": round(timed_read(spark, cdir, idir,
                                               reps), 3)})
        n_files = sum(len([f for f in fs if f.endswith(".parquet")])
                      for _, _, fs in os.walk(cdir))
        pre = timed_read(spark, cdir, idir, reps)
        rows_pre = load_maintained_corpus(spark, cdir, idir).count()

        t0 = time.perf_counter()
        name = compact_maintained_corpus(spark, cdir, idir)
        compact_s = time.perf_counter() - t0
        post = timed_read(spark, cdir, idir, reps)
        rows_post = load_maintained_corpus(spark, cdir, idir).count()
        store = open_dedup_index(idir)
        n_files_post = sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, fs in ((r, f) for r, _, f in os.walk(
                os.path.join(cdir, name))))
        out.update({
            "pre_compact": {"n_dirs": n_batches, "n_files": n_files,
                            "read_s": round(pre, 3), "rows": rows_pre},
            "compact_s": round(compact_s, 3),
            "post_compact": {"n_dirs": len(store.meta["corpus_batches"]),
                             "n_files": n_files_post,
                             "read_s": round(post, 3),
                             "rows": rows_post},
            "rows_identical": rows_pre == rows_post,
            "speedup": round(pre / post, 2) if post else None,
        })
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
