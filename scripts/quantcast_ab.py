"""VERDICT r17 item 6: settle the quantized-vs-float 2,048-q/t causal
claim. BENCH_NOTES r16 reading (3) attributes the quantized serving
arm's larger big-trigger wall to "an int8->double array cast per
candidate pair" — plausible (Catalyst can collapse the cast
projection into the post-join pair scoring) but never isolated.

Three arms, one JVM, identical 20k-row corpus content and 2,048-query
batch, min-of-reps, interleaved rep order (f,q,p per rep — steal hits
all arms alike):

- float:     (vec_id, embedding double) corpus, LSH top-k.
- quant:     codes corpus with the serving path's lazy
             `cast(q as array<double>)` projection under the join —
             the shipped shape.
- precast:   the SAME cast corpus materialized (localCheckpoint)
             BEFORE the probe, so the cast runs once per corpus row,
             never per pair.

If quant >> precast ~= float, the per-pair-cast claim is CONFIRMED.
If quant ~= precast, the cast is evaluated per-row already and the
r16 gap was something else (or noise) — soften the note.

Usage: python scripts/quantcast_ab.py [reps] [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solana_event_stream_spark.session import get_spark  # noqa: E402
from maintenance_scale import synth_vecs  # noqa: E402

N_CORPUS = 20_000
N_QUERIES = 2_048


def main() -> None:
    from solana_event_stream_spark.operators.similarity import (
        ann_topk_frames, quantize_embeddings_int8)

    reps = next((int(a) for a in sys.argv[1:] if a.isdigit()), 3)
    n = 2_000 if "--small" in sys.argv else N_CORPUS
    nq = 256 if "--small" in sys.argv else N_QUERIES
    spark = get_spark("quantcast-ab")

    corpus = synth_vecs(spark, n).localCheckpoint()
    qcodes = quantize_embeddings_int8(corpus).localCheckpoint()
    queries = (synth_vecs(spark, nq)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())

    lazy_cast = qcodes.select(
        "vec_id", F.col("q").cast("array<double>").alias("embedding"))
    pre_cast = lazy_cast.localCheckpoint()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def arm(corp):
        t0 = time.perf_counter()
        force(ann_topk_frames(queries, corp, k=10, method="lsh",
                              width=16, corpus_rows=n,
                              exclude_matching_ids=False))
        return time.perf_counter() - t0

    walls = {"float": [], "quant_lazy_cast": [], "precast": []}
    for name, corp in (("float", corpus),
                       ("quant_lazy_cast", lazy_cast),
                       ("precast", pre_cast)):
        arm(corp)                                   # warm
    for _ in range(reps):                           # interleaved
        for name, corp in (("float", corpus),
                           ("quant_lazy_cast", lazy_cast),
                           ("precast", pre_cast)):
            walls[name].append(arm(corp))
    out = {k: {"min_s": round(min(v), 3),
               "all_s": [round(x, 3) for x in v]}
           for k, v in walls.items()}
    out["_config"] = {"corpus": n, "queries": nq, "reps": reps}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
