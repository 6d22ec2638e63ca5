"""VERDICT r15 item 6 + r16 item 4: vacuum under live readers,
end-to-end, on BOTH serving arms.

A LONG-RUNNING ANN serving stream (re-resolving the maintained corpus
from the manifest every trigger) runs concurrently with the embedding
maintenance loop, tiered compaction, and `vacuum_dedup_index` — the
full retention lifecycle composed. Parametrized over the flat serving
method (brute) and the IVF tier (r16), whose arm additionally proves:

- (cell, vec_id) clustering SURVIVES every compaction inside the run
  (each `compact=` dir's files hold sorted, disjoint ranges — the
  property the serving probe's row-group pruning rests on),
- a mid-run `refit_ivf_centroids` (r17) swaps the quantizer + the
  re-stamped corpus atomically UNDER the live serving stream — no
  trigger errors, every batch stays non-degenerate.

Shared proof obligations:

- no serving trigger ever reads a deleted directory (the stream ends
  with no exception and every produced batch is non-degenerate),
- directory counts stay BOUNDED over >= 50 maintenance triggers
  (append-only without the lifecycle would grow one index dir + one
  corpus dir + one float dir per trigger),
- vacuum's grace window counts from the moment a dir became
  unreferenced (compactions bump superseded dirs' mtimes — r16), so a
  dir superseded a moment ago survives even when it was WRITTEN long
  before the window.
"""

from __future__ import annotations

import glob
import hashlib
import os
import time

import pytest

from conftest import stop_streaming_query

N_TRIGGERS = 50
DIM = 8


def _vec(tag, i):
    return [int(hashlib.md5(f"{tag}{i}_{d}".encode()).hexdigest()[:4],
                16) / 32767.5 - 1.0 for d in range(DIM)]


def _count_data_dirs(base):
    return sum(n.startswith(("batch=", "compact=", "verify=", "fpn="))
               for n in os.listdir(base)) if os.path.isdir(base) else 0


def _assert_cell_clustered(cdir, store):
    """Every committed `compact=` corpus dir keeps sorted, disjoint
    per-file (cell, vec_id) ranges — the row-group-pruning contract
    the IVF serving scan relies on, checked LIVE after each
    compaction/vacuum cadence point (per-trigger `batch=` dirs are
    sorted-within-partition only; the fold is where clustering could
    silently regress)."""
    import pyarrow.parquet as pq

    for d in store.meta.get("corpus_batches", []):
        if not d.startswith("compact="):
            continue
        ranges = []
        for f in sorted(glob.glob(os.path.join(cdir, d, "*.parquet"))):
            t = pq.read_table(f, columns=["cell", "vec_id"])
            pairs = list(zip(t.column("cell").to_pylist(),
                             t.column("vec_id").to_pylist()))
            if not pairs:
                continue
            assert pairs == sorted(pairs), (d, f)
            ranges.append((pairs[0], pairs[-1]))
        ranges.sort()
        for (_, a_hi), (b_lo, _) in zip(ranges, ranges[1:]):
            assert a_hi <= b_lo, (d, ranges)


@pytest.mark.parametrize("method", ["brute", "ivf"])
def test_vacuum_under_live_serving_stream(spark, tmp_path, method):
    from solana_event_stream_spark.operators.dedup_index import (
        apply_embedding_maintenance_batch, create_embedding_index,
        float_tier_path, open_dedup_index, refit_ivf_centroids,
        vacuum_dedup_index)
    from solana_event_stream_spark.operators.similarity import (
        start_ann_serving_stream)

    ivf = method == "ivf"
    cdir, idir = str(tmp_path / "c"), str(tmp_path / "i")
    fbase = float_tier_path(cdir)
    create_embedding_index(
        idir, n_planes=8, width=DIM, n_bands=2,
        ivf_centroids=[_vec("cent", j) for j in range(4)] if ivf
        else None)
    # seed one committed batch so the stream's first trigger has a
    # corpus to resolve
    seed = spark.createDataFrame(
        [(i, _vec("c", i)) for i in range(40)],
        "vec_id long, embedding array<double>")
    assert apply_embedding_maintenance_batch(
        spark, seed, 0, cdir, idir, quantize_corpus=True,
        keep_float_tier=True)

    qdir = tmp_path / "q"
    qdir.mkdir()
    (spark.createDataFrame([(900_000, _vec("c", 3))],
                           "query_id long, embedding array<double>")
     .coalesce(1).write.parquet(str(qdir / "q000.parquet")))
    odir = str(tmp_path / "out")
    stream = (spark.readStream
              .schema("query_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(qdir) + "/*"))
    kwargs = dict(method="ivf", nprobe=3) if ivf else \
        dict(method="brute")
    q = start_ann_serving_stream(
        stream, cdir, idir, odir, str(tmp_path / "ckpt"),
        k=3, rerank_m=6, processing_time="200 milliseconds", **kwargs)
    max_dirs = {"i": 0, "c": 0, "f": 0}
    try:
        for b in range(1, N_TRIGGERS + 1):
            emb = spark.createDataFrame(
                [(b * 1000 + i, _vec("c", b * 1000 + i))
                 for i in range(40)],
                "vec_id long, embedding array<double>")
            assert apply_embedding_maintenance_batch(
                spark, emb, b, cdir, idir, quantize_corpus=True,
                keep_float_tier=True, compact_every=6,
                compact_mode="tiered")
            if ivf and b == N_TRIGGERS // 2:
                # quantizer refit UNDER the live serving stream: new
                # centroids + re-stamped fold publish in one manifest
                # swap; the next serving trigger resolves them
                refit_ivf_centroids(spark, cdir, idir,
                                    sample_frac=0.5, iters=2)
            if b % 5 == 0:
                # live-reader grace: serving triggers run ~sub-second;
                # superseded dirs age from their RETIRE stamp, so a
                # 3 s grace outlives any in-flight trigger's manifest
                vacuum_dedup_index(
                    idir, families=[(cdir, "corpus_batches"),
                                    (fbase, "float_batches")],
                    grace_seconds=3.0)
                if ivf:
                    _assert_cell_clustered(cdir, open_dedup_index(idir))
                # a fresh query file per vacuum keeps the stream's
                # triggers resolving NEW manifests through the run
                (spark.createDataFrame(
                    [(900_000 + b, _vec("c", b * 1000 + 7))],
                    "query_id long, embedding array<double>")
                 .coalesce(1).write
                 .parquet(str(qdir / f"q{b:03d}.parquet")))
            for tag, base in (("i", idir), ("c", cdir), ("f", fbase)):
                max_dirs[tag] = max(max_dirs[tag],
                                    _count_data_dirs(base))
        # let the stream drain the last query files against the final
        # manifest state
        deadline = time.time() + 60
        while time.time() < deadline:
            produced = (os.path.isdir(odir)
                        and sum(n.startswith("batch=")
                                for n in os.listdir(odir)) >= 11)
            if produced and not q.status["isDataAvailable"]:
                break
            time.sleep(0.5)
        assert q.exception() is None, q.exception()
    finally:
        stop_streaming_query(q, spark)
    assert q.exception() is None, q.exception()
    # every serving batch that landed is non-degenerate (k rows for
    # its one query, scored against SOME committed corpus state)
    batches = [n for n in os.listdir(odir) if n.startswith("batch=")]
    assert len(batches) >= 11          # 1 seed + >= 10 vacuum-cadence
    for n in batches:
        rows = spark.read.parquet(os.path.join(odir, n)).collect()
        assert len(rows) == 3, (n, rows)
        assert all(r.cosine is not None for r in rows)
    # dir counts stayed bounded: 51 appends would mean 51+ dirs per
    # family without the lifecycle; tiered folds + vacuum keep each
    # family's LIVE dir count far under the trigger count
    final = {tag: _count_data_dirs(base)
             for tag, base in (("i", idir), ("c", cdir), ("f", fbase))}
    for tag in final:
        assert final[tag] <= 25, (tag, final, max_dirs)
    # and the grace window held back only the RECENTLY-superseded
    # dirs: a final vacuum with zero grace clears them
    time.sleep(0.1)
    vacuum_dedup_index(idir, families=[(cdir, "corpus_batches"),
                                       (fbase, "float_batches")],
                       grace_seconds=0.0)
    store = open_dedup_index(idir)
    assert _count_data_dirs(idir) == len(
        store._batches) + len(store.meta.get("verify_batches", []))
    assert _count_data_dirs(cdir) == len(store.meta["corpus_batches"])
    assert _count_data_dirs(fbase) == len(store.meta["float_batches"])
    if ivf:
        assert store.meta.get("ivf_refits") == 1
        _assert_cell_clustered(cdir, store)
