"""Materialized append-only dedup index (VERDICT r12 item 1): the
index-backed pair finders and incremental steps must be DIFFERENTIAL-
equal to the recompute forms, the store must round-trip its manifest
and refuse incompatible parameters, and a second batch must probe the
first batch's survivors without re-hashing history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    from solana_event_stream_spark.operators.dedup import docs_with_dups
    return docs_with_dups(spark, sf_dir)


def _pairs(df):
    return {(r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in df.collect()}


def test_minhash_indexed_pairs_match_recompute(spark, sf_dir, tmp_path):
    from solana_event_stream_spark.operators.dedup import (
        dedup_pairs_cross)
    from solana_event_stream_spark.operators.dedup_index import (
        create_minhash_index, dedup_pairs_cross_indexed,
        minhash_index_rows, open_dedup_index)

    base = _docs(spark, sf_dir)
    seen = base.filter(F.col("doc_id") % 2 == 0)
    new = base.filter(F.col("doc_id") % 2 == 1)

    store = create_minhash_index(str(tmp_path / "mh"))
    store.append(minhash_index_rows(seen))
    # re-open: manifest round-trips
    store = open_dedup_index(str(tmp_path / "mh"))
    assert store.kind == "minhash" and store.params["n_bands"] == 3

    got = _pairs(dedup_pairs_cross_indexed(new, seen,
                                           store.load(spark)))
    want = _pairs(dedup_pairs_cross(new, seen))
    assert got == want and got


def test_minhash_incremental_indexed_matches_and_accumulates(
        spark, sf_dir, tmp_path):
    from solana_event_stream_spark.operators.dedup import (
        dedup_incremental_survivors)
    from solana_event_stream_spark.operators.dedup_index import (
        create_minhash_index, dedup_pairs_cross_indexed,
        dedup_incremental_survivors_indexed, minhash_index_rows)

    base = _docs(spark, sf_dir)
    seen = base.filter(F.col("doc_id") % 3 == 0)
    b1 = base.filter(F.col("doc_id") % 3 == 1)
    b2 = base.filter(F.col("doc_id") % 3 == 2)

    store = create_minhash_index(str(tmp_path / "mh"))
    store.append(minhash_index_rows(seen))

    surv1 = dedup_incremental_survivors_indexed(store, b1, seen)
    want1 = {r.doc_id for r in
             dedup_incremental_survivors(b1, seen).collect()}
    got1 = {r.doc_id for r in surv1.collect()}
    assert got1 == want1 and got1
    # committed: the store now carries seen + batch-1 survivors
    assert len(store._batches) == 2

    # batch 2 probes the ACCUMULATED corpus — including batch-1
    # survivors — via the index, equal to the recompute form against
    # the accumulated docs frame
    acc = seen.unionByName(surv1.select(*seen.columns))
    got2 = {r.doc_id for r in dedup_incremental_survivors_indexed(
        store, b2, acc, commit=False).collect()}
    want2 = {r.doc_id for r in
             dedup_incremental_survivors(b2, acc).collect()}
    assert got2 == want2
    # cross hits against batch-1 survivors specifically are visible
    # through the index (not only through the original seen slice)
    hits = {r.doc_b for r in dedup_pairs_cross_indexed(
        b2, acc, store.load(spark)).collect()}
    assert hits & got1 or hits & {r for r in want1}, (
        "expected at least one batch-2 candidate against batch-1 "
        "survivors on the planted-dup corpus")


def test_embedding_indexed_pairs_and_incremental_match(spark, tmp_path):
    import hashlib

    from solana_event_stream_spark.operators.dedup import (
        embedding_incremental_survivors, embedding_pairs_cross)
    from solana_event_stream_spark.operators.dedup_index import (
        create_embedding_index, embedding_index_rows,
        embedding_incremental_survivors_indexed,
        embedding_pairs_cross_indexed)

    def vec(i):
        return [int(hashlib.md5(f"{i}_{d}".encode()).hexdigest()[:4],
                    16) / 32767.5 - 1.0 for d in range(16)]

    seen = spark.createDataFrame(
        [(i, vec(i)) for i in range(60)],
        "vec_id long, embedding array<float>")
    new = spark.createDataFrame(
        [(1000, [x + 0.001 for x in vec(11)]),   # near-copy of seen 11
         (1001, vec(500)),                       # fresh
         (1002, vec(600)),                       # within-batch pair:
         (1003, [x + 0.0005 for x in vec(600)]),
         ], "vec_id long, embedding array<float>")

    store = create_embedding_index(str(tmp_path / "emb"), n_planes=8,
                                   width=16)
    store.append(embedding_index_rows(seen, 8, width=16))

    got = {(r.doc_a, r.doc_b, round(r.cosine, 9))
           for r in embedding_pairs_cross_indexed(
               new, seen, store.load(spark), 8, tau=0.95,
               width=16).collect()}
    want = {(r.doc_a, r.doc_b, round(r.cosine, 9))
            for r in embedding_pairs_cross(new, seen, n_planes=8,
                                           tau=0.95,
                                           width=16).collect()}
    assert got == want and (1000, 11) in {p[:2] for p in got}

    surv = {r.vec_id for r in embedding_incremental_survivors_indexed(
        store, new, seen, tau=0.95).collect()}
    want_surv = {r.vec_id for r in embedding_incremental_survivors(
        new, seen, n_planes=8, tau=0.95, width=16).collect()}
    assert surv == want_surv == {1001, 1002}
    assert len(store._batches) == 2
    # the committed survivor index rows are join-compatible: a re-send
    # of the surviving vectors is now caught by the index alone
    resend = new.filter(F.col("vec_id").isin(1001, 1002)).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    again = {r.doc_b for r in embedding_pairs_cross_indexed(
        resend, seen.unionByName(surv_frame(new)), store.load(spark),
        8, tau=0.999, width=16).collect()}
    assert {1001, 1002} <= again


def surv_frame(new):
    return new.filter(F.col("vec_id").isin(1001, 1002))


def test_store_parameter_guards(spark, tmp_path):
    from solana_event_stream_spark.operators.dedup_index import (
        DedupIndexStore, create_embedding_index, create_minhash_index,
        open_dedup_index)

    mh = create_minhash_index(str(tmp_path / "a"))
    with pytest.raises(ValueError, match="not 'embedding'"):
        mh._require("embedding")
    emb = create_embedding_index(str(tmp_path / "b"), n_planes=12)
    with pytest.raises(ValueError, match="n_planes"):
        emb._require("embedding", n_planes=8)
    with pytest.raises(FileNotFoundError):
        open_dedup_index(str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="non-empty"):
        DedupIndexStore._create(str(tmp_path / "a"), "minhash", {})
    # wrong columns refused
    bad = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="columns"):
        mh.append(bad)
    # empty store loads an empty, correctly-typed frame
    assert emb.load(spark).count() == 0
    assert set(emb.load(spark).columns) == {"vec_id", "bucket", "nrm"}


def test_store_orphan_batch_is_invisible_then_overwritten(
        spark, tmp_path):
    """Crash between parquet write and manifest swap: the orphan dir
    is invisible to load() and the next append overwrites it."""
    from solana_event_stream_spark.operators.dedup_index import (
        create_minhash_index, open_dedup_index)

    store = create_minhash_index(str(tmp_path / "mh"))
    rows = spark.createDataFrame(
        [(1, 0, "x"), (2, 1, "y")],
        "doc_id long, band_idx int, band_val string")
    # simulate the crash: write the parquet half only
    rows.write.mode("overwrite").parquet(str(tmp_path / "mh" / "batch=0"))
    assert open_dedup_index(str(tmp_path / "mh")).load(spark).count() == 0
    # recovery: a real append lands on the same batch id
    store.append(rows)
    loaded = open_dedup_index(str(tmp_path / "mh")).load(spark)
    assert loaded.count() == 2


def test_index_compaction_roundtrip(spark, tmp_path):
    """compact() folds N committed batch dirs into one, rows identical;
    appends after compaction never reuse a superseded directory name;
    a reader holding the pre-compaction manifest keeps working."""
    from solana_event_stream_spark.operators.dedup_index import (
        DedupIndexStore, create_minhash_index, minhash_index_rows,
        open_dedup_index)

    path = str(tmp_path / "mh_index")
    store = create_minhash_index(path)
    for i in range(4):
        docs = spark.createDataFrame(
            [(100 * i + j, f"alpha bravo charlie d{i}x{j} echo "
                           f"foxtrot golf hotel india juliet")
             for j in range(5)],
            "doc_id long, text string")
        store.append(minhash_index_rows(docs))
    before = sorted(map(tuple, store.load(spark).collect()))
    old_reader = open_dedup_index(path)          # pre-compaction view

    name = store.compact(spark)
    assert store._batches == [name] == ["batch=4"]
    after = sorted(map(tuple, store.load(spark).collect()))
    assert after == before
    # reopen sees the compacted manifest
    assert open_dedup_index(path)._batches == [name]
    # superseded dirs still on disk: the old reader's view is intact
    assert sorted(map(tuple, old_reader.load(spark).collect())) == before

    # append after compaction: fresh name, data unions in
    docs = spark.createDataFrame(
        [(999, "kilo lima mike november oscar papa quebec romeo "
               "sierra tango")],
        "doc_id long, text string")
    new_name = store.append(minhash_index_rows(docs))
    assert new_name == "batch=5"
    assert store.load(spark).select("doc_id").distinct().count() == 21

    # compacting an empty store is a no-op
    empty = create_minhash_index(str(tmp_path / "empty_index"))
    assert empty.compact(spark) == ""
