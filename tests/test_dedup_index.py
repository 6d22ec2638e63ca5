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


def test_streaming_maintenance_matches_batch_loop(spark, tmp_path):
    """The streaming maintenance loop (availableNow over 3 one-file
    micro-batches with planted cross-batch and vs-seen near-dups) must
    land the SAME survivors corpus as driving
    apply_dedup_maintenance_batch by hand, replay of a committed batch
    must be a no-op, and compaction must fold the index."""
    import os

    from solana_event_stream_spark.operators.dedup_index import (
        apply_dedup_maintenance_batch, create_minhash_index,
        load_maintained_corpus, open_dedup_index,
        start_dedup_maintenance_stream)

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa")

    def doc(i, extra=""):
        return (i, base + f" uniq{i} " + extra if extra
                else base + f" uniq{i}")

    batches = [
        [(1, base + " one"), (2, "totally different words here for "
                                 "the second document of batch zero "
                                 "nothing shared with the template")],
        # 11 near-dups doc 1 (one appended token); 12 fresh
        [(11, base + " one xdup"),
         (12, "another fully distinct document with its own "
              "vocabulary set nothing in common with others")],
        # 21 near-dups 11/1 again; 22 within-batch dup of 23
        [(21, base + " one ydup"),
         (22, "shared within batch text payload aaa bbb ccc ddd eee "
              "fff ggg hhh iii jjj"),
         (23, "shared within batch text payload aaa bbb ccc ddd eee "
              "fff ggg hhh iii jjj zzz")],
    ]

    def run(tag, driver):
        cdir = str(tmp_path / f"corpus_{tag}")
        idir = str(tmp_path / f"index_{tag}")
        create_minhash_index(idir)
        driver(cdir, idir)
        return sorted(r.doc_id for r in
                      load_maintained_corpus(spark, cdir, idir).collect())

    # hand-driven loop
    def by_hand(cdir, idir):
        for bid, rows in enumerate(batches):
            bdf = spark.createDataFrame(rows, "doc_id long, text string")
            assert apply_dedup_maintenance_batch(
                spark, bdf, bid, cdir, idir, compact_every=2)
        # replay of the last batch: committed -> no-op
        bdf = spark.createDataFrame(batches[-1],
                                    "doc_id long, text string")
        assert not apply_dedup_maintenance_batch(
            spark, bdf, len(batches) - 1, cdir, idir)

    want = run("hand", by_hand)
    assert want == [1, 2, 12, 22]   # 11/21 cross-batch dups, 23 within

    # streaming loop over the same batches as files
    sdir = tmp_path / "stream_in"
    sdir.mkdir()
    for bid, rows in enumerate(batches):
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.mode("overwrite")
         .parquet(str(sdir / f"b{bid}.parquet")))

    def by_stream(cdir, idir):
        stream = (spark.readStream
                  .schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(sdir) + "/*"))
        q = start_dedup_maintenance_stream(
            stream, cdir, idir,
            str(tmp_path / "ckpt_stream"), compact_every=2,
            available_now=True)
        q.awaitTermination(120)

    got = run("stream", by_stream)
    assert sorted(got) == sorted(want) or set(got) == {1, 2, 12, 22, 11}
    # (file-trigger order is filename-deterministic here: strict equality)
    assert got == want
    st = open_dedup_index(str(tmp_path / "index_stream"))
    assert len(st._batches) <= 2    # compact_every=2 folded the index
    assert st.meta["last_stream_batch"] == 2


def test_embedding_streaming_maintenance_matches_batch_loop(spark,
                                                            tmp_path):
    """Embedding analog of the maintenance differential: availableNow
    stream over 3 micro-batches with planted cosine near-dups == the
    hand-driven loop; replay no-op; compaction folds the index."""
    import math

    from solana_event_stream_spark.operators.dedup_index import (
        apply_embedding_maintenance_batch, create_embedding_index,
        load_maintained_corpus, open_dedup_index,
        start_embedding_maintenance_stream)

    dim = 8

    def vec(seed, jitter=0.0):
        base = [math.sin(seed * 1.7 + d) for d in range(dim)]
        if jitter:
            base = [x + jitter * math.cos(seed + 9.1 * d)
                    for d, x in enumerate(base)]
        return base

    batches = [
        [(1, vec(1)), (2, vec(2))],
        [(11, vec(1, 0.01)), (12, vec(3))],      # 11 ~ 1
        [(21, vec(2, 0.01)), (22, vec(4)), (23, vec(4, 0.01))],
    ]                                             # 21 ~ 2; 23 ~ 22

    def run(tag, driver):
        cdir = str(tmp_path / f"ecorpus_{tag}")
        idir = str(tmp_path / f"eindex_{tag}")
        create_embedding_index(idir, n_planes=8, width=dim)
        driver(cdir, idir)
        got = load_maintained_corpus(
            spark, cdir, idir,
            empty_schema="vec_id long, embedding array<double>")
        return sorted(r.vec_id for r in got.collect())

    def by_hand(cdir, idir):
        for bid, rows in enumerate(batches):
            bdf = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>")
            assert apply_embedding_maintenance_batch(
                spark, bdf, bid, cdir, idir, compact_every=2)
        bdf = spark.createDataFrame(
            batches[-1], "vec_id long, embedding array<double>")
        assert not apply_embedding_maintenance_batch(
            spark, bdf, len(batches) - 1, cdir, idir)

    want = run("hand", by_hand)
    assert want == [1, 2, 12, 22]

    sdir = tmp_path / "estream_in"
    sdir.mkdir()
    for bid, rows in enumerate(batches):
        (spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
         .coalesce(1).write.mode("overwrite")
         .parquet(str(sdir / f"b{bid}.parquet")))

    def by_stream(cdir, idir):
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<double>")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(sdir) + "/*"))
        q = start_embedding_maintenance_stream(
            stream, cdir, idir, str(tmp_path / "eckpt"),
            compact_every=2, available_now=True)
        q.awaitTermination(120)

    got = run("stream", by_stream)
    assert got == want
    st = open_dedup_index(str(tmp_path / "eindex_stream"))
    assert len(st._batches) <= 2
    assert st.meta["last_stream_batch"] == 2
