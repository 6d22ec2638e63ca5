"""K1 foreachPartition sink variant (per-partition callback ordering)
and the P10/le_uN column helpers."""

from __future__ import annotations

import glob
import json
import os
import tempfile


def test_foreach_partition_callback_ordering(spark):
    """Each callback invocation gets a contiguous, internally ordered
    slice; concatenating slices by first key restores the total order;
    no transaction spans two invocations."""
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.sink import (
        foreach_partition_callback)
    from solana_event_stream_spark.plans.pipeline import build_events_core

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))

    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        out_dir = os.path.join(tmp, "out")
        os.makedirs(out_dir)
        write_slot_bucketed_archive(raw, archive, n_buckets=2)

        def sink(rows):  # runs on executors: persist, don't accumulate
            if not rows:
                return
            keys = [(r.slot, r.transaction_index, r.outer_index,
                     r.inner_index if r.inner_index is not None else -1,
                     r.signature) for r in rows]
            name = f"{keys[0][0]:012d}_{keys[0][1]:06d}_{os.getpid()}_" \
                   f"{abs(hash(tuple(keys))) % 10**8}.json"
            with open(os.path.join(out_dir, name), "w") as f:
                json.dump(keys, f)

        # one micro-batch for the whole archive: the contiguity/global
        # order contract is per batch (per-batch ranges overlap across
        # batches by construction of the slot-bucketed layout)
        stream = read_transaction_stream(spark, archive,
                                         max_files_per_trigger=64)
        q = (build_events_core(stream)
             .writeStream
             .foreachBatch(foreach_partition_callback(sink,
                                                      num_partitions=4))
             .option("checkpointLocation", os.path.join(tmp, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        slices = []
        for path in sorted(glob.glob(os.path.join(out_dir, "*.json"))):
            with open(path) as f:
                slices.append([tuple(k) for k in json.load(f)])
        assert slices, "no partition callbacks fired"
        # each slice internally ordered
        for s in slices:
            assert s == sorted(s)
        # slices are disjoint ranges: concatenation in first-key order is
        # globally sorted
        slices.sort(key=lambda s: s[0])
        flat = [k for s in slices for k in s]
        assert flat == sorted(flat)
        # a transaction (signature) never spans two invocations
        sig_home = {}
        for i, s in enumerate(slices):
            for k in s:
                assert sig_home.setdefault(k[4], i) == i
        # same event count as the batch form
        n_events = build_events_core(raw).count()
        assert len(flat) == n_events


def test_format_pubkey_short(spark):
    from solana_event_stream_spark.functions import format_pubkey_short
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("6EF8rrecthR5Dkzon8Nwu78hRvfCKubJ14M5uBEwF6P",),
         ("short",), ("12345678",)], "pk string")
    out = [r.s for r in df.select(
        format_pubkey_short(F.col("pk")).alias("s")).collect()]
    # common/utils.rs:103-110: first4 + '...' + last4; <=8 chars verbatim
    assert out == ["6EF8...wF6P", "short", "12345678"]


def test_le_uint_helpers(spark):
    from solana_event_stream_spark.functions import le_u32, le_u64

    df = spark.createDataFrame(
        [(bytes([2]) + (2 ** 64 - 1).to_bytes(8, "little"),),
         (bytes([3]) + (123456).to_bytes(8, "little"),)], "data binary")
    rows = df.select(le_u64("data", 2).alias("v"),
                     le_u32("data", 2).alias("w")).collect()
    assert int(rows[0].v) == 2 ** 64 - 1
    assert int(rows[1].v) == 123456
    assert rows[1].w == 123456

def test_row_order_key_matches_spark_orderby(spark):
    """Property: the driver-side sort key is EXACTLY Spark's
    orderBy(slot, tx, outer, coalesce(inner,-1), event_type) ascending
    NULLS FIRST — including NULL slot/outer/event_type rows (the class
    the round-7 review caught: plain tuple keys raise TypeError on
    None)."""
    import random

    from solana_event_stream_spark.streaming.sink import _row_order_key
    from pyspark.sql import functions as F

    rng = random.Random(7)
    vals = [0, 1, 5, None]
    rows = [(rng.choice(vals), rng.choice(vals), rng.choice(vals),
             rng.choice(vals), rng.choice(["A", "B", None]), i)
            for i in range(120)]
    df = spark.createDataFrame(
        rows, "slot long, transaction_index long, outer_index long, "
              "inner_index long, event_type string, rid long")
    spark_order = [r.rid for r in df.orderBy(
        "slot", "transaction_index", "outer_index",
        F.coalesce(F.col("inner_index"), F.lit(-1)), "event_type",
        "rid").collect()]
    py_order = [r["rid"] for r in sorted(
        df.collect(), key=lambda r: (_row_order_key(r), r["rid"]))]
    assert py_order == spark_order


def test_sink_storage_level_knob(spark, monkeypatch):
    """Item from round-7 verdict: the per-batch persist honours the
    `storage_level` parameter (default MEMORY_AND_DISK) so memory-tight
    clusters can choose DISK_ONLY. Asserted by recording the level each
    factory passes to DataFrame.persist."""
    from pyspark import StorageLevel
    from solana_event_stream_spark.streaming.sink import (
        DEFAULT_BATCH_STORAGE, foreach_batch_callback,
        foreach_batch_callback_strict, foreach_partition_callback)

    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    df = build_events_core(load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet")))

    # patch the CONCRETE class (pyspark.sql.classic DataFrame), not the
    # pyspark.sql.DataFrame facade — the subclass overrides persist
    cls = type(df)
    seen: list = []
    real_persist = cls.persist

    def recording_persist(self, storageLevel=StorageLevel.MEMORY_AND_DISK):
        seen.append(storageLevel)
        return real_persist(self, storageLevel)

    monkeypatch.setattr(cls, "persist", recording_persist)

    assert DEFAULT_BATCH_STORAGE == StorageLevel.MEMORY_AND_DISK
    for factory, kwargs, expect in [
            (foreach_batch_callback, {}, StorageLevel.MEMORY_AND_DISK),
            (foreach_batch_callback,
             {"storage_level": StorageLevel.DISK_ONLY},
             StorageLevel.DISK_ONLY),
            (foreach_partition_callback,
             {"storage_level": StorageLevel.DISK_ONLY},
             StorageLevel.DISK_ONLY),
            (foreach_batch_callback_strict,
             {"storage_level": StorageLevel.DISK_ONLY},
             StorageLevel.DISK_ONLY)]:
        seen.clear()
        handler = factory(lambda rows: None, **kwargs)
        handler(df, 0)
        assert seen and seen[0] == expect, (factory.__name__, seen)
