"""ShredStream source (S2): entry explode, nullable meta columns, J6
backfill."""

from __future__ import annotations

import os
import tempfile


def test_shredstream_simulate_source(spark):
    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.shredstream import (
        ShredStreamDataSource)
    from solana_event_stream_spark.streaming.sink import (
        foreach_batch_callback)

    spark.dataSource.register(ShredStreamDataSource)
    raw = (spark.readStream.format("shredstream")
           .option("endpoint", "simulate://local").load())
    events = build_events_core(raw)
    collected: list = []
    with tempfile.TemporaryDirectory() as tmp:
        q = (events.writeStream
             .foreachBatch(foreach_batch_callback(
                 lambda rows: collected.extend(r.asDict() for r in rows)))
             .option("checkpointLocation", os.path.join(tmp, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)
    # 4 slots x 2 entries x 2 txs, one PumpFunBuy each
    assert len(collected) == 16
    assert {r["event_type"] for r in collected} == {"PumpFunBuy"}
    # shred rows have no meta: block_time NULL, block_time_ms 0, no CPI
    assert all(r["block_time"] is None for r in collected)
    assert all(r["block_time_ms"] == 0 for r in collected)
    assert all(r["swap_from_mint"] is None for r in collected)
    # per-slot transaction_index is the entry-explode ordinal
    per_slot = {}
    for r in collected:
        per_slot.setdefault(r["slot"], []).append(r["transaction_index"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_slot.values())


def test_blockmeta_backfill(spark):
    from pyspark.sql import functions as F
    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.sources.shredstream import (
        backfill_block_time)

    FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    ev = build_events(raw)
    shred_ev = ev.filter(F.col("block_time").isNull())
    n_shred = shred_ev.count()
    assert n_shred > 0  # fixture corpus includes shred-sourced rows

    bm = spark.createDataFrame(
        [(r["slot"],) for r in shred_ev.select("slot").distinct().collect()],
        "slot long").withColumn(
        "block_time", F.lit("2024-02-01 00:00:00").cast("timestamp"))
    filled = backfill_block_time(shred_ev, bm)
    assert filled.filter(F.col("block_time").isNull()).count() == 0
    assert filled.filter(F.col("block_time_ms") == 0).count() == 0
