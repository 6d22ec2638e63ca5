"""Streaming layer tests: replay-archive streaming==batch equivalence
(SURVEY §5.4), the custom Yellowstone python DataSource (simulate mode),
and option->subscription pushdown."""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _event_key_set(rows):
    return sorted((r["signature"], r["event_type"], r["outer_index"],
                   r["inner_index"] if r["inner_index"] is not None else -1,
                   str(r["amount"]), str(r["is_dev_create_token_trade"]))
                  for r in rows)


def test_streaming_equals_batch(spark):
    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.sink import start_event_stream

    with open(os.path.join(FIXTURES, "meta.json")) as f:
        bot = json.load(f)["bot_wallet"]
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))

    batch_rows = [r.asDict() for r in build_events(raw, bot_wallet=bot)
                  .collect()]

    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        ckpt = os.path.join(tmp, "ckpt")
        write_slot_bucketed_archive(raw, archive, n_buckets=4)

        collected: list = []
        stream = read_transaction_stream(spark, archive)
        assert stream.isStreaming
        q = start_event_stream(stream, lambda rows: collected.extend(
            r.asDict() for r in rows), ckpt, bot_wallet=bot)
        q.awaitTermination(120)

    assert len(collected) == len(batch_rows)
    assert _event_key_set(collected) == _event_key_set(batch_rows)


def test_streaming_equals_batch_out_of_order_slots(spark):
    """SURVEY §5.4 verbatim: the SAME corpus fed through a file streaming
    source with OUT-OF-ORDER slots — micro-batches arrive in descending
    slot order (highest slots first) — must produce exactly the batch
    pipeline's output, which in turn is pinned to events_golden.parquet
    by test_pipeline_golden. Full-column row compare, not just keys."""
    import time as _time

    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.sink import start_event_stream

    with open(os.path.join(FIXTURES, "meta.json")) as f:
        bot = json.load(f)["bot_wallet"]
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))

    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    assert len(slots) >= 3
    cuts = [slots[len(slots) // 3], slots[2 * len(slots) // 3]]
    groups = [  # descending slot ranges: latest chain segment FIRST
        raw.filter(raw.slot >= cuts[1]),
        raw.filter((raw.slot >= cuts[0]) & (raw.slot < cuts[1])),
        raw.filter(raw.slot < cuts[0]),
    ]

    batch_rows = [r.asDict() for r in build_events(raw, bot_wallet=bot)
                  .collect()]

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "archive")
        # the file source orders micro-batches by file modification time:
        # writing high-slot groups first (with mtime gaps) forces
        # descending slot order across batches
        for i, g in enumerate(groups):
            g.coalesce(1).write.mode("append").parquet(archive)
            _time.sleep(1.1)
        collected: list = []
        q = start_event_stream(
            read_transaction_stream(spark, archive, max_files_per_trigger=1),
            lambda rows: collected.extend(r.asDict() for r in rows),
            os.path.join(tmp, "ckpt"), bot_wallet=bot)
        q.awaitTermination(120)

    assert len(collected) == len(batch_rows)

    def _full_rows(dicts):
        return sorted(
            tuple((k, str(v)) for k, v in sorted(d.items()))
            for d in dicts)

    assert _full_rows(collected) == _full_rows(batch_rows)


def test_streaming_batch_ordering(spark):
    """§2.9: rows delivered to the callback are sorted by
    (slot, tx_index, outer_index, inner_index)."""
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.sink import start_event_stream

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_bucketed_archive(raw, archive, n_buckets=2)
        batches: list = []
        q = start_event_stream(
            read_transaction_stream(spark, archive),
            lambda rows: batches.append(rows),
            os.path.join(tmp, "ckpt"))
        q.awaitTermination(120)
    assert batches
    for rows in batches:
        keys = [(r["slot"], r["transaction_index"], r["outer_index"],
                 r["inner_index"] if r["inner_index"] is not None else -1)
                for r in rows]
        assert keys == sorted(keys)


def test_yellowstone_simulate_source(spark):
    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.yellowstone import (
        YellowstoneDataSource)
    from solana_event_stream_spark.streaming.sink import (
        foreach_batch_callback)

    spark.dataSource.register(YellowstoneDataSource)
    raw = (spark.readStream.format("yellowstone")
           .option("endpoint", "simulate://local")
           .option("protocols", "PumpFun")
           .load())
    assert raw.isStreaming
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
    # 4 slots x 3 txs, one PumpFunBuy each; recv_us stamped in-source
    assert len(collected) == 12
    assert {r["event_type"] for r in collected} == {"PumpFunBuy"}
    assert all(r["recv_us"] > 0 for r in collected)
    assert sorted({r["slot"] for r in collected}) == [0, 1, 2, 3]


def test_yellowstone_pushdown_request():
    from solana_event_stream_spark.registry import (BONK_PROGRAM_ID,
                                                    PUMPFUN_PROGRAM_ID)
    from solana_event_stream_spark.sources.yellowstone import (
        subscription_request)

    req = subscription_request({
        "protocols": "PumpFun,Bonk", "accountInclude": "abc",
        "accountExclude": "bad", "accountRequired": "req",
        "includeAccounts": "true", "includeBlockMeta": "true",
    })
    tx = req["transactions"]["client"]
    assert tx["vote"] is False and tx["failed"] is False  # hardwired F6
    assert set(tx["account_include"]) == {"abc", PUMPFUN_PROGRAM_ID,
                                          BONK_PROGRAM_ID}
    assert tx["account_exclude"] == ["bad"]
    assert tx["account_required"] == ["req"]
    assert set(req["accounts"]["client"]["owner"]) == {PUMPFUN_PROGRAM_ID,
                                                       BONK_PROGRAM_ID}
    assert "blocks_meta" in req
    assert req["commitment"] == "processed"

    # F3 gating: transaction stream can be switched off entirely
    req2 = subscription_request({"includeTransactions": "false"})
    assert "transactions" not in req2


def test_high_latency_detector(spark):
    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.streaming.metrics import (
        high_latency_events)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    ev = build_events(raw)
    flagged = high_latency_events(ev)
    # fixture recv_us (~2023) far exceeds block_time (2024-01-01)? No:
    # recv 1.7e15 us = 2023-11; block_time 2024-01 -> negative lag, so
    # nothing should be flagged.
    assert flagged.count() == 0
    # contract: the lag column exists and the filter keeps the schema
    assert "latency_lag_ms" in flagged.columns


def test_yellowstone_account_stream(spark):
    """S1 account sub-stream (F3 gating: streamType=account): simulated
    SPL token accounts + mints decode through the account pipeline
    (D3/P8) on a streaming DataFrame."""
    import tempfile

    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events)
    from solana_event_stream_spark.sources.yellowstone import (
        YellowstoneDataSource)

    spark.dataSource.register(YellowstoneDataSource)
    raw = (spark.readStream.format("yellowstone")
           .option("endpoint", "simulate://local")
           .option("streamType", "account")
           .load())
    assert raw.isStreaming
    assert "pubkey" in raw.columns and "lamports" in raw.columns
    events = build_account_events(raw)
    with tempfile.TemporaryDirectory() as tmp:
        q = (events.writeStream.format("memory").queryName("acct_stream")
             .option("checkpointLocation", os.path.join(tmp, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.table("acct_stream").collect()
    # 4 slots x (3 token accounts + 1 mint); both decode to TokenAccount
    # (P8: mint path sets supply/decimals, account path sets amount)
    assert len(rows) == 16
    assert {r.event_type for r in rows} == {"TokenAccount"}
    mints = [r for r in rows if r.supply is not None]
    accts = [r for r in rows if r.amount is not None]
    assert len(mints) == 4 and len(accts) == 12
    assert {int(m.decimals) for m in mints} == {6}
    # amounts decoded from the simulated layout: slot*100 + i
    amounts = sorted(int(r.amount) for r in accts)
    assert amounts[:3] == [0, 1, 2]


def test_watermark_drops_late_events(spark):
    """SURVEY §2.10 late-data row: with a 10 s watermark on block_time,
    an event arriving after its window's watermark deadline is DROPPED
    from the append-mode windowed counts (the reference has no late-data
    story at all — block_time may even be 0; this is the Spark-side
    semantics we document for event-time aggregation)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from solana_event_stream_spark.streaming.metrics import (
        windowed_event_counts)

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)

    schema = "block_time timestamp, protocol string, event_type string"

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in")
        os.makedirs(src)

        def feed(batch, rows):
            (spark.createDataFrame(rows, schema)
             .coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(src, f"b{batch}")))

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(os.path.join(src, "*")))
        counts = windowed_event_counts(stream)  # 5 s windows, 10 s wm
        q = (counts.writeStream.format("memory").queryName("wm_counts")
             .outputMode("append").start())
        try:
            # batch 1: two events in [0,5), one in [5,10)
            feed(1, [(ts(1), "PumpFun", "Trade"), (ts(2), "PumpFun", "Trade"),
                     (ts(6), "PumpFun", "Trade")])
            q.processAllAvailable()  # wm still before window ends: nothing emits
            # batch 2: t=60 advances the watermark to 50 -> both early
            # windows close and emit
            feed(2, [(ts(60), "PumpFun", "Trade")])
            q.processAllAvailable()
            emitted = {(r.window_start.second, r.n_events)
                       for r in spark.sql("SELECT * FROM wm_counts").collect()}
            assert (0, 2) in emitted and (5, 1) in emitted
            # batch 3: a LATE event for the closed [0,5) window -> dropped
            feed(3, [(ts(2), "PumpFun", "Trade")])
            q.processAllAvailable()
            # batch 4: t=120 closes the [60,65) window; if the late event
            # had been counted anywhere, a new/updated row would show
            feed(4, [(ts(120), "PumpFun", "Trade")])
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT window_start, n_events FROM wm_counts").collect()
            got = {(r.window_start.minute * 60 + r.window_start.second,
                    r.n_events) for r in rows}
            assert got == {(0, 2), (5, 1), (60, 1)}  # late t=2 never lands
        finally:
            from conftest import stop_streaming_query
            stop_streaming_query(q, spark)


def test_latency_listener_and_summary(spark):
    """A5 analog for the streaming engine (BASELINE bench plan (b)):
    the listener captures per-batch durations and latency_summary
    reduces them to trigger-to-sink p50/p95 against the reference's
    1,000 ms warn threshold — batches over threshold are counted the
    way the reference's high-latency detector warns."""
    from solana_event_stream_spark.plans.pipeline import (
        load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.metrics import (
        PipelineMetricsListener, latency_summary)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    collector = PipelineMetricsListener()
    listener = collector.make_listener()
    spark.streams.addListener(listener)
    try:
        with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
            archive = os.path.join(tmp, "archive")
            write_slot_bucketed_archive(raw, archive, n_buckets=3)
            q = (read_transaction_stream(spark, archive)
                 .writeStream
                 .foreachBatch(lambda df, bid: df.count())
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination(120)
            # Listener events are delivered ASYNC on the listener bus:
            # under load the last micro-batches' progress events can
            # arrive after awaitTermination returns. Wait until the
            # collector has seen every batch the query itself reports
            # (recentProgress persists after termination) before
            # removing the listener — the historical flake here.
            expected = {p.batchId for p in q.recentProgress}
            deadline = time.time() + 60
            while ({row["batch_id"] for row in collector.progress}
                   < expected and time.time() < deadline):
                time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    data_batches = [p for p in collector.progress if p["num_input_rows"]]
    # maxFilesPerTrigger=1: one micro-batch per parquet file written
    # (bucket dirs may hold 1..n part files, so bound not equality)
    assert len(data_batches) >= 2
    assert all("triggerExecution" in p["duration_ms"]
               for p in data_batches)

    n_warm = len(data_batches) - 1  # cold batch excluded
    s = latency_summary(collector.progress)
    assert s["n_batches"] == n_warm
    assert s["trigger_p50_ms"] <= s["trigger_p95_ms"] <= s["trigger_max_ms"]
    assert s["rows_per_batch"] > 0
    # over-threshold counting is exact: with warn_ms=0 every batch is
    # over; with an absurdly high bar none are
    assert latency_summary(collector.progress,
                           warn_ms=0)["batches_over_warn"] == n_warm
    assert latency_summary(collector.progress,
                           warn_ms=10 ** 9)["batches_over_warn"] == 0


def test_strict_global_state_sink_equals_batch(spark):
    """The reference-exact CappedGlobalState sink: on the fixture corpus
    (every signature's events share a micro-batch, and the corpus is far
    under the 1000-signature cap) the strict cross-batch fold must agree
    with the batch pipeline's window-form enrichment row-for-row —
    same parity contract as test_streaming_equals_batch, through the
    `global_state=True` sink path."""
    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.sink import start_event_stream
    from solana_event_stream_spark.streaming.state import CappedGlobalState

    with open(os.path.join(FIXTURES, "meta.json")) as f:
        bot = json.load(f)["bot_wallet"]
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    batch_rows = [r.asDict() for r in build_events(raw, bot_wallet=bot)
                  .collect()]

    state = CappedGlobalState()
    collected: list = []
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_bucketed_archive(raw, archive, n_buckets=4)
        q = start_event_stream(
            read_transaction_stream(spark, archive),
            lambda rows: collected.extend(rows),   # dicts already
            os.path.join(tmp, "ckpt"), bot_wallet=bot,
            global_state=state)
        q.awaitTermination(120)

    assert len(collected) == len(batch_rows)
    assert 0 < state.signature_count() <= state.max_entries

    def _rows(dicts):
        return sorted(tuple((k, str(v)) for k, v in sorted(d.items()))
                      for d in dicts)

    assert _rows(collected) == _rows(batch_rows)


def test_streaming_dedup_drops_cross_batch_redelivery(spark):
    """Duplicate-delivery seam: the SAME raw transactions arriving again
    in a LATER micro-batch (transport reconnect replay) must be dropped
    — INCLUDING rows with NULL block_time (shred path pre-backfill),
    the case a block_time-anchored watermark silently misses because a
    NULL event time keys the state to epoch 0. Driven through the
    production entry point (start_event_stream dedup_redelivery)."""
    import time as _time

    from pyspark.sql import functions as F
    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.sink import start_event_stream

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    # NULL chain time on ~half the corpus: shred-path rows pre-backfill
    raw = raw.withColumn(
        "block_time",
        F.when(F.col("slot") % 2 == 0, F.col("block_time")))
    assert raw.filter(F.col("block_time").isNull()).count() > 0
    expected = build_events_core(raw).count()
    assert expected > 0

    batches: list = []
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "archive")
        # file 1: the corpus; file 2 (later mtime): the SAME corpus
        raw.coalesce(1).write.mode("append").parquet(archive)
        _time.sleep(1.1)
        raw.coalesce(1).write.mode("append").parquet(archive)

        q = start_event_stream(
            read_transaction_stream(spark, archive,
                                    max_files_per_trigger=1),
            lambda rows: batches.append(len(rows)),
            os.path.join(tmp, "ckpt"),
            dedup_redelivery="10 minutes")
        q.awaitTermination(120)

    # the redelivery really arrived in a LATER micro-batch...
    assert len(batches) >= 2
    # ...the first batch delivered everything exactly once...
    assert batches[0] == expected
    # ...and every redelivered row (NULL block_time included) was dropped
    assert sum(batches[1:]) == 0


def test_streaming_dedup_fork_aware_delivers_relanding(spark):
    """Round-7 advice: the default identity collapses a fork
    re-landing (same signature, new slot) as a redelivery;
    fork_aware=True adds slot to the key so the re-landing is
    DELIVERED. Both behaviors verified on a two-batch replay whose
    second batch repeats the corpus with shifted slots."""
    import time as _time

    from pyspark.sql import functions as F
    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.dedup import dedup_event_stream

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    relanded = raw.withColumn("slot", F.col("slot") + F.lit(7))
    expected = build_events_core(raw).count()
    assert expected > 0

    for fork_aware, expect_second in ((False, 0), (True, expected)):
        counts: list = []
        with tempfile.TemporaryDirectory(
                ignore_cleanup_errors=True) as tmp:
            archive = os.path.join(tmp, "archive")
            raw.coalesce(1).write.mode("append").parquet(archive)
            _time.sleep(1.1)
            relanded.coalesce(1).write.mode("append").parquet(archive)

            events = dedup_event_stream(
                build_events_core(read_transaction_stream(
                    spark, archive, max_files_per_trigger=1)),
                watermark="10 minutes", fork_aware=fork_aware)
            q = (events.writeStream
                 .foreachBatch(lambda df, bid: counts.append(df.count()))
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
        assert len(counts) >= 2, counts
        assert counts[0] == expected, (fork_aware, counts)
        assert sum(counts[1:]) == expect_second, (fork_aware, counts)


def test_observed_metrics_reach_listener(spark):
    """A1 named metrics: observe() counters must arrive per micro-batch
    in the listener's observedMetrics and equal the batch's true
    event count / distinct transactions / max slot."""
    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.metrics import (
        PipelineMetricsListener, observed)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    n_events = build_events_core(raw).count()
    n_tx = raw.select("signature").distinct().count()
    max_slot = raw.agg({"slot": "max"}).first()[0]

    collector = PipelineMetricsListener()
    listener = collector.make_listener()
    spark.streams.addListener(listener)
    try:
        with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
            archive = os.path.join(tmp, "archive")
            write_slot_bucketed_archive(raw, archive, n_buckets=2)
            events = observed(
                build_events_core(read_transaction_stream(spark, archive)))
            q = (events.writeStream
                 .foreachBatch(lambda df, bid: df.count())
                 .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination(120)
            # listener events are posted async on the bus: wait until
            # every batch's metrics landed before reading them
            import time as _time
            deadline = _time.time() + 30
            while _time.time() < deadline:
                got = sum(p["observed"]["event_metrics"]["events_processed"]
                          for p in collector.progress
                          if p["observed"].get("event_metrics"))
                if got >= n_events:
                    break
                _time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    metrics = [p["observed"]["event_metrics"] for p in collector.progress
               if p["observed"].get("event_metrics")
               and p["observed"]["event_metrics"]["events_processed"]]
    assert metrics  # at least one data batch reported A1 counters
    assert sum(m["events_processed"] for m in metrics) == n_events
    assert max(m["max_slot"] for m in metrics) == max_slot
    # approx transaction counter lands in the right ballpark per batch
    approx = sum(m["transactions_approx"] for m in metrics)
    assert 0.8 * n_tx <= approx <= 1.2 * n_tx
    # numInputRows counts source rows PER SCAN of the physical plan
    # (currently 1: the combined outer+inner explode is single-scan),
    # so it is a small positive integer multiple of the transaction
    # count — pin the invariant, not the plan-dependent multiplier
    total_in = sum(p["num_input_rows"] for p in collector.progress)
    assert total_in >= n_tx and total_in % n_tx == 0


def test_checkpoint_restart_resumes_without_duplicates(spark):
    """S6 lifecycle + checkpointed delivery: a query restarted from the
    SAME checkpoint must deliver only data that arrived after the first
    run — no redelivery of committed batches — and the union must equal
    the batch pipeline output exactly once."""
    import time as _time

    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.sink import start_event_stream

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    cut = slots[len(slots) // 2]
    first, second = raw.filter(raw.slot < cut), raw.filter(raw.slot >= cut)
    n_total = build_events_core(raw).count()
    n_first = build_events_core(first).count()
    assert 0 < n_first < n_total

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "archive")
        ckpt = os.path.join(tmp, "ckpt")
        first.coalesce(1).write.mode("append").parquet(archive)

        run1: list = []
        q = start_event_stream(
            read_transaction_stream(spark, archive),
            lambda rows: run1.extend(rows), ckpt)
        q.awaitTermination(120)          # availableNow: drains and stops
        assert len(run1) == n_first

        _time.sleep(1.1)                 # distinct mtime for the new file
        second.coalesce(1).write.mode("append").parquet(archive)

        run2: list = []
        q = start_event_stream(          # SAME checkpoint dir
            read_transaction_stream(spark, archive),
            lambda rows: run2.extend(rows), ckpt)
        q.awaitTermination(120)

    # restart delivered ONLY the new data — no batch-0 redelivery
    assert len(run2) == n_total - n_first
    sigs1 = {r["signature"] for r in run1}
    assert all(r["signature"] not in sigs1 for r in run2)
