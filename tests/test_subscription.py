"""S3 subscribe_system and S5 dynamic subscription update tests."""

from __future__ import annotations

import os
import tempfile
import time

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_subscribe_system_batch(spark):
    """S3 (yellowstone_sub_system.rs:34-113): system-program transactions
    -> NewTransfer {slot, signature, tx} without decoding."""
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    from solana_event_stream_spark.registry import SYSTEM_PROGRAM_ID
    from solana_event_stream_spark.streaming.subscription import (
        subscribe_system)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    out = subscribe_system(raw)
    rows = out.collect()
    # every emitted row's tx mentions the system program; no decoding
    assert set(out.columns) == {"slot", "signature", "tx"}
    assert rows, "fixture corpus contains system-program transactions"
    for r in rows:
        all_accounts = (list(r.tx.static_account_keys or [])
                        + list(r.tx.loaded_writable_addresses or [])
                        + list(r.tx.loaded_readonly_addresses or []))
        assert SYSTEM_PROGRAM_ID in all_accounts
    # exclude filter drops rows (account_required still applies)
    sig0 = rows[0].tx.static_account_keys[0]
    fewer = subscribe_system(raw, account_exclude=[sig0]).count()
    assert fewer < len(rows)


def test_subscribe_system_streaming(spark):
    """S3 runs unchanged on a streaming DataFrame."""
    import tempfile

    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.subscription import (
        subscribe_system)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    n_batch = subscribe_system(raw).count()
    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_bucketed_archive(raw, archive, n_buckets=2)
        stream = subscribe_system(read_transaction_stream(spark, archive))
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("sys_transfers")
             .option("checkpointLocation", os.path.join(tmp, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert spark.table("sys_transfers").count() == n_batch


def test_dynamic_filter_swap_mid_stream(spark):
    """S5 (yellowstone_grpc.rs:293-343): overwriting the filter-spec
    table changes which rows subsequent micro-batches emit, without
    restarting the query."""
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.subscription import (
        start_dynamic_filtered_stream, write_filter_spec)

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    n_total = raw.count()

    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_bucketed_archive(raw, archive, n_buckets=2)
        spec = os.path.join(tmp, "filter_spec.json")
        write_filter_spec(spec)  # pass-through

        batches: list[tuple[int, int]] = []  # (batch_id, n_rows)
        q = start_dynamic_filtered_stream(
            read_transaction_stream(spark, archive), spark, spec,
            lambda df, bid: batches.append((bid, df.count())),
            os.path.join(tmp, "ckpt"),
            trigger={"processingTime": "1 seconds"})
        try:
            deadline = time.time() + 60
            while sum(n for _, n in batches) < n_total \
                    and time.time() < deadline:
                time.sleep(0.5)
            n_before = sum(n for _, n in batches)
            assert n_before == n_total  # pass-through spec emits all
            seen = len(batches)

            # swap to an impossible include mid-stream: every row of the
            # re-fed corpus must now be dropped, without a restart
            input_before = sum(p.numInputRows for p in q.recentProgress)
            write_filter_spec(spec, account_include=["NoSuchAccount111"])
            raw.write.mode("append").parquet(archive)
            deadline = time.time() + 60
            while time.time() < deadline:
                later = batches[seen:]
                # break once the appended corpus has actually been FED
                # to the filter (source-side numInputRows accounting —
                # the callback sees only post-filter rows, which must
                # be zero here, so row counts from `batches` cannot
                # signal arrival). The old exit waited for >= 3 batches
                # after the swap, but maxFilesPerTrigger often delivers
                # the append in 1-2, burning the full 60 s deadline on
                # every run before the asserts (which then passed).
                fed = sum(p.numInputRows
                          for p in q.recentProgress) - input_before
                if later and fed >= n_total:
                    break
                time.sleep(0.5)
            later = [n for _, n in batches[seen:]]
            assert later, "no batches after filter swap"
            assert sum(later) == 0, (n_before, later)
        finally:
            from conftest import stop_streaming_query
            stop_streaming_query(q, spark)
