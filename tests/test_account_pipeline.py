"""Golden test for the account-update pipeline (D3/P8)."""

from __future__ import annotations

import os

from test_pipeline_golden import _sorted_rows

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_account_events_match_golden(spark):
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)
    raw = load_raw_accounts(
        spark, os.path.join(FIXTURES, "raw_accounts.parquet"))
    got = build_account_events(raw).toPandas()
    exp = spark.read.parquet(
        os.path.join(FIXTURES, "accounts_golden.parquet")).toPandas()
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    cols = sorted(exp.columns)
    grows, erows = _sorted_rows(got, cols), _sorted_rows(exp, cols)
    n_bad = 0
    for i, (g, e) in enumerate(zip(grows, erows)):
        for c, gv, ev in zip(cols, g, e):
            if gv != ev:
                n_bad += 1
                if n_bad <= 8:
                    print(f"row {i} col {c}: got {gv!r} expected {ev!r}")
    assert n_bad == 0


def test_account_streaming_equals_batch(spark):
    """SURVEY §5.4 for the ACCOUNT path: raw account updates replayed
    as micro-batches through write_account_archive/read_account_stream
    produce exactly the batch build_account_events output (the batch
    output is itself pinned to accounts_golden.parquet above)."""
    import tempfile

    from conftest import stop_streaming_query
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)
    from solana_event_stream_spark.sources.replay import (
        read_account_stream, write_account_archive)

    raw = load_raw_accounts(
        spark, os.path.join(FIXTURES, "raw_accounts.parquet"))
    batch_rows = [r.asDict() for r in build_account_events(raw).collect()]
    assert batch_rows

    collected: list = []
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "archive")
        write_account_archive(raw, archive, slots_per_bucket=10)
        stream = read_account_stream(spark, archive)
        assert stream.isStreaming
        q = (build_account_events(stream).writeStream
             .foreachBatch(lambda df, bid: collected.extend(
                 r.asDict() for r in df.collect()))
             .option("checkpointLocation", os.path.join(tmp, "ckpt"))
             .trigger(availableNow=True)
             .start())
        try:
            q.awaitTermination(120)
        finally:
            stop_streaming_query(q, spark)

    def _rows(dicts):
        return sorted(tuple((k, str(v)) for k, v in sorted(d.items()))
                      for d in dicts)

    assert len(collected) == len(batch_rows)
    assert _rows(collected) == _rows(batch_rows)
