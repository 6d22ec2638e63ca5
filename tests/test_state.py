"""Strict cross-batch J3 state vs the window form: the
split-across-batches fixture the window form cannot flag, plus
same-batch parity. The cross-batch scenario runs on every state
backend the environment supports (GroupState always;
transformWithStateInPandas when google.protobuf is installed)."""

from __future__ import annotations

import os
import tempfile
import time

import pytest

from solana_event_stream_spark.streaming.state import (
    INPUT_COLS, has_transform_with_state, tag_dev_trades_stateful,
    tag_dev_trades_stateful_tws)

BACKENDS = [
    pytest.param(tag_dev_trades_stateful, id="applyInPandasWithState"),
    pytest.param(
        tag_dev_trades_stateful_tws, id="transformWithStateInPandas",
        marks=pytest.mark.skipif(
            not has_transform_with_state(),
            reason="transformWithStateInPandas needs google.protobuf, "
                   "not installed in this container")),
]

_run_seq = 0


def _event(signature, slot, event_type, user=None, creator=None, payer=None,
           outer_index=0, inner_index=None, transaction_index=0):
    return {"signature": signature, "slot": slot,
            "transaction_index": transaction_index,
            "outer_index": outer_index, "inner_index": inner_index,
            "event_type": event_type, "user": user, "creator": creator,
            "payer": payer}


SCHEMA = ("signature string, slot long, transaction_index long, "
          "outer_index long, inner_index long, event_type string, "
          "user string, creator string, payer string")


def _run_two_batches(spark, batch1, batch2, tmp,
                     tagger=tag_dev_trades_stateful):
    """Write batch1, stream with maxFilesPerTrigger=1, then batch2 —
    forcing the rows into separate micro-batches with shared state."""
    global _run_seq
    _run_seq += 1
    sink = f"strict_j3_{_run_seq}"
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    spark.createDataFrame([tuple(r[c] for c in INPUT_COLS)
                           for r in batch1], SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    tagged = tagger(stream)
    q = (tagged.writeStream.format("memory").queryName(sink)
         .option("checkpointLocation", os.path.join(tmp, "ckpt"))
         .trigger(processingTime="1 seconds").start())
    try:
        deadline = time.time() + 60
        while spark.table(sink).count() < len(batch1) \
                and time.time() < deadline:
            time.sleep(0.5)
        assert spark.table(sink).count() == len(batch1)
        spark.createDataFrame([tuple(r[c] for c in INPUT_COLS)
                               for r in batch2], SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        total = len(batch1) + len(batch2)
        deadline = time.time() + 60
        while spark.table(sink).count() < total \
                and time.time() < deadline:
            time.sleep(0.5)
        assert spark.table(sink).count() == total
        return {(r.signature, r.event_type, r.slot):
                r.is_dev_create_token_trade
                for r in spark.table(sink).collect()}
    finally:
        q.stop()


@pytest.mark.parametrize("tagger", BACKENDS)
def test_create_trade_split_across_batches(spark, tagger):
    """The reference's GlobalState flags a trade whose create arrived in
    an EARLIER message (global_state.rs:71-114); the window form cannot.
    The strict form must — on whichever state backend the environment
    supports."""
    dev = "DevWallet1111111111111111111111111111111111"
    other = "OtherWallet111111111111111111111111111111111"
    batch1 = [_event("sigA", 1, "PumpFunCreateToken", user=dev),
              _event("sigBonk", 1, "BonkInitialize", creator=dev)]
    batch2 = [_event("sigA", 2, "PumpFunBuy", user=dev, creator=other),
              _event("sigA", 2, "PumpFunSell", user=other, creator=other),
              _event("sigBonk", 2, "BonkBuyExactIn", payer=dev),
              _event("sigOther", 2, "PumpFunBuy", user=other)]
    with tempfile.TemporaryDirectory() as tmp:
        flags = _run_two_batches(spark, batch1, batch2, tmp, tagger)
    # creates carry no flag (reference sets the flag on trades only)
    assert flags[("sigA", "PumpFunCreateToken", 1)] is None
    # cross-batch: dev's later trade in the same signature is flagged
    assert flags[("sigA", "PumpFunBuy", 2)] is True
    assert flags[("sigA", "PumpFunSell", 2)] is False
    assert flags[("sigBonk", "BonkBuyExactIn", 2)] is True
    # a different signature never sees sigA's dev set
    assert flags[("sigOther", "PumpFunBuy", 2)] is False


def test_same_batch_matches_window_form(spark):
    """Within one batch the strict form agrees with enrich_events'
    window: create-then-trade in the same signature flags the trade."""
    dev = "DevWallet1111111111111111111111111111111111"
    batch1 = [_event("sigX", 1, "PumpFunCreateToken", user=dev,
                     outer_index=0),
              _event("sigX", 1, "PumpFunBuy", user=dev, outer_index=1)]
    batch2 = [_event("sigY", 2, "PumpFunBuy", user=dev)]
    with tempfile.TemporaryDirectory() as tmp:
        flags = _run_two_batches(spark, batch1, batch2, tmp)
    assert flags[("sigX", "PumpFunBuy", 1)] is True
    # sigY never had a create: not flagged (state is per signature)
    assert flags[("sigY", "PumpFunBuy", 2)] is False


def test_sequential_order_within_batch(spark):
    """Strict form is sequential like the reference's callback loop: a
    trade BEFORE the create (by instruction order) is not flagged —
    stricter than the window form's whole-partition collect_set."""
    dev = "DevWallet1111111111111111111111111111111111"
    batch1 = [_event("sigZ", 1, "PumpFunBuy", user=dev, outer_index=0),
              _event("sigZ", 1, "PumpFunCreateToken", user=dev,
                     outer_index=1)]
    batch2 = [_event("sigZ", 2, "PumpFunBuy", user=dev)]
    with tempfile.TemporaryDirectory() as tmp:
        flags = _run_two_batches(spark, batch1, batch2, tmp)
    assert flags[("sigZ", "PumpFunBuy", 1)] is False   # before the create
    assert flags[("sigZ", "PumpFunBuy", 2)] is True    # after, next batch


def test_tws_import_gate_and_auto_select(spark):
    """Without protobuf the TWS form refuses with a clear error and the
    auto-selector falls back to GroupState; with protobuf both light up
    (covered by the parametrized cross-batch test above)."""
    from solana_event_stream_spark.streaming import state as st
    stream = (spark.readStream.format("rate")
              .load().selectExpr(
                  "cast(value as string) signature", "value slot",
                  "value transaction_index", "0L outer_index",
                  "0L inner_index", "'PumpFunBuy' event_type",
                  "null user", "null creator", "null payer"))
    if st.has_transform_with_state():
        assert st.tag_dev_trades_strict(stream) is not None
    else:
        with pytest.raises(ImportError, match="protobuf"):
            st.tag_dev_trades_stateful_tws(stream)
        # auto-select silently uses the GroupState form
        assert st.tag_dev_trades_strict(stream) is not None
