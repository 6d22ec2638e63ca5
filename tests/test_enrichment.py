"""Lake as-of enrichment (VERDICT r11 item 2 / r10 item 6): attach the
latest decoded account state to each trade as-of its slot — the
temporal generalization of the reference's within-transaction
look-ahead enrichment (/root/reference/src/common/types.rs:369-535)."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from solana_event_stream_spark.plans.enrichment import (
    enrich_trades_asof, enrich_trades_asof_from_lakes)

TRADES = "sig string, slot long, bonding_curve string, sol_amount long"
STATES = ("pubkey string, slot long, recv_us long, "
          "virtual_sol_reserves decimal(20,0), complete boolean")


def _trades(spark):
    return spark.createDataFrame([
        ("t1", 5,  "curveA", 100),   # before any A state
        ("t2", 10, "curveA", 200),   # same slot as a state write
        ("t3", 20, "curveA", 300),   # between writes
        ("t4", 40, "curveA", 400),   # long after the last write
        ("t5", 12, "curveB", 500),   # other key
        ("t6", 15, None,     600),   # no account column -> NULL state
    ], TRADES)


def _states(spark):
    # state TRANSITIONS between slots, incl. two same-slot writes for
    # curveA at slot 10 (recv_us tiebreak must pick the later one).
    return spark.createDataFrame([
        ("curveA", 8,  1000, Decimal(80),  False),
        ("curveA", 10, 2000, Decimal(100), False),
        ("curveA", 10, 3000, Decimal(110), False),  # later recv wins
        ("curveA", 15, 4000, Decimal(150), True),
        ("curveB", 11, 5000, Decimal(999), False),
    ], STATES)


def _by_sig(df):
    return {r.sig: (r.state_slot, r.state_virtual_sol_reserves,
                    r.state_complete) for r in df.collect()}


def test_enrich_golden_nonstrict(spark):
    got = _by_sig(enrich_trades_asof(
        _trades(spark), _states(spark),
        state_cols=("virtual_sol_reserves", "complete")))
    assert got == {
        "t1": (None, None, None),              # no state before slot 5
        "t2": (10, Decimal(110), False),       # same-slot write visible,
                                               # recv_us tiebreak -> 110
        "t3": (15, Decimal(150), True),        # latest <= 20
        "t4": (15, Decimal(150), True),        # carried forward
        "t5": (11, Decimal(999), False),       # keys don't cross
        "t6": (None, None, None),              # NULL key bypasses join
    }


def test_enrich_strict_and_tolerance(spark):
    strict = _by_sig(enrich_trades_asof(
        _trades(spark), _states(spark), strict=True,
        state_cols=("virtual_sol_reserves", "complete")))
    # strict: t2 no longer sees its own slot's write
    assert strict["t2"] == (8, Decimal(80), False)
    assert strict["t3"] == (15, Decimal(150), True)

    tol = _by_sig(enrich_trades_asof(
        _trades(spark), _states(spark), slot_tolerance=10,
        state_cols=("virtual_sol_reserves", "complete")))
    # t4 at slot 40: last write at 15 is 25 slots stale -> expired
    assert tol["t4"] == (None, None, None)
    assert tol["t3"] == (15, Decimal(150), True)   # 5 slots: fresh


@pytest.mark.parametrize("strict", [False, True])
def test_enrich_skewed_differential(spark, strict):
    """The hot-account form must be row-identical to the plain form —
    slice width forced tiny (3 slots) so boundary carries actually
    happen inside the fixture's slot span."""
    kw = dict(state_cols=("virtual_sol_reserves", "complete"),
              strict=strict)
    plain = _by_sig(enrich_trades_asof(_trades(spark), _states(spark),
                                       **kw))
    skewed = _by_sig(enrich_trades_asof(_trades(spark), _states(spark),
                                        skewed=True, slice_slots=3, **kw))
    assert plain == skewed


def test_enrich_from_lakes(spark, tmp_path):
    """Wiring through load_event_lake: trade lake filtered to decoded
    trade event types, account lake read as-is."""
    tdir, adir = str(tmp_path / "trades"), str(tmp_path / "accounts")
    (_trades(spark)
     .withColumn("event_type",
                 F.when(F.col("sig") == "t6", F.lit("PumpFunCreateToken"))
                 .otherwise(F.lit("PumpFunBuy")))
     .write.parquet(tdir))
    _states(spark).write.parquet(adir)
    out = enrich_trades_asof_from_lakes(
        spark, tdir, adir, state_cols=("virtual_sol_reserves",))
    got = {r.sig: r.state_virtual_sol_reserves for r in out.collect()}
    assert got == {"t1": None, "t2": Decimal(110), "t3": Decimal(150),
                   "t4": Decimal(150), "t5": Decimal(999)}  # t6 filtered


def test_enrich_plan_shape(spark):
    """Scale gates: no cartesian/nested-loop anywhere; the keyless
    branch is filter-only (never enters the key exchange)."""
    out = enrich_trades_asof(_trades(spark), _states(spark),
                             state_cols=("virtual_sol_reserves",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_enrich_end_to_end_through_streamed_lakes(spark, tmp_path):
    """The full path the API exists for: BOTH lakes materialized by
    their production streaming sinks (tx raws -> decoded trade lake;
    account raws -> decoded account lake), then
    enrich_trades_asof_from_lakes attaches bonding-curve state to a
    real PumpFunBuy as-of its slot. The account fixture's bonding-curve
    row is replayed at the trade's pubkey at two slots bracketing the
    trade — the as-of must pick the earlier one and carry its decoded
    reserves."""
    import os

    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.account_pipeline import (
        load_raw_accounts)
    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.sources.replay import (
        read_account_stream, read_transaction_stream,
        write_account_archive, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        start_account_archive_stream, start_event_archive_stream)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw_tx = load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))

    # the target: one decoded PumpFunBuy and its bonding curve
    buy = (build_events_core(raw_tx)
           .filter((F.col("event_type") == "PumpFunBuy")
                   & F.col("bonding_curve").isNotNull())
           .select("signature", "slot", "bonding_curve").first())
    assert buy is not None

    # account raws: the fixture's PumpFunBondingCurve row replayed at
    # the trade's bonding curve, at slots trade-10 and trade+10
    raw_acct = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    curve_raw = raw_acct.filter(
        F.col("pubkey") == "SKAQfKByHwWn3XZ6zZtx5ZMg48zpuG1ZsK7UhtSjzBZ")
    assert curve_raw.count() == 1
    replayed = curve_raw.select(
        F.explode(F.array(F.lit(buy.slot - 10), F.lit(buy.slot + 10)))
        .alias("slot"),
        F.concat_ws("_", "signature", F.lit("replay")).alias("signature"),
        F.lit(buy.bonding_curve).alias("pubkey"),
        "executable", "lamports", "owner", "rent_epoch", "data",
        "recv_us")

    tdir = str(tmp_path / "trade_lake")
    adir = str(tmp_path / "acct_lake")
    tsrc, asrc = str(tmp_path / "tsrc"), str(tmp_path / "asrc")
    write_slot_bucketed_archive(raw_tx, tsrc, n_buckets=3)
    write_account_archive(replayed, asrc, slots_per_bucket=100)
    q1 = start_event_archive_stream(
        read_transaction_stream(spark, tsrc, max_files_per_trigger=4),
        tdir, str(tmp_path / "tckpt"), slots_per_dir=100,
        available_now=True)
    q1.awaitTermination(180)
    q2 = start_account_archive_stream(
        read_account_stream(spark, asrc, max_files_per_trigger=4),
        adir, str(tmp_path / "ackpt"), slots_per_dir=100,
        available_now=True)
    q2.awaitTermination(180)

    out = enrich_trades_asof_from_lakes(
        spark, tdir, adir,
        state_cols=("virtual_sol_reserves", "virtual_token_reserves",
                    "complete"))
    got = {r.signature: r for r in out.collect()}
    target = got[buy.signature]
    # as-of picks the strictly-earlier replay (trade slot - 10), and
    # carries that row's DECODED reserves (fixture goldens: 222/111)
    assert target.state_slot == buy.slot - 10
    assert int(target.state_virtual_sol_reserves) == 222
    assert int(target.state_virtual_token_reserves) == 111
    assert target.state_complete is True
    # trades whose bonding curve never saw an account write: NULL state
    others = [r for s, r in got.items() if s != buy.signature
              and (r.bonding_curve or "") != buy.bonding_curve]
    assert others and all(r.state_slot is None for r in others)


def test_streaming_enrichment_matches_batch(spark, tmp_path):
    """start_enriched_trade_stream: micro-batched enrichment against
    the account lake equals the batch enrichment of the same trades —
    the operator inside foreachBatch IS the batch operator."""
    from solana_event_stream_spark.plans.enrichment import (
        start_enriched_trade_stream)

    tdir, adir = str(tmp_path / "trades"), str(tmp_path / "accounts")
    _trades(spark).write.parquet(tdir)
    _states(spark).write.parquet(adir)
    kw = dict(state_cols=("virtual_sol_reserves", "complete"))

    want = _by_sig(enrich_trades_asof(
        spark.read.parquet(tdir), spark.read.parquet(adir), **kw))

    got: dict = {}
    stream = (spark.readStream
              .schema(spark.read.parquet(tdir).schema)
              .option("maxFilesPerTrigger", 1).parquet(tdir))
    q = start_enriched_trade_stream(
        stream, adir,
        lambda df, _bid: got.update(
            {r.sig: (r.state_slot, r.state_virtual_sol_reserves,
                     r.state_complete) for r in df.collect()}),
        str(tmp_path / "ckpt"), available_now=True, **kw)
    q.awaitTermination(120)
    assert got == want
