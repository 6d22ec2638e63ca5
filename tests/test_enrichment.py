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
                 F.when(F.col("sig") == "t6", F.lit("pumpfun_create"))
                 .otherwise(F.lit("pumpfun_trade")))
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
