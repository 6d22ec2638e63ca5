"""F3/F4/F5 client-side filter semantics."""

from __future__ import annotations

import os

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_event_type_filter(spark):
    from solana_event_stream_spark.operators.filters import (
        filter_event_types)
    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    ev = build_events(raw)
    only_buys = filter_event_types(ev, ["PumpFunBuy"])
    types = {r["event_type"] for r in only_buys.collect()}
    assert types == {"PumpFunBuy"}


def test_transaction_account_filters(spark):
    from solana_event_stream_spark.operators.filters import (
        filter_transactions)
    from solana_event_stream_spark.plans.pipeline import (
        load_raw_transactions)
    from solana_event_stream_spark.registry import (BONK_PROGRAM_ID,
                                                    PUMPFUN_PROGRAM_ID)
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    n_all = raw.count()
    n_pf = filter_transactions(
        raw, account_include=[PUMPFUN_PROGRAM_ID]).count()
    n_not_pf = filter_transactions(
        raw, account_exclude=[PUMPFUN_PROGRAM_ID]).count()
    assert n_pf + n_not_pf == n_all
    assert 0 < n_pf < n_all
    n_both = filter_transactions(
        raw, account_required=[PUMPFUN_PROGRAM_ID, BONK_PROGRAM_ID]).count()
    assert n_both == 0  # no fixture tx references both programs


def test_account_filters(spark):
    from solana_event_stream_spark.operators.filters import filter_accounts
    from solana_event_stream_spark.plans.account_pipeline import (
        load_raw_accounts)
    from solana_event_stream_spark.registry import PUMPFUN_PROGRAM_ID
    raw = load_raw_accounts(
        spark, os.path.join(FIXTURES, "raw_accounts.parquet"))
    pf = filter_accounts(raw, owners=[PUMPFUN_PROGRAM_ID])
    assert 0 < pf.count() < raw.count()


def test_null_inner_group_keeps_outer_rows(spark):
    """Regression (r7 single-scan explode): an inner_instructions group
    whose instructions array is NULL must lose only that group's inner
    rows — never the transaction's OUTER rows. A NULL element would
    otherwise poison flatten -> concat -> explode into zero rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType

    from solana_event_stream_spark.plans.pipeline import (
        build_decode_input, load_raw_transactions)
    from solana_event_stream_spark.schemas import INSTRUCTION_TYPE

    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    baseline_outer = (build_decode_input(raw)
                      .filter(F.col("inner_index").isNull()).count())
    assert baseline_outer > 0

    poisoned = raw.withColumn(
        "inner_instructions",
        F.array(F.struct(
            F.lit(0).cast("integer").alias("index"),
            F.lit(None).cast(ArrayType(INSTRUCTION_TYPE))
            .alias("instructions"))))
    rows = build_decode_input(poisoned)
    # outer rows all survive; the poisoned groups contribute no inner rows
    assert rows.filter(F.col("inner_index").isNull()).count() \
        == baseline_outer
    assert rows.filter(F.col("inner_index").isNotNull()).count() == 0


def test_combined_explode_matches_reference_enumeration(spark):
    """Property: for random instruction trees (including NULL inner
    groups, NULL group arrays, empty arrays), build_decode_input emits
    exactly the (outer_index, inner_index) pairs a direct Python
    enumeration of the transaction produces — the contract the
    single-scan rewrite must preserve."""
    import random

    from solana_event_stream_spark.plans.pipeline import (
        build_decode_input)
    from solana_event_stream_spark.registry import PUMPFUN_PROGRAM_ID
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA

    rng = random.Random(1234)
    PF = PUMPFUN_PROGRAM_ID

    buy_disc = bytes.fromhex("66063d1201daebea")  # PumpFunBuy (D1 match)

    def mk_ix():
        # program_id_index 0 -> PF, known discriminator so D1 keeps it
        return {"program_id_index": 0, "account_indices": [0],
                "data": buy_disc
                + bytes(rng.randrange(256) for _ in range(4))}

    txs, expected = [], set()
    for t in range(40):
        sig = f"sig{t}"
        n_outer = rng.randrange(0, 4)
        instructions = [mk_ix() for _ in range(n_outer)] or None
        inner = []
        for g in range(rng.randrange(0, 3)):
            gi = rng.randrange(0, max(1, n_outer))
            shape = rng.randrange(3)
            if shape == 0:
                inner.append({"index": gi, "instructions": None})
            elif shape == 1:
                inner.append({"index": gi, "instructions": []})
            else:
                inner.append({"index": gi, "instructions":
                              [mk_ix() for _ in range(rng.randrange(1, 3))]})
        txs.append({
            "slot": 1, "transaction_index": t, "block_time": None,
            "signature": sig, "is_vote": False, "recv_us": 1,
            "static_account_keys": [PF],
            "loaded_writable_addresses": None,
            "loaded_readonly_addresses": None,
            "instructions": instructions,
            "inner_instructions": inner or None, "source": "t",
        })
        for i in range(n_outer):
            expected.add((sig, i, None))
        for grp in inner:
            for j in range(len(grp["instructions"] or [])):
                expected.add((sig, grp["index"], j))

    raw = spark.createDataFrame(txs, RAW_TRANSACTION_SCHEMA)
    got = {(r.signature, r.outer_index, r.inner_index)
           for r in build_decode_input(raw)
           .select("signature", "outer_index", "inner_index").collect()}
    assert got == expected
