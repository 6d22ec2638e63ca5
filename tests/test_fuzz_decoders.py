"""SURVEY §5.6 property tests: every decoder must behave like the
reference on malformed input — return None (or a well-formed dict),
NEVER raise (F7 semantics: the reference returns Option::None on every
length/tag violation, core/event_parser.rs:330-334, pumpfun/parser.rs:120).

Byte-fuzz over all instruction, CPI, ComputeBudget and account decoders,
plus truncation sweeps of valid golden payloads, plus the F10
account-index bounds rule."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from solana_event_stream_spark.operators.account_decode import (
    PROTOCOL_ACCOUNT_DECODERS, decode_nonce, decode_spl_mint,
    decode_token2022_mint, decode_token_amount)
from solana_event_stream_spark.operators.decode import (
    CPI_DECODERS, INSTRUCTION_DECODERS, b58decode, b58encode,
    decode_compute_budget, decode_cpi_with_f8)

_DATA = st.binary(min_size=0, max_size=600)
_ACCOUNTS = st.lists(st.text(
    alphabet="123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz",
    min_size=32, max_size=44), min_size=0, max_size=24)


@settings(max_examples=30, deadline=None)
@given(data=_DATA, accounts=_ACCOUNTS)
def test_instruction_decoders_never_throw(data, accounts):
    for name, decoder in INSTRUCTION_DECODERS.items():
        out = decoder(data, accounts)
        assert out is None or isinstance(out, dict), name


@settings(max_examples=30, deadline=None)
@given(data=_DATA)
def test_cpi_decoders_never_throw(data):
    for kind in CPI_DECODERS:
        out = decode_cpi_with_f8(kind, data, "PumpFunBuy")
        assert out is None or isinstance(out, dict), kind


@settings(max_examples=50, deadline=None)
@given(data=_DATA)
def test_compute_budget_never_throws(data):
    out = decode_compute_budget(data)
    assert out is None or (isinstance(out, tuple) and len(out) == 2)


@settings(max_examples=30, deadline=None)
@given(data=_DATA)
def test_account_decoders_never_throw(data):
    for name, decoder in PROTOCOL_ACCOUNT_DECODERS.items():
        out = decoder(data)
        assert out is None or isinstance(out, dict), name
    for fn in (decode_nonce, decode_spl_mint, decode_token2022_mint):
        out = fn(data)
        assert out is None or isinstance(out, dict)
    out = decode_token_amount(data, "owner")
    assert out is None or isinstance(out, dict)


def test_truncation_sweep_on_golden_payloads(spark):
    """Every truncated prefix of every real fixture instruction payload
    decodes to None or a dict — no decoder may throw partway through a
    field (the reference's cursor returns None past the end)."""
    import os

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = spark.read.parquet(
        os.path.join(fixtures, "raw_transactions.parquet"))
    payloads = [bytes(ix["data"])
                for row in raw.select("instructions").collect()
                for ix in row.instructions if ix["data"] is not None]
    assert payloads
    accounts = [f"ACC{i:02d}" + "x" * 38 for i in range(20)]
    for data in payloads:
        body = data[8:]
        for cut in range(0, min(len(body), 64)):
            for decoder in INSTRUCTION_DECODERS.values():
                out = decoder(body[:cut], accounts)
                assert out is None or isinstance(out, dict)


@settings(max_examples=100, deadline=None)
@given(raw=st.binary(min_size=0, max_size=64))
def test_b58_roundtrip(raw):
    assert b58decode(b58encode(raw)) == raw


def test_full_pipeline_survives_structural_corruption(spark):
    """End-to-end robustness (round 8): randomly corrupted REAL fixture
    transactions — truncated/bit-flipped instruction data, out-of-range
    program and account indices, NULLed account-key arrays, duplicated
    and out-of-range inner-group indices, NULL times — must flow
    through the FULL pipeline (JVM dispatch + pre-scans + Arrow decode
    + merge + enrichment) without raising, per the reference's
    drop-don't-crash contract (event_parser.rs filter_map semantics).
    Complements the per-decoder hypothesis fuzz (Python halves) and the
    J1/J2 candidate property test (JVM halves) with the composed plan."""
    import os
    import random

    from solana_event_stream_spark.plans.pipeline import (
        build_events, load_raw_transactions)
    from solana_event_stream_spark.registry import INSTRUCTION_DISCRIMINATORS
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    base = [r.asDict(recursive=True) for r in load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))
        .collect()]
    rng = random.Random(20260814)

    def corrupt_ix(ix):
        ix = dict(ix)
        roll = rng.randrange(6)
        d = ix.get("data")
        if roll == 0 and d:
            ix["data"] = bytes(d)[:rng.randrange(len(d) + 1)]
        elif roll == 1 and d:
            b = bytearray(d)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            ix["data"] = bytes(b)
        elif roll == 2:
            ix["program_id_index"] = rng.choice((0, 63, 255, 1000))
        elif roll == 3 and ix.get("account_indices"):
            ai = list(ix["account_indices"])
            ai[rng.randrange(len(ai))] = rng.choice((63, 255, 1000))
            ix["account_indices"] = ai
        elif roll == 4:
            ix["account_indices"] = rng.choice((None, []))
        else:
            ix["data"] = rng.choice((None, b""))
        return ix

    mutants = []
    for rep in range(3):
        for t, tx in enumerate(base):
            m = dict(tx)
            m["signature"] = f"{tx['signature']}_m{rep}"
            roll = rng.randrange(5)
            if roll == 0 and m.get("instructions"):
                m["instructions"] = [corrupt_ix(ix)
                                     for ix in m["instructions"]]
            elif roll == 1 and m.get("inner_instructions"):
                m["inner_instructions"] = [
                    {"index": rng.choice((g["index"], g["index"], 99)),
                     "instructions": rng.choice((
                         g["instructions"],
                         None,
                         [corrupt_ix(ix)
                          for ix in (g["instructions"] or [])]))}
                    for g in m["inner_instructions"]]
                if rng.random() < 0.3:      # duplicate a group index
                    m["inner_instructions"] = (
                        m["inner_instructions"]
                        + m["inner_instructions"][:1])
            elif roll == 2:
                m["static_account_keys"] = rng.choice((
                    None, [],
                    (m["static_account_keys"] or [])[:1]))
            elif roll == 3:
                m["loaded_writable_addresses"] = None
                m["loaded_readonly_addresses"] = None
                m["block_time"] = None
                m["recv_us"] = None
            else:
                m["instructions"] = rng.choice((None, []))
            mutants.append(m)

    raw = spark.createDataFrame(base + mutants, RAW_TRANSACTION_SCHEMA)
    baseline_types = {r.event_type for r in build_events(
        spark.createDataFrame(base, RAW_TRANSACTION_SCHEMA)).collect()}
    events = build_events(raw).collect()        # must not raise
    assert len(events) > 0                      # uncorrupted base decodes
    # corruption may flip a disc into another REGISTERED type or a
    # ComputeBudget variant, never into something outside the registry
    known = (set(INSTRUCTION_DISCRIMINATORS.values())
             | baseline_types | {None})
    assert {r.event_type for r in events} <= known


def test_account_pipeline_survives_structural_corruption(spark):
    """Account-pipeline analog of the transaction corruption fuzz:
    randomly corrupted fixture account updates (truncated/bit-flipped
    data, NULL data/owner/pubkey, wrong owners) must flow through the
    full D3 dispatch + Arrow decode without raising; corrupted rows
    degrade to dropped/NULL-field events, never errors."""
    import os
    import random

    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    base = [r.asDict() for r in load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet")).collect()]
    rng = random.Random(8142026)

    mutants = []
    for rep in range(3):
        for a in base:
            m = dict(a)
            m["pubkey"] = f"{a['pubkey']}_m{rep}"
            roll = rng.randrange(5)
            d = m.get("data")
            if roll == 0 and d:
                m["data"] = bytes(d)[:rng.randrange(len(d) + 1)]
            elif roll == 1 and d:
                b = bytearray(d)
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
                m["data"] = bytes(b)
            elif roll == 2:
                m["data"] = rng.choice((None, b"", b"\x00"))
            elif roll == 3:
                m["owner"] = rng.choice((None, "NotAProgram111111111111"
                                         "1111111111111111111"))
            else:
                m["lamports"] = rng.choice((None, 0, 2**62))
                m["slot"] = rng.choice((m["slot"], None))
            mutants.append(m)

    from solana_event_stream_spark.schemas import RAW_ACCOUNT_SCHEMA
    raw = spark.createDataFrame(base + mutants, RAW_ACCOUNT_SCHEMA)
    events = build_account_events(raw).collect()    # must not raise
    assert len(events) > 0
