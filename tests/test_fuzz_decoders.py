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
