"""Differential guard for the vectorized decode fast path (VERDICT r8
item 1): operators/decode_vec.py must produce BIT-IDENTICAL output to
the per-row decoders in operators/decode.py for every batch — on the
golden fixture corpus, under structural corruption (truncated payloads,
missing accounts, corrupt CPI bodies, multi-candidate rows that force
the per-row fallback), and on sliced (non-zero-offset) batches."""

from __future__ import annotations

import os
import random

import pyarrow as pa

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _input_batch(spark):
    from solana_event_stream_spark.plans.pipeline import (
        build_decode_input, load_raw_transactions)
    din = build_decode_input(load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet")))
    return din.toArrow().combine_chunks().to_batches()[0]


def _run_both(batch):
    from solana_event_stream_spark.plans.pipeline import _decode_batches
    vec = pa.Table.from_batches(
        list(_decode_batches(iter([batch]), None, vectorized=True)))
    py = pa.Table.from_batches(
        list(_decode_batches(iter([batch]), None, vectorized=False)))
    return vec, py


def _assert_equal(vec: pa.Table, py: pa.Table, ctx: str = ""):
    assert vec.num_rows == py.num_rows, (ctx, vec.num_rows, py.num_rows)
    assert vec.schema.equals(py.schema), ctx
    for name in vec.schema.names:
        assert vec.column(name).equals(py.column(name)), (ctx, name)


def test_fixture_differential(spark):
    batch = _input_batch(spark)
    vec, py = _run_both(batch)
    assert vec.num_rows > 0
    _assert_equal(vec, py)


def test_fast_path_engagement(spark):
    """The vector path must actually cover the hot types — if every row
    silently fell through to the per-row loop the A/B win is gone."""
    from solana_event_stream_spark.operators.decode_vec import (
        decode_batch_vectorized)
    batch = _input_batch(spark)
    groups, slow = decode_batch_vectorized(batch)
    n_fast = sum(len(g) for g in groups)
    assert n_fast >= 25, n_fast          # fixture has ~32 fast-type rows
    assert slow.size <= batch.num_rows - n_fast
    fast_types = {g.etypes for g in groups if isinstance(g.etypes, str)}
    assert {"PumpFunBuy", "BonkBuyExactIn",
            "RaydiumCpmmSwapBaseInput"} <= fast_types


def test_sliced_batches_differential(spark):
    """Non-zero-offset Arrow slices (Spark splits batches) decode the
    same through both paths."""
    from solana_event_stream_spark.plans.pipeline import _decode_batches
    batch = _input_batch(spark)
    mid = batch.num_rows // 2
    halves = [batch.slice(0, mid), batch.slice(mid)]
    vec = pa.Table.from_batches(
        list(_decode_batches(iter(halves), None, vectorized=True)))
    py = pa.Table.from_batches(
        list(_decode_batches(iter(halves), None, vectorized=False)))
    _assert_equal(vec, py, "sliced")


def _mutate(batch: pa.RecordBatch, rng: random.Random) -> pa.RecordBatch:
    """Structurally corrupt a decode_input batch: each mutation hits a
    specific guard (F7 length, min-accounts, strict borsh bools, F8
    direction, CPI truncation) or forces the multi-candidate fallback."""
    names = batch.schema.names
    cols = {nm: batch.column(i).to_pylist() for i, nm in enumerate(names)}
    n = batch.num_rows
    for i in range(n):
        choice = rng.random()
        if choice < 0.25 and cols["data"][i] is not None:
            cut = rng.randrange(0, max(1, len(cols["data"][i])))
            cols["data"][i] = cols["data"][i][:cut]
        elif choice < 0.40 and cols["resolved_accounts"][i]:
            keep = rng.randrange(0, len(cols["resolved_accounts"][i]))
            cols["resolved_accounts"][i] = \
                cols["resolved_accounts"][i][:keep]
        elif choice < 0.70 and cols["cpi_candidates"][i]:
            cands = [dict(c) for c in cols["cpi_candidates"][i]]
            sub = rng.random()
            if sub < 0.3:                      # truncate body
                c = cands[0]
                c["body"] = (c["body"] or b"")[
                    :rng.randrange(0, max(1, len(c["body"] or b"")))]
            elif sub < 0.5 and cands[0]["body"]:  # flip a byte (bools/F8)
                b = bytearray(cands[0]["body"])
                pos = rng.randrange(len(b))
                b[pos] = rng.randrange(256)
                cands[0]["body"] = bytes(b)
            elif sub < 0.75:                   # duplicate -> defer path
                cands = cands + cands
            else:                              # wrong kind -> no merge
                cands[0]["kind"] = rng.choice(
                    ["pumpfun_trade", "bonk_trade", "meteora_swap",
                     "pumpswap_buy"])
            cols["cpi_candidates"][i] = cands
        elif choice < 0.80:
            cols["transfer_candidates"][i] = None
    arrays = [pa.array(cols[nm], batch.schema.field(nm).type)
              for nm in names]
    return pa.RecordBatch.from_arrays(arrays, schema=batch.schema)


def test_corruption_differential(spark):
    batch = _input_batch(spark)
    for seed in range(12):
        mutated = _mutate(batch, random.Random(seed))
        vec, py = _run_both(mutated)
        _assert_equal(vec, py, f"seed={seed}")


def test_f9_wrong_kind_decodable_cpi_parity(spark):
    """ADVICE r9 (medium): a requires_cpi row (PumpFunMigrate) with
    exactly ONE candidate whose kind differs from the spec's CPI kind
    (same-protocol, so the JVM J1 filter attaches it) but whose body
    DECODES under its own kind must be KEPT — the per-row F9 accepts
    any decoded candidate (event_parser.rs:441-448). The fast path
    can't decide this (it only knows its own layout), so it defers the
    row to the per-row fallback; both paths must stay bit-identical."""
    from solana_event_stream_spark.operators.decode import (
        decode_cpi_with_f8)

    batch = _input_batch(spark)
    names = batch.schema.names
    cols = {nm: batch.column(i).to_pylist() for i, nm in enumerate(names)}
    n = batch.num_rows

    # harvest a same-protocol candidate that decodes under its own kind
    donor = None
    for i in range(n):
        for c in (cols["cpi_candidates"][i] or ()):
            if c["kind"] == "pumpfun_trade" and decode_cpi_with_f8(
                    "pumpfun_trade", c["body"] or b"",
                    cols["event_type"][i]) is not None:
                donor = dict(c)
                break
        if donor:
            break
    assert donor is not None, "fixture lost its pumpfun_trade CPI rows"

    migrate_rows = [i for i in range(n)
                    if cols["event_type"][i] == "PumpFunMigrate"]
    assert migrate_rows, "fixture lost its PumpFunMigrate rows"
    for i in migrate_rows:
        cols["cpi_candidates"][i] = [donor]

    arrays = [pa.array(cols[nm], batch.schema.field(nm).type)
              for nm in names]
    mutated = pa.RecordBatch.from_arrays(arrays, schema=batch.schema)
    vec, py = _run_both(mutated)
    _assert_equal(vec, py, "f9-wrong-kind")
    # and the per-row semantics really do KEEP the row (no merge applied)
    kept = py.filter(pa.compute.equal(py.column("event_type"),
                                      "PumpFunMigrate"))
    assert kept.num_rows == len(migrate_rows)


def test_all_common_empty_data(spark):
    """Every row skipped must still yield a schema-correct empty batch
    through the vector path (mirrors the arrow-boundary guard)."""
    from solana_event_stream_spark.plans.pipeline import (
        _arrow_event_schema, _decode_batches)
    batch = _input_batch(spark)
    n = batch.num_rows
    cols = {nm: batch.column(i) for i, nm in enumerate(batch.schema.names)}
    cols["protocol"] = pa.array(["Common"] * n, pa.string())
    cols["data"] = pa.array([b""] * n, batch.schema.field("data").type)
    bad = pa.RecordBatch.from_arrays(
        [cols[nm] for nm in batch.schema.names], schema=batch.schema)
    out = list(_decode_batches(iter([bad]), None, vectorized=True))
    assert out[0].num_rows == 0
    assert out[0].schema.equals(_arrow_event_schema())


def test_u128_lane_carrier():
    """VERDICT r9 item 5: u128 fields ride as two u64 NumPy lanes and
    become decimal128 by buffer assembly — logically identical to the
    Python-int path (values, nulls, the exact 10^38-1 boundary), with
    the documented clip region raising the same ArrowInvalid."""
    import numpy as np
    import pytest

    from solana_event_stream_spark.operators.decode_vec import (
        _DEC38_MAX, U128)

    typ = pa.decimal128(38, 0)
    lo = np.array([1, 2**64 - 1, 0, 123456789], "<u8")
    hi = np.array([0, 5, 0, 2**33], "<u8")
    u = U128(lo.copy(), hi.copy())
    assert u.to_arrow(typ).equals(pa.array(u.tolist(), typ))

    m = np.array([False, True, False, False])
    um = U128(lo.copy(), hi.copy(), m)
    got = um.to_arrow(typ)
    assert got.equals(pa.array(um.tolist(), typ)) and got.null_count == 1

    mx = U128(np.array([_DEC38_MAX & (2**64 - 1)], "<u8"),
              np.array([_DEC38_MAX >> 64], "<u8"))
    assert mx.to_arrow(typ).equals(pa.array([_DEC38_MAX], typ))

    over = U128(np.array([0], "<u8"),
                np.array([(_DEC38_MAX >> 64) + 1], "<u8"))
    with pytest.raises(pa.lib.ArrowInvalid):
        over.to_arrow(typ)

    # a NULL slot holding an out-of-range residue must not trip the clip
    g = U128(np.array([0, 7], "<u8"), np.array([2**63, 0], "<u8"),
             np.array([True, False]))
    assert g.to_arrow(typ).equals(pa.array([None, 7], typ))
