"""Drift gate for the r18 parsed-SQL fragments (VERDICT r18 item 8).

build_decode_input / enrich_events emit their heavy columns as f-string
SQL in which some sub-fragments are textually repeated in the composed
string (the J2 ``is2``/``h`` pieces appear 8x inside the byte-
reassembly ``be``; the dispatch maps and CASE skeletons are built by
interpolation). The oracle and golden suites pin values on the FIXTURE
corpus — but fragment drift hides exactly in branches the fixture does
not exercise (out-of-range indices, truncated data, NULL arrays).

This module re-composes the same expressions through the archived
pre-r18 Column-API form (tests/reference_pipeline_r17.py, verbatim from
commit d90d595) and asserts row-for-row parity on the fixture corpus
PLUS structurally corrupted mutants, so a semantic edit to one textual
copy of a duplicated fragment fails loudly here while a faithful edit
(applied to both the fragment and the archived reference) is an
explicit, review-visible two-file change.
"""

from __future__ import annotations

import json
import os
import random

import reference_pipeline_r17 as ref
from solana_event_stream_spark.plans import pipeline as live
from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _mutant_corpus(spark):
    """Fixture transactions + deterministic structural corruption —
    the same recipe as test_fuzz_decoders (different seed), exercising
    the J2 guard branches: truncated/flipped data, out-of-range program
    and account indices, NULL/empty arrays, duplicated group indices."""
    base = [r.asDict(recursive=True) for r in live.load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
        .collect()]
    rng = random.Random(20260818)

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
        for tx in base:
            m = dict(tx)
            m["signature"] = f"{tx['signature']}_d{rep}"
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
            elif roll == 2:
                m["static_account_keys"] = rng.choice((
                    None, [], (m["static_account_keys"] or [])[:1]))
            elif roll == 3:
                m["loaded_writable_addresses"] = None
                m["loaded_readonly_addresses"] = None
                m["block_time"] = None
                m["recv_us"] = None
            else:
                m["instructions"] = rng.choice((None, []))
            mutants.append(m)
    return spark.createDataFrame(base + mutants, RAW_TRANSACTION_SCHEMA)


def _assert_frames_equal(cur, old, label):
    assert cur.schema == old.schema, f"{label}: schema drift"
    extra = cur.exceptAll(old).count()
    missing = old.exceptAll(cur).count()
    assert extra == 0 and missing == 0, (
        f"{label}: fragment drift vs archived d90d595 composition "
        f"(+{extra} rows only in live, -{missing} rows only in "
        f"reference)")


def test_decode_input_fragments_match_reference(spark):
    """F6/P1/F2 + padding + explode structs + dispatch maps + P3 + the
    J1 cpi_kind and J2 is2/h/first_break fragments — the full JVM half,
    on fixture + corrupted rows."""
    raw = _mutant_corpus(spark)
    _assert_frames_equal(live.build_decode_input(raw),
                         ref.build_decode_input(raw),
                         "build_decode_input")


def test_enrich_fragments_match_reference(spark):
    """J3 is_dev / J4 is_bot / P11 swap-fill CASE skeletons and the
    _create_pools collect_set CASEs, on the decoded fixture events
    (the decode stage itself is shared code, not under test)."""
    with open(os.path.join(FIXTURES, "meta.json")) as f:
        bot = json.load(f)["bot_wallet"]
    raw = live.load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    events = live.build_events_core(raw).localCheckpoint()
    for wallet in (bot, None, "O'Brien"):  # incl. the SQL-quote path
        _assert_frames_equal(
            live.enrich_events(events, wallet),
            ref.enrich_events(events, wallet),
            f"enrich_events(bot_wallet={wallet!r})")
