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


def test_jvm_candidate_scans_match_reference_enumeration(spark):
    """Round-7 verdict item 7: extend the explode property test to the
    J1/J2 JVM pre-scans. Random inner-instruction groups — duplicate
    group indices, out-of-range program_id_index and account indices,
    empty/NULL data, NULL instruction arrays, short discriminators —
    through build_decode_input must produce exactly the
    `cpi_candidates` and `transfer_candidates` a direct Python
    enumeration of the reference semantics yields per row
    (event_parser.rs:392-439 CPI scan; types.rs:461-489 look-ahead with
    skip(current_index+1) and first-break truncation)."""
    import random

    from solana_event_stream_spark.plans.pipeline import build_decode_input
    from solana_event_stream_spark.registry import (
        INNER_DISCRIMINATORS, INSTRUCTION_DISCRIMINATORS,
        PUMPFUN_PROGRAM_ID, SYSTEM_PROGRAMS, ZERO_PUBKEY)
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA

    rng = random.Random(987)
    PF = PUMPFUN_PROGRAM_ID
    SYS = list(SYSTEM_PROGRAMS)
    buy_disc = bytes.fromhex("66063d1201daebea")          # PumpFunBuy
    pf_cpi = [(bytes.fromhex(d), kind)
              for (proto, d), kind in INNER_DISCRIMINATORS.items()
              if proto == "PumpFun"]
    pf_instr_discs = {d for (proto, d) in INSTRUCTION_DISCRIMINATORS
                      if proto == "PumpFun"}
    base_accounts = [PF, SYS[2], SYS[0],                   # system, spl
                    "UserAaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
                    "UserBbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"]

    def mk_outer():
        return {"program_id_index": 0,
                "account_indices": [rng.randrange(0, 8)
                                    for _ in range(rng.randrange(0, 4))],
                "data": buy_disc
                + bytes(rng.randrange(256) for _ in range(4))}

    def mk_inner():
        shape = rng.randrange(10)
        if shape == 0:        # valid CPI event
            disc, _k = pf_cpi[rng.randrange(len(pf_cpi))]
            return {"program_id_index": 0, "account_indices": [0],
                    "data": disc + bytes(rng.randrange(256)
                                         for _ in range(rng.randrange(5)))}
        if shape == 1:        # short CPI (data < 16)
            disc, _k = pf_cpi[0]
            return {"program_id_index": 0, "account_indices": [0],
                    "data": disc[:rng.randrange(16)]}
        if shape == 2:        # break: non-system program
            return {"program_id_index": 0, "account_indices": [],
                    "data": bytes([rng.randrange(256)])}
        if shape == 3:        # break: program index out of range
            return {"program_id_index": 64 + rng.randrange(8),
                    "account_indices": [0], "data": b"\x03" + b"\x00" * 8}
        if shape == 4:        # NULL / empty data
            return {"program_id_index": rng.choice((1, 2)),
                    "account_indices": [0, 1],
                    "data": rng.choice((None, b""))}
        # transfer-shaped (sometimes short data/ai, sometimes
        # out-of-range account indices)
        tag = rng.choice((2, 3, 12))
        n_ai = rng.randrange(0, 6)
        ai = [rng.choice((0, 1, 2, 3, 4, 63))          # 63: out of range
              for _ in range(n_ai)]
        dlen = rng.choice((0, 4, 8, 9, 11, 12, 14))
        data = bytes([tag]) + bytes(rng.randrange(256)
                                    for _ in range(max(0, dlen - 1)))
        return {"program_id_index": rng.choice((1, 2)),
                "account_indices": ai, "data": data}

    txs = []
    for t in range(60):
        n_outer = rng.randrange(1, 4)
        groups = []
        for _g in range(rng.randrange(0, 4)):
            gi = rng.randrange(0, n_outer + 1)   # may exceed outer range
            if rng.random() < 0.25 and groups:
                gi = groups[-1]["index"]          # duplicate group index
            instrs = ([mk_inner() for _ in range(rng.randrange(1, 6))]
                      if rng.random() < 0.85
                      else rng.choice((None, [])))
            groups.append({"index": gi, "instructions": instrs})
        txs.append({
            "slot": 1, "transaction_index": t, "block_time": None,
            "signature": f"sig{t}", "is_vote": False, "recv_us": 1,
            "static_account_keys": base_accounts,
            "loaded_writable_addresses": None,
            "loaded_readonly_addresses": None,
            "instructions": [mk_outer() for _ in range(n_outer)],
            "inner_instructions": groups or None, "source": "t",
        })

    # ---- direct Python enumeration of the reference semantics ----
    def enumerate_tx(tx):
        outer = tx["instructions"] or []
        max_idx = max((i for ix in outer
                       for i in (ix["account_indices"] or [-1])),
                      default=-1)
        acc = list(tx["static_account_keys"])
        acc += [ZERO_PUBKEY] * max(0, max_idx + 1 - len(acc))

        def surviving(ix):
            pid = (acc[ix["program_id_index"]]
                   if ix["program_id_index"] < len(acc) else None)
            if pid != PF:
                return False
            d = ix["data"] if ix["data"] is not None else None
            if d is None or len(d) < 8:
                return False
            return d[:8].hex() in pf_instr_discs

        rows = []
        for i, ix in enumerate(outer):
            if surviving(ix):
                rows.append((i, None, ix))
        for grp in (tx["inner_instructions"] or []):
            for j, ix in enumerate(grp["instructions"] or []):
                if surviving(ix):
                    rows.append((grp["index"], j, ix))

        out = {}
        for outer_i, inner_i, _ix in rows:
            first = next((g for g in (tx["inner_instructions"] or [])
                          if g["index"] == outer_i), None)
            has_group = first is not None
            ig = (first["instructions"] or []) if first else []

            cpi = []
            for e in ig:
                d = e["data"] or b""
                if len(d) >= 16:
                    kind = INNER_DISCRIMINATORS.get(
                        ("PumpFun", d[:16].hex()))
                    if kind is not None:
                        cpi.append((kind, bytes(d[16:])))

            cur = inner_i if inner_i is not None else -1
            breaks = []
            for pos, e in enumerate(ig):
                if pos <= cur:
                    continue
                pi = e["program_id_index"]
                if pi >= len(acc) or acc[pi] not in SYS:
                    breaks.append(pos)
            first_break = min(breaks, default=len(ig))

            transfers = None
            if has_group:
                transfers = []
                for pos, e in enumerate(ig):
                    if not (cur < pos < first_break):
                        continue
                    d = e["data"] or b""
                    ai = e["account_indices"] or []
                    if len(d) < 8:
                        continue
                    tag = d[0]
                    is12 = tag == 12 and len(ai) >= 4 and len(d) >= 9
                    is3 = tag == 3 and len(ai) >= 3 and len(d) >= 9
                    is2 = tag == 2 and len(ai) >= 2 and len(d) >= 12
                    if not (is12 or is3 or is2):
                        continue
                    s_i = ai[0]
                    d_i = ai[2] if is12 else ai[1]
                    if not (s_i < len(acc) and d_i < len(acc)):
                        continue
                    amount = int.from_bytes(
                        d[4:12] if is2 else d[1:9], "little")
                    transfers.append((acc[s_i], acc[d_i], amount))
                transfers = tuple(transfers)
            out[(tx["signature"], outer_i, inner_i)] = (tuple(cpi),
                                                        transfers)
        return out

    expected = {}
    for tx in txs:
        expected.update(enumerate_tx(tx))

    raw = spark.createDataFrame(txs, RAW_TRANSACTION_SCHEMA)
    got = {}
    for r in build_decode_input(raw).select(
            "signature", "outer_index", "inner_index",
            "cpi_candidates", "transfer_candidates").collect():
        cpi = tuple((c["kind"], bytes(c["body"]))
                    for c in (r.cpi_candidates or []))
        transfers = (None if r.transfer_candidates is None
                     else tuple((c["source"], c["dest"], int(c["amount"]))
                                for c in r.transfer_candidates))
        got[(r.signature, r.outer_index, r.inner_index)] = (cpi, transfers)

    assert set(got) == set(expected)
    mismatches = {k: (got[k], expected[k]) for k in got
                  if got[k] != expected[k]}
    assert not mismatches, list(mismatches.items())[:3]
