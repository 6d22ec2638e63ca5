"""Batch event pipeline: raw transactions -> decoded, merged, enriched
DEX-event DataFrame (SURVEY §3.1 translated to a single narrow DataFrame
DAG).

Stage layout (no shuffle until user-level aggregation):

  JVM (Catalyst, codegen, pushdown):
    F6 vote filter -> F2 has-any-program prefilter (arrays_overlap before
    explode, so Catalyst keeps it at the scan) -> P1 account assembly +
    padding -> E1/E2 outer+inner instruction flattening (posexplode) ->
    P3 index->pubkey resolution (transform/element_at) -> F1+D1 dispatch
    (literal map lookup on (program, discriminator)) -> filter to matched
    rows only.
  Python (one Arrow-batched mapInPandas over MATCHED rows only — the
  minimal surface builtins cannot express: Borsh decode with
  length-prefixed strings / option tags):
    P5/P6 decode, J1 CPI-scan+merge (intra-row: both sides come from the
    same transaction, merger_event.rs semantics), J2 swap-data look-ahead,
    F7/F8/F9 guards.
  JVM again:
    J3 dev-flag window over signature, J4 bot compare, P11 swap-amount
    fill.

Scale notes: every stage before/after the decode UDF is whole-stage
codegen-able; the decode stage is Arrow-vectorized IO with per-row Python
only for rows that already matched a (program, discriminator) pair — on
mainnet data that is the event rate, not the instruction rate. There is
no shuffle anywhere in the pipeline; output is partition-preserving in
(slot, tx) order, so archive writes can bucket by slot without a
repartition.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from ..registry import (ALL_PROTOCOLS, COMPUTE_BUDGET_PROGRAM_ID,
                        INNER_DISCRIMINATORS, INSTRUCTION_DISCRIMINATORS,
                        MERGE_SPECS, PROGRAM_ID_BY_PROTOCOL,
                        PROTOCOL_BY_PROGRAM_ID, RAYDIUM_AMM_V4_PROGRAM_ID,
                        REQUIRES_CPI, ZERO_PUBKEY)
from ..schemas import EVENT_SCHEMA, METADATA_COL_NAMES, PAYLOAD_FIELDS

_DEC_KINDS = {"u64", "u128"}


def _decode_batches(iterator: Iterator, bot_wallet: str | None):
    """mapInPandas body: decode matched instruction rows into event rows."""
    import pandas as pd

    from ..operators.decode import (CPI_DECODERS, INSTRUCTION_DECODERS,
                                    decode_compute_budget,
                                    decode_cpi_with_f8)
    from ..operators.swap import scan_swap_data

    out_cols = [f.name for f in EVENT_SCHEMA.fields]
    inner_disc_by_protocol: dict[str, dict[str, str]] = {}
    for (proto, disc), kind in INNER_DISCRIMINATORS.items():
        inner_disc_by_protocol.setdefault(proto, {})[disc] = kind

    def _nn(v):  # nullable numeric: pandas NaN/NaT -> None
        return None if v is None or (not isinstance(v, (list, tuple))
                                     and pd.isna(v)) else v

    for pdf in iterator:
        rows_out = []
        for row in pdf.itertuples(index=False):
            inner_index = _nn(row.inner_index)
            base = {
                "signature": row.signature, "slot": row.slot,
                "transaction_index": row.transaction_index,
                "block_time": _nn(row.block_time),
                "block_time_ms": row.block_time_ms,
                "recv_us": row.recv_us, "program_id": row.program_id,
                "protocol": row.protocol, "event_type": row.event_type,
                "outer_index": row.outer_index,
                "inner_index": inner_index,
            }
            data = bytes(row.data) if row.data is not None else b""

            # ComputeBudget bypasses the protocol registry (D4,
            # core/event_parser.rs:352-360)
            if row.protocol == "Common":
                cu = decode_compute_budget(data)
                if cu is None:
                    continue
                base["event_type"], payload = cu
                rows_out.append({**base, **payload})
                continue

            decoder = INSTRUCTION_DECODERS.get(row.event_type)
            if decoder is None:
                continue
            disc_len = 1 if row.program_id == RAYDIUM_AMM_V4_PROGRAM_ID else 8
            accounts = ([] if row.resolved_accounts is None
                        else list(row.resolved_accounts))
            payload = decoder(data[disc_len:], accounts)
            if payload is None:
                continue

            inner_group = [
                (ix["program_id_index"],
                 [] if ix["account_indices"] is None
                 else list(ix["account_indices"]),
                 bytes(ix["data"]) if ix["data"] is not None else b"")
                for ix in ([] if row.inner_group is None
                           else row.inner_group)
            ]
            tx_accounts = ([] if row.accounts_padded is None
                           else list(row.accounts_padded))

            # J1: first inner instruction with a matching 16-byte CPI
            # discriminator for this protocol (event_parser.rs:392-439)
            cpi_kind, cpi_payload = None, None
            discs = inner_disc_by_protocol.get(row.protocol, {})
            for _, _, inner_data in inner_group:
                if len(inner_data) < 16:
                    continue
                kind = discs.get(inner_data[:16].hex())
                if kind is None:
                    continue
                decoded = decode_cpi_with_f8(kind, inner_data[16:],
                                             row.event_type)
                if decoded is not None:
                    cpi_kind, cpi_payload = kind, decoded
                    break

            # F9 (event_parser.rs:441-448)
            if row.event_type in REQUIRES_CPI and cpi_payload is None:
                continue

            # J2 swap-data look-ahead on the PRE-merge event (the reference
            # runs both scans concurrently, event_parser.rs:395-433)
            swap = None
            if row.has_inner_group:
                cur = -1 if inner_index is None else int(inner_index)
                swap = scan_swap_data(row.event_type, payload, inner_group,
                                      cur, tx_accounts)

            # J1 merge: overwrite listed fields (merger_event.rs)
            spec = MERGE_SPECS.get(row.event_type)
            if cpi_payload is not None and spec and spec[0] == cpi_kind:
                for fld in spec[1]:
                    if fld in cpi_payload:
                        payload[fld] = cpi_payload[fld]

            if swap is not None:
                base["swap_from_mint"] = swap["from_mint"]
                base["swap_to_mint"] = swap["to_mint"]
                base["swap_from_amount"] = swap["from_amount"]
                base["swap_to_amount"] = swap["to_amount"]
                base["swap_description"] = swap["description"]
            rows_out.append({**base, **payload})

        # Column-wise assembly with explicit None fill: the output schema
        # is ~380 columns but each event sets ~30, so building per-row
        # then normalizing per-cell would do tens of millions of no-op
        # operations per batch. object dtype keeps int64 exact.
        from decimal import Decimal
        dec_cols = {n for n, k in PAYLOAD_FIELDS.items() if k in _DEC_KINDS}
        dec_cols |= {"swap_from_amount", "swap_to_amount"}
        n = len(rows_out)
        cols: dict[str, list] = {c: [None] * n for c in out_cols}
        for i, rowdict in enumerate(rows_out):
            for k, v in rowdict.items():
                if v is not None:
                    cols[k][i] = (Decimal(v) if k in dec_cols
                                  else list(v) if isinstance(v, tuple)
                                  else v)
        yield pd.DataFrame(
            {c: pd.Series(cols[c], dtype=object) for c in out_cols},
            columns=out_cols)


def build_events(raw_tx: DataFrame, protocols: tuple[str, ...] = ALL_PROTOCOLS,
                 bot_wallet: str | None = None) -> DataFrame:
    """Raw transactions (FIXTURES.md §1 schema) -> enriched event table."""
    return enrich_events(build_events_core(raw_tx, protocols), bot_wallet)


def build_events_core(raw_tx: DataFrame,
                      protocols: tuple[str, ...] = ALL_PROTOCOLS) -> DataFrame:
    """Pipeline through decode+merge, WITHOUT the J3/J4/P11 enrichment —
    works on both batch and streaming DataFrames (the enrichment window
    runs per micro-batch in streaming/sink.py)."""
    program_ids = [PROGRAM_ID_BY_PROTOCOL[p] for p in protocols]
    relevant = program_ids + [COMPUTE_BUDGET_PROGRAM_ID]

    # --- F6 + P1 + F2 (JVM) ---------------------------------------------
    tx = (
        raw_tx
        .filter(~F.col("is_vote"))  # grpc/subscription.rs:121
        .withColumn("accounts", F.concat(
            F.coalesce(F.col("static_account_keys"), F.array()),
            F.coalesce(F.col("loaded_writable_addresses"), F.array()),
            F.coalesce(F.col("loaded_readonly_addresses"), F.array())))
        # F2 prefilter before any explode (event_parser.rs:222-225)
        .filter(F.arrays_overlap(
            F.col("accounts"), F.array(*[F.lit(p) for p in relevant])))
    )

    # P2 padding: extend accounts with default pubkeys up to the max index
    # referenced by any outer instruction (event_parser.rs:233-237; the
    # reference pads progressively per instruction — global padding
    # resolves identically for every in-range index, see docstring).
    max_idx = F.greatest(
        F.lit(-1),
        F.array_max(F.flatten(F.transform(
            F.col("instructions"),
            lambda ix: F.coalesce(ix["account_indices"],
                                  F.array(F.lit(-1)))))),
    )
    pad_n = F.greatest(F.lit(0), max_idx + 1 - F.size(F.col("accounts")))
    tx = tx.withColumn(
        "accounts_padded",
        F.when(pad_n > 0, F.concat(
            F.col("accounts"),
            F.transform(F.sequence(F.lit(1), pad_n),
                        lambda _: F.lit(ZERO_PUBKEY))))
        .otherwise(F.col("accounts")))

    # --- E1/E2: outer + inner instruction rows (JVM) --------------------
    common_cols = ["slot", "transaction_index", "block_time", "signature",
                   "recv_us", "accounts_padded", "inner_instructions"]

    outer = (
        tx.select(*common_cols,
                  F.posexplode("instructions").alias("outer_index", "ix"))
        .withColumn("inner_index", F.lit(None).cast("long"))
        .withColumn("outer_index", F.col("outer_index").cast("long"))
    )

    inner = (
        tx.select(*common_cols,
                  F.explode("inner_instructions").alias("grp"))
        .select(*common_cols,
                F.col("grp.index").cast("long").alias("outer_index"),
                F.posexplode("grp.instructions").alias("inner_index", "ix"))
        .withColumn("inner_index", F.col("inner_index").cast("long"))
        .select(*common_cols, "outer_index", "ix", "inner_index")
    )

    rows = outer.unionByName(inner)

    # Attach this outer index's inner group (E2; used for J1 CPI scan and
    # J2 look-ahead). Intra-row filter — no join, no shuffle.
    rows = rows.withColumn(
        "inner_group_arr",
        F.filter(F.coalesce(F.col("inner_instructions"), F.array()),
                 lambda g: g["index"] == F.col("outer_index")))
    rows = (
        rows.withColumn(
            "inner_group",
            F.when(F.size("inner_group_arr") > 0,
                   F.col("inner_group_arr")[0]["instructions"]))
        .withColumn("has_inner_group", F.size("inner_group_arr") > 0)
        .drop("inner_group_arr", "inner_instructions")
    )

    # --- F1 + D1 dispatch (JVM) -----------------------------------------
    rows = rows.withColumn(
        "program_id",
        F.element_at(F.col("accounts_padded"),
                     F.col("ix.program_id_index") + 1))
    rows = rows.filter(F.col("program_id").isin(relevant))

    disc_len = F.when(F.col("program_id") == RAYDIUM_AMM_V4_PROGRAM_ID,
                      1).otherwise(8)
    rows = rows.withColumn("data", F.col("ix.data"))
    rows = rows.filter(
        (F.col("program_id") == COMPUTE_BUDGET_PROGRAM_ID)
        | (F.length(F.col("data")) >= disc_len))  # F7 disc-length guard

    proto_entries = []
    for pid, proto in PROTOCOL_BY_PROGRAM_ID.items():
        proto_entries += [F.lit(pid), F.lit(proto)]
    proto_map = F.create_map(*proto_entries)
    rows = rows.withColumn(
        "protocol",
        F.when(F.col("program_id") == COMPUTE_BUDGET_PROGRAM_ID, "Common")
        .otherwise(proto_map[F.col("program_id")]))

    disc_entries = []
    for (proto, disc), etype in INSTRUCTION_DISCRIMINATORS.items():
        disc_entries += [F.lit(proto + ":" + disc), F.lit(etype)]
    disc_map = F.create_map(*disc_entries)
    rows = rows.withColumn(
        "disc_hex", F.lower(F.hex(F.expr(
            "substring(data, 1, case when program_id = '"
            + RAYDIUM_AMM_V4_PROGRAM_ID + "' then 1 else 8 end)"))))
    rows = rows.withColumn(
        "event_type",
        disc_map[F.concat(F.col("protocol"), F.lit(":"), F.col("disc_hex"))])

    # Only matched rows reach Python (D1 result or ComputeBudget)
    rows = rows.filter(
        F.col("event_type").isNotNull() | (F.col("protocol") == "Common"))

    # P3: resolve instruction account indices -> pubkeys; out-of-range
    # indices are dropped (filter_map semantics, event_parser.rs:373-377)
    rows = rows.withColumn(
        "resolved_accounts",
        F.filter(
            F.transform(
                F.coalesce(F.col("ix.account_indices"), F.array()),
                lambda i: F.element_at(F.col("accounts_padded"), i + 1)),
            lambda x: x.isNotNull()))

    # P9 block_time_ms (event_parser.rs:336-337; 0 when block_time null)
    rows = rows.withColumn(
        "block_time_ms",
        F.coalesce((F.unix_micros(F.col("block_time")) / 1000)
                   .cast("long"), F.lit(0)))

    decode_input = rows.select(
        "signature", "slot", "transaction_index", "block_time",
        "block_time_ms", "recv_us", "program_id", "protocol", "event_type",
        "outer_index", "inner_index", "data", "resolved_accounts",
        "inner_group", "has_inner_group",
        # tx-level accounts are only consumed by the J2 swap scan, which
        # only runs when an inner group exists — don't ship them otherwise
        F.when(F.col("has_inner_group"), F.col("accounts_padded"))
        .alias("accounts_padded"))

    # --- P5/P6 + J1 + J2 decode stage (Arrow-batched Python) ------------
    return decode_input.mapInPandas(
        lambda it: _decode_batches(it, None), schema=EVENT_SCHEMA)


def enrich_events(events: DataFrame, bot_wallet: str | None) -> DataFrame:
    """J3 dev-address flags (window over signature), J4 bot flag, P11 swap
    amount fill (core/event_parser.rs:671-736).

    The reference's GlobalState map is keyed by signature and only ever
    read by events of the same transaction — a window over `signature`
    expresses it without keyed state (SURVEY §2.6 J3). Scale note: this is
    the pipeline's only wide operation; it partitions by signature, which
    is near-perfectly uniform (64-byte hashes), so no skew at any scale.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("signature")

    pf_create = F.col("event_type").isin("PumpFunCreateToken",
                                         "PumpFunCreateV2Token")
    dev_users = F.collect_set(F.when(pf_create, F.col("user"))).over(w)
    dev_creators = F.collect_set(
        F.when(pf_create & (F.col("creator") != ZERO_PUBKEY)
               & (F.col("creator") != F.col("user")), F.col("creator"))
    ).over(w)
    bonk_create = F.col("event_type").isin(
        "BonkInitialize", "BonkInitializeV2", "BonkInitializeWithToken2022")
    bonk_devs = F.collect_set(F.when(bonk_create, F.col("creator"))).over(w)

    is_pf_trade = F.col("event_type").isin("PumpFunBuy", "PumpFunSell")
    is_bonk_trade = F.col("event_type").isin(
        "BonkBuyExactIn", "BonkBuyExactOut", "BonkSellExactIn",
        "BonkSellExactOut")

    dev_pool = F.array_union(dev_users, dev_creators)

    def _contains(arr, col):  # NULL member -> false, as in the reference
        return F.coalesce(F.array_contains(arr, col), F.lit(False))

    is_dev = (
        F.when(is_pf_trade,
               _contains(dev_pool, F.col("user"))
               | _contains(dev_pool, F.col("creator")))
        .when(is_bonk_trade, _contains(bonk_devs, F.col("payer")))
        .otherwise(F.lit(None).cast("boolean")))

    bot = F.lit(bot_wallet) if bot_wallet else F.lit(None).cast("string")
    is_bot = (
        F.when(is_pf_trade, F.col("user") == bot)
        .when(is_bonk_trade, F.col("payer") == bot)
        .otherwise(F.lit(None).cast("boolean")))

    out = (events
           .withColumn("is_dev_create_token_trade", is_dev)
           .withColumn("is_bot", F.coalesce(is_bot, F.when(
               is_pf_trade | is_bonk_trade, F.lit(False)))))

    # P11 swap amount fill (post-merge values, event_parser.rs:690-722)
    has_swap = F.col("swap_from_mint").isNotNull()
    dec = "decimal(20,0)"
    out = (
        out.withColumn(
            "swap_from_amount",
            F.when(has_swap & is_pf_trade,
                   F.when(F.col("is_buy"), F.col("sol_amount"))
                   .otherwise(F.col("token_amount")).cast(dec))
            .when(has_swap & (F.col("event_type") == "PumpSwapBuy"),
                  F.col("user_quote_amount_in").cast(dec))
            .when(has_swap & (F.col("event_type") == "PumpSwapSell"),
                  F.col("base_amount_in").cast(dec))
            .otherwise(F.col("swap_from_amount")))
        .withColumn(
            "swap_to_amount",
            F.when(has_swap & is_pf_trade,
                   F.when(F.col("is_buy"), F.col("token_amount"))
                   .otherwise(F.col("sol_amount")).cast(dec))
            .when(has_swap & (F.col("event_type") == "PumpSwapBuy"),
                  F.col("base_amount_out").cast(dec))
            .when(has_swap & (F.col("event_type") == "PumpSwapSell"),
                  F.col("user_quote_amount_out").cast(dec))
            .otherwise(F.col("swap_to_amount")))
    )
    return out


def load_raw_transactions(spark, path: str) -> DataFrame:
    from ..schemas import RAW_TRANSACTION_SCHEMA
    return spark.read.schema(RAW_TRANSACTION_SCHEMA).parquet(path)
