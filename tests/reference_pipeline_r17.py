"""ARCHIVED reference composition of the dex DAG's JVM half — the
pre-r18 Column-API form of build_decode_input / enrich_events /
_create_pools, copied verbatim from commit d90d595 (the last tree
before the parsed-SQL rewrite, r18 guide §7.3).

Purpose (VERDICT r18 item 8): the live pipeline now builds these
expressions from f-string SQL fragments, some textually repeated in
the composed string (the J2 `is2`/`h` pieces appear 8x inside the
byte-reassembly). tests/test_fragment_drift.py re-runs this archived
composition against the live one on the fixture corpus plus
structurally corrupted mutants and asserts row parity, so a semantic
edit to one copy of a duplicated fragment fails loudly instead of
hiding in branches the golden fixture does not exercise.

DO NOT "optimize" or edit this module except to intentionally move the
semantic reference point — it is the drift anchor, not product code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solana_event_stream_spark.registry import (
    COMPUTE_BUDGET_PROGRAM_ID, INNER_DISCRIMINATORS,
    INSTRUCTION_DISCRIMINATORS, PROGRAM_ID_BY_PROTOCOL,
    PROTOCOL_BY_PROGRAM_ID, RAYDIUM_AMM_V4_PROGRAM_ID, SYSTEM_PROGRAMS,
    ZERO_PUBKEY)

def build_decode_input(raw_tx: DataFrame,
                       protocols: tuple[str, ...] | None = None
                       ) -> DataFrame:
    """The JVM half of the pipeline: filters, account assembly, explodes,
    dispatch, and the J1/J2 pre-scans — everything up to (excluding) the
    Python decode stage. ``protocols=None`` means every protocol
    registered at CALL time (so plug-ins registered after import are
    dispatched)."""
    if protocols is None:
        protocols = tuple(PROGRAM_ID_BY_PROTOCOL)
    elif not protocols:
        # An empty tuple used to coerce (falsily) to ALL protocols; that
        # silent flip now fails loudly — a ComputeBudget-only stream is
        # never what a caller meant (ADVICE r9).
        raise ValueError("protocols=() selects no protocols; pass None "
                         "for every registered protocol")
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

    # --- E1/E2: outer + inner instruction rows, ONE source scan ---------
    # A union of two explodes over `tx` compiles to TWO FileScans of the
    # archive per (micro-)batch — 2x read amplification at 100 TB and
    # double numInputRows per trigger. Instead, build one in-row array of
    # (outer_index, inner_index, ix) structs (outer positions + flattened
    # inner groups — both element types are INSTRUCTION_TYPE, schemas.py)
    # and explode ONCE: same rows, half the scans, no Union.
    common_cols = ["slot", "transaction_index", "block_time", "signature",
                   "recv_us", "accounts_padded", "inner_instructions"]

    outer_structs = F.transform(
        F.coalesce(F.col("instructions"), F.array()),
        lambda ix, i: F.struct(
            i.cast("long").alias("outer_index"),
            F.lit(None).cast("long").alias("inner_index"),
            ix.alias("ix")))
    inner_structs = F.flatten(F.transform(
        F.coalesce(F.col("inner_instructions"), F.array()),
        # coalesce INSIDE the lambda: a group with a NULL instructions
        # array otherwise yields a NULL element, flatten propagates it
        # to a NULL array, and concat+explode would then drop the whole
        # transaction INCLUDING its outer rows (the old union form only
        # lost that group's inner rows)
        lambda grp: F.transform(
            F.coalesce(grp["instructions"], F.array()),
            lambda ix, j: F.struct(
                grp["index"].cast("long").alias("outer_index"),
                j.cast("long").alias("inner_index"),
                ix.alias("ix")))))

    rows = (
        tx.select(*common_cols,
                  F.explode(F.concat(outer_structs, inner_structs))
                  .alias("r"))
        .select(*common_cols,
                F.col("r.outer_index").alias("outer_index"),
                F.col("r.ix").alias("ix"),
                F.col("r.inner_index").alias("inner_index"))
    )

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
    # try_element_at, NOT element_at: under ANSI mode (Spark 4 default)
    # element_at RAISES on an out-of-range index, so one corrupt
    # transaction with program_id_index >= len(accounts) would kill the
    # whole query; the reference's accounts.get() returns None and the
    # row is dropped (event_parser.rs:373-377 filter_map semantics).
    # Found by the J1/J2 candidate property test (round 8).
    rows = rows.withColumn(
        "program_id",
        F.try_element_at(F.col("accounts_padded"),
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
                lambda i: F.try_element_at(F.col("accounts_padded"),
                                           i + 1)),
            lambda x: x.isNotNull()))

    # P9 block_time_ms (event_parser.rs:336-337; 0 when block_time null)
    rows = rows.withColumn(
        "block_time_ms",
        F.coalesce((F.unix_micros(F.col("block_time")) / 1000)
                   .cast("long"), F.lit(0)))

    # --- J1/J2 JVM pre-scans --------------------------------------------
    # Both scans over the inner-instruction group are positional/shape
    # predicates, so they run as Catalyst array expressions here; only the
    # few matching candidates cross the Arrow boundary — the raw inner
    # group (every CPI payload of the transaction) never does. At 100 TB
    # this is the difference between shipping ~100s of bytes vs ~10s of KB
    # per instruction row into Python.
    ig = F.coalesce(F.col("inner_group"), F.array())
    acc = F.col("accounts_padded")

    # J1 (JVM half): inner instructions carrying a 16-byte discriminator
    # registered for this protocol, in group order (event_parser.rs:
    # 392-439). Python judges decode success (first successful wins).
    cpi_entries = []
    for (proto, disc), kind in INNER_DISCRIMINATORS.items():
        cpi_entries += [F.lit(proto + ":" + disc), F.lit(kind)]
    cpi_map = F.create_map(*cpi_entries)

    def _cpi_kind(g):
        return cpi_map[F.concat(
            F.col("protocol"), F.lit(":"),
            F.lower(F.hex(F.substring(g["data"], 1, 16))))]

    rows = rows.withColumn(
        "cpi_candidates",
        F.transform(
            F.filter(ig, lambda g:
                     (F.coalesce(F.length(g["data"]), F.lit(0)) >= 16)
                     & _cpi_kind(g).isNotNull()),
            lambda g: F.struct(
                _cpi_kind(g).alias("kind"),
                F.substring(g["data"], F.lit(17), F.length(g["data"]))
                .alias("body"))))

    # J2 (JVM half): transfer-shaped inner instructions after the event's
    # position, truncated at the first non-system-program instruction
    # (types.rs:461-489). The break conditions (program out of bounds /
    # not an SPL-or-system program) become a first-break position.
    indexed = F.transform(ig, lambda g, i: F.struct(i.alias("pos"),
                                                    g.alias("g")))
    sys_progs = list(SYSTEM_PROGRAMS)

    def _prog(s):
        # try_element_at: whole-stage codegen's subexpression elimination
        # can hoist this lookup PAST the bounds guard in the same
        # predicate (observed: INVALID_ARRAY_INDEX_IN_ELEMENT_AT from
        # the first-break filter), so the lookup itself must be total
        return F.try_element_at(acc, s["g"]["program_id_index"] + 1)

    # The reference scan starts at current_index + 1 (types.rs:461
    # `.skip((current_index + 1) as usize)`), so instructions at or before
    # the event's own position — including the event's own (non-system)
    # protocol instruction — must not register as breaks.
    first_break = F.coalesce(
        F.array_min(F.transform(
            F.filter(indexed, lambda s:
                     (s["pos"] > F.coalesce(F.col("inner_index"),
                                            F.lit(-1)))
                     & ((s["g"]["program_id_index"] >= F.size(acc))
                        | ~_prog(s).isin(sys_progs))),
            lambda s: s["pos"])),
        F.size(ig))
    rows = rows.withColumn("first_break", first_break)

    def _d(s):
        return s["g"]["data"]

    def _ai(s):
        return F.coalesce(s["g"]["account_indices"], F.array())

    def _tag_is(s, t):
        return F.substring(_d(s), 1, 1) == F.lit(bytes([t]))

    def _dlen(s):
        return F.coalesce(F.length(_d(s)), F.lit(0))

    def _is12(s):
        return _tag_is(s, 12) & (F.size(_ai(s)) >= 4) & (_dlen(s) >= 9)

    def _is3(s):
        return _tag_is(s, 3) & (F.size(_ai(s)) >= 3) & (_dlen(s) >= 9)

    def _is2(s):
        return _tag_is(s, 2) & (F.size(_ai(s)) >= 2) & (_dlen(s) >= 12)

    def _s_i(s):
        return F.try_element_at(_ai(s), F.lit(1))

    def _d_i(s):
        return F.when(_is12(s), F.try_element_at(_ai(s), F.lit(3))) \
                .otherwise(F.try_element_at(_ai(s), F.lit(2)))

    def _amount(s):
        # LE u64: hex the 8-byte slice, reassemble the byte pairs
        # MSB-first, conv (unsigned-64 exact). NB: F.reverse on BinaryType
        # goes through a string cast and mangles bytes — don't use it.
        off = F.when(_is2(s), F.lit(5)).otherwise(F.lit(2))
        h = F.hex(F.substring(_d(s), off, F.lit(8)))
        be = F.concat(*[F.substring(h, 1 + 2 * i, 2)
                        for i in range(7, -1, -1)])
        return F.conv(be, 16, 10).cast("decimal(20,0)")

    candidates = F.transform(
        F.filter(indexed, lambda s:
                 (s["pos"] > F.coalesce(F.col("inner_index"), F.lit(-1)))
                 & (s["pos"] < F.col("first_break"))
                 & (_dlen(s) >= 8)
                 & (_is12(s) | _is3(s) | _is2(s))
                 & (_s_i(s) < F.size(acc)) & (_d_i(s) < F.size(acc))),
        lambda s: F.struct(
            F.try_element_at(acc, _s_i(s) + 1).alias("source"),
            F.try_element_at(acc, _d_i(s) + 1).alias("dest"),
            _amount(s).alias("amount")))
    rows = rows.withColumn(
        "transfer_candidates",
        F.when(F.col("has_inner_group"), candidates))

    return rows.select(
        "signature", "slot", "transaction_index", "block_time",
        "block_time_ms", "recv_us", "program_id", "protocol", "event_type",
        "outer_index", "inner_index", "data", "resolved_accounts",
        "has_inner_group", "cpi_candidates", "transfer_candidates")


def enrich_events(events: DataFrame, bot_wallet: str | None,
                  creates: DataFrame | None = None) -> DataFrame:
    """J3 dev-address flags, J4 bot flag, P11 swap amount fill
    (core/event_parser.rs:671-736).

    The reference's GlobalState map is keyed by signature and only ever
    read by events of the same transaction (SURVEY §2.6 J3). Instead of
    a window over `signature` — which would shuffle the FULL ~375-wide
    event rows — the per-signature dev pools are aggregated from ONLY
    the create/initialize events (a minuscule fraction of the stream;
    the aggregate shuffle carries 4 narrow columns) and joined back.
    AQE sizes the aggregate at runtime: when the create set fits the
    broadcast threshold (the overwhelmingly common case, per micro-batch
    or per partition range) the wide side is never exchanged at all;
    with billions of creates it degrades to exactly the shuffle the
    window form always paid. Signature is a 64-byte uniform hash, so
    the fallback shuffle has no skew at any scale.

    ``creates``: pre-aggregated dev pools (from :func:`_create_pools`
    over a slim creates-only decode — see build_events). When None
    (streaming micro-batches, standalone use) the pools derive from
    ``events`` itself; re-evaluating the in-memory batch for the tiny
    filtered aggregate is cheap there.
    """
    if creates is None:
        creates = _create_pools(events)
    events = events.join(creates, "signature", "left")
    dev_users = F.col("_dev_users")
    dev_creators = F.col("_dev_creators")
    bonk_devs = F.col("_bonk_devs")

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
    return out.drop("_dev_users", "_dev_creators", "_bonk_devs")


def _create_pools(events: DataFrame) -> DataFrame:
    """Per-signature J3 dev pools from decoded create/initialize events.

    Accepts either the full event stream (filters to the five create
    types itself) or an already-creates-only frame (the filter is then a
    no-op). collect_set combines partially map-side, so the shuffle
    carries only signatures that actually contain a create.
    """
    pf_create = F.col("event_type").isin("PumpFunCreateToken",
                                         "PumpFunCreateV2Token")
    bonk_create = F.col("event_type").isin(
        "BonkInitialize", "BonkInitializeV2", "BonkInitializeWithToken2022")
    return (
        events.filter(pf_create | bonk_create)
        .select("signature", "event_type", "user", "creator")
        .groupBy("signature")
        .agg(F.collect_set(F.when(pf_create, F.col("user")))
             .alias("_dev_users"),
             F.collect_set(
                 F.when(pf_create & (F.col("creator") != ZERO_PUBKEY)
                        & (F.col("creator") != F.col("user")),
                        F.col("creator"))).alias("_dev_creators"),
             F.collect_set(F.when(bonk_create, F.col("creator")))
             .alias("_bonk_devs")))
