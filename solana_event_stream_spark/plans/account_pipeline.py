"""Account-update pipeline (SURVEY §3.3): raw account snapshots ->
typed account-state events.

Routing (core/account_event_parser.rs:59-143):
1. owner is a requested protocol program AND data >= 8 bytes -> dispatch
   on the 8-byte account discriminator (D3);
2. else try Nonce (initialized only);
3. else Token path: SPL Mint (exact 82B), Token-2022 mint (ext TLV with
   AccountType::Mint), token-account amount by owner program — the final
   TokenAccount form always emits (amount NULL when undecodable), as the
   reference does.

Dispatch runs JVM-side (owner/disc literal maps); only routed rows enter
the Arrow decode stage. No shuffle anywhere.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DecimalType,
                               IntegerType, LongType, StringType,
                               StructField, StructType)

from ..operators.account_decode import ACCOUNT_DISCRIMINATORS
from ..registry import PROGRAM_ID_BY_PROTOCOL

_DEC20 = DecimalType(20, 0)
_DEC38 = DecimalType(38, 0)

# raydium_clmm/types.rs:62-75
REWARD_INFO_TYPE = StructType([
    StructField("reward_state", IntegerType()),
    StructField("open_time", _DEC20),
    StructField("end_time", _DEC20),
    StructField("last_update_time", _DEC20),
    StructField("emissions_per_second_x64", _DEC38),
    StructField("reward_total_emissioned", _DEC20),
    StructField("reward_claimed", _DEC20),
    StructField("token_mint", StringType()),
    StructField("token_vault", StringType()),
    StructField("authority", StringType()),
    StructField("reward_growth_global_x64", _DEC38),
])

# raydium_clmm/types.rs:149-160
TICK_STATE_TYPE = StructType([
    StructField("tick", IntegerType()),
    StructField("liquidity_net", _DEC38),
    StructField("liquidity_gross", _DEC38),
    StructField("fee_growth_outside0_x64", _DEC38),
    StructField("fee_growth_outside1_x64", _DEC38),
    StructField("reward_growths_outside_x64", ArrayType(_DEC38)),
])

ACCOUNT_EVENT_SCHEMA = StructType([
    StructField("slot", LongType()),
    StructField("signature", StringType()),
    StructField("protocol", StringType()),
    StructField("event_type", StringType()),
    StructField("program_id", StringType()),
    StructField("recv_us", LongType()),
    StructField("pubkey", StringType()),
    StructField("executable", BooleanType()),
    StructField("lamports", LongType()),
    StructField("owner", StringType()),
    StructField("rent_epoch", LongType()),
    # PumpFun bonding curve (pumpfun/types.rs:14-24)
    StructField("virtual_token_reserves", _DEC20),
    StructField("virtual_sol_reserves", _DEC20),
    StructField("real_token_reserves", _DEC20),
    StructField("real_sol_reserves", _DEC20),
    StructField("token_total_supply", _DEC20),
    StructField("complete", BooleanType()),
    StructField("creator", StringType()),
    StructField("is_mayhem_mode", BooleanType()),
    # PumpFun global (pumpfun/types.rs:59-80)
    StructField("initialized", BooleanType()),
    StructField("authority", StringType()),
    StructField("fee_recipient", StringType()),
    StructField("initial_virtual_token_reserves", _DEC20),
    StructField("initial_virtual_sol_reserves", _DEC20),
    StructField("initial_real_token_reserves", _DEC20),
    StructField("fee_basis_points", _DEC20),
    StructField("withdraw_authority", StringType()),
    StructField("enable_migrate", BooleanType()),
    StructField("pool_migration_fee", _DEC20),
    StructField("creator_fee_basis_points", _DEC20),
    StructField("fee_recipients", ArrayType(StringType())),
    StructField("set_creator_authority", StringType()),
    StructField("admin_set_creator_authority", StringType()),
    StructField("create_v2_enabled", BooleanType()),
    StructField("whitelist_pda", StringType()),
    StructField("reserved_fee_recipient", StringType()),
    StructField("mayhem_mode_enabled", BooleanType()),
    # PumpSwap global config + pool (pumpswap/types.rs:14-84)
    StructField("admin", StringType()),
    StructField("lp_fee_basis_points", _DEC20),
    StructField("protocol_fee_basis_points", _DEC20),
    StructField("disable_flags", IntegerType()),
    StructField("protocol_fee_recipients", ArrayType(StringType())),
    StructField("coin_creator_fee_basis_points", _DEC20),
    StructField("admin_set_coin_creator_authority", StringType()),
    StructField("pool_bump", IntegerType()),
    StructField("index", IntegerType()),
    StructField("base_mint", StringType()),
    StructField("quote_mint", StringType()),
    StructField("lp_mint", StringType()),
    StructField("pool_base_token_account", StringType()),
    StructField("pool_quote_token_account", StringType()),
    StructField("lp_supply", _DEC20),
    StructField("coin_creator", StringType()),
    # Bonk pool state / global config / platform config
    # (bonk/types.rs:89-224)
    StructField("epoch", _DEC20),
    StructField("auth_bump", IntegerType()),
    StructField("status", IntegerType()),
    StructField("base_decimals", IntegerType()),
    StructField("quote_decimals", IntegerType()),
    StructField("migrate_type", IntegerType()),
    StructField("total_base_sell", _DEC20),
    StructField("virtual_base", _DEC20),
    StructField("virtual_quote", _DEC20),
    StructField("real_base", _DEC20),
    StructField("real_quote", _DEC20),
    StructField("total_quote_fund_raising", _DEC20),
    StructField("quote_protocol_fee", _DEC20),
    StructField("platform_fee", _DEC20),
    StructField("migrate_fee", _DEC20),
    StructField("vesting_total_locked_amount", _DEC20),
    StructField("vesting_cliff_period", _DEC20),
    StructField("vesting_unlock_period", _DEC20),
    StructField("vesting_start_time", _DEC20),
    StructField("vesting_allocated_share_amount", _DEC20),
    StructField("global_config", StringType()),
    StructField("platform_config", StringType()),
    StructField("base_vault", StringType()),
    StructField("quote_vault", StringType()),
    StructField("curve_type_raw", IntegerType()),
    StructField("trade_fee_rate", _DEC20),
    StructField("max_share_fee_rate", _DEC20),
    StructField("min_base_supply", _DEC20),
    StructField("max_lock_rate", _DEC20),
    StructField("min_base_sell_rate", _DEC20),
    StructField("min_base_migrate_rate", _DEC20),
    StructField("min_quote_fund_raising", _DEC20),
    StructField("protocol_fee_owner", StringType()),
    StructField("migrate_fee_owner", StringType()),
    StructField("migrate_to_amm_wallet", StringType()),
    StructField("migrate_to_cpswap_wallet", StringType()),
    StructField("platform_fee_wallet", StringType()),
    StructField("platform_nft_wallet", StringType()),
    StructField("platform_scale", _DEC20),
    StructField("creator_scale", _DEC20),
    StructField("burn_scale", _DEC20),
    StructField("fee_rate", _DEC20),
    StructField("platform_name", StringType()),
    StructField("platform_web", StringType()),
    StructField("platform_img", StringType()),
    # Raydium CPMM amm config + pool state (raydium_cpmm/types.rs:17-87)
    StructField("bump", IntegerType()),
    StructField("disable_create_pool", BooleanType()),
    StructField("protocol_fee_rate", _DEC20),
    StructField("fund_fee_rate", _DEC20),
    StructField("create_pool_fee", _DEC20),
    StructField("protocol_owner", StringType()),
    StructField("fund_owner", StringType()),
    StructField("amm_config", StringType()),
    StructField("pool_creator", StringType()),
    StructField("token0_vault", StringType()),
    StructField("token1_vault", StringType()),
    StructField("token0_mint", StringType()),
    StructField("token1_mint", StringType()),
    StructField("token0_program", StringType()),
    StructField("token1_program", StringType()),
    StructField("observation_key", StringType()),
    StructField("lp_mint_decimals", IntegerType()),
    StructField("mint0_decimals", IntegerType()),
    StructField("mint1_decimals", IntegerType()),
    StructField("protocol_fees_token0", _DEC20),
    StructField("protocol_fees_token1", _DEC20),
    StructField("fund_fees_token0", _DEC20),
    StructField("fund_fees_token1", _DEC20),
    StructField("open_time", _DEC20),
    StructField("recent_epoch", _DEC20),
    # Raydium CLMM amm config / pool state / tick array
    # (raydium_clmm/types.rs:18-198)
    StructField("config_owner", StringType()),
    StructField("tick_spacing", IntegerType()),
    StructField("token_mint0", StringType()),
    StructField("token_mint1", StringType()),
    StructField("token_vault0", StringType()),
    StructField("token_vault1", StringType()),
    StructField("liquidity", _DEC38),
    StructField("sqrt_price_x64", _DEC38),
    StructField("tick_current", IntegerType()),
    StructField("fee_growth_global0_x64", _DEC38),
    StructField("fee_growth_global1_x64", _DEC38),
    StructField("swap_in_amount_token0", _DEC38),
    StructField("swap_out_amount_token1", _DEC38),
    StructField("swap_in_amount_token1", _DEC38),
    StructField("swap_out_amount_token0", _DEC38),
    StructField("reward_infos", ArrayType(REWARD_INFO_TYPE)),
    StructField("tick_array_bitmap", ArrayType(_DEC20)),
    StructField("total_fees_token0", _DEC20),
    StructField("total_fees_claimed_token0", _DEC20),
    StructField("total_fees_token1", _DEC20),
    StructField("total_fees_claimed_token1", _DEC20),
    StructField("pool_id", StringType()),
    StructField("start_tick_index", IntegerType()),
    StructField("ticks", ArrayType(TICK_STATE_TYPE)),
    StructField("initialized_tick_count", IntegerType()),
    # Token/Mint/Nonce (account_event_parser.rs:17-54)
    StructField("supply", _DEC20),
    StructField("decimals", IntegerType()),
    StructField("amount", _DEC20),
    StructField("token_owner", StringType()),
    StructField("nonce", StringType()),
    StructField("nonce_authority", StringType()),
])


def account_event_schema() -> StructType:
    """The static base schema plus any plug-in account payload fields
    (operators/account_decode.ACCOUNT_PLUGIN_FIELDS) — the account-side
    mirror of schemas.event_schema(). Plan-build-time resolution: a
    plan built after a plug-in registers carries its columns; existing
    plans are unaffected."""
    from ..operators.account_decode import ACCOUNT_PLUGIN_FIELDS
    from ..schemas import _KIND_TO_SPARK

    if not ACCOUNT_PLUGIN_FIELDS:
        return ACCOUNT_EVENT_SCHEMA
    return StructType(
        list(ACCOUNT_EVENT_SCHEMA.fields)
        + [StructField(name, _KIND_TO_SPARK[kind], True)
           for name, kind in sorted(ACCOUNT_PLUGIN_FIELDS.items())])


# Output columns copied verbatim from an input column (every input row
# produces exactly one output row, so the input arrays pass through the
# Arrow boundary unchanged — zero per-row Python for these).
_ACCT_PASSTHROUGH = {
    "slot": "slot", "signature": "signature", "program_id": "owner",
    "recv_us": "recv_us", "pubkey": "pubkey", "executable": "executable",
    "lamports": "lamports", "owner": "owner", "rent_epoch": "rent_epoch",
}


def _make_account_decode(protocol_decoders: dict, spark_schema: StructType):
    """Build the mapInArrow body with the protocol decoder table and
    output schema captured in the CLOSURE at plan-build time — a fresh
    executor import would miss plug-in account decoders (they only
    mutate the driver's module; same reason plans/pipeline.py captures
    its decode tables). Builtin fallbacks (nonce/mint/token) still
    import by reference — they are installed on the workers."""

    def _decode_account_batches(iterator: Iterator):
        return _account_batches(iterator, protocol_decoders, spark_schema)

    return _decode_account_batches


def _account_batches(iterator: Iterator, protocol_decoders: dict,
                     spark_schema: StructType):
    """mapInArrow body (same columnar-boundary design as
    plans/pipeline.py:_decode_batches): base columns ride through as the
    original Arrow arrays, untouched payload columns are constant
    pa.nulls, and only the columns some account actually set materialize
    from Python lists (ints/Decimals — Arrow converts both to decimal128
    exactly, full u64/u128-within-38-digits range)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from ..operators.account_decode import (decode_nonce, decode_spl_mint,
                                            decode_token2022_mint,
                                            decode_token_amount)

    PROTOCOL_ACCOUNT_DECODERS = protocol_decoders
    out_schema = to_arrow_schema(spark_schema)

    for batch in iterator:
        names = batch.schema.names
        col = {nm: batch.column(i) for i, nm in enumerate(names)}
        data_l = col["data"].to_pylist()
        owner_l = col["owner"].to_pylist()
        aet_l = col["acct_event_type"].to_pylist()
        ap_l = col["acct_protocol"].to_pylist()

        n = batch.num_rows
        protocol_out: list = [None] * n
        event_type_out: list = [None] * n
        payloads: list = [None] * n
        for i in range(n):
            data = data_l[i] or b""
            # 1) protocol account (pre-routed JVM-side)
            aet = aet_l[i]
            if aet is not None:
                decoder = PROTOCOL_ACCOUNT_DECODERS.get(aet)
                if decoder is not None:
                    payload = decoder(data)
                    if payload is not None:
                        protocol_out[i] = ap_l[i]
                        event_type_out[i] = aet
                        payloads[i] = payload
                        continue
            # 2) nonce
            nonce = decode_nonce(data)
            if nonce is not None:
                protocol_out[i] = "Common"
                event_type_out[i] = "NonceAccount"
                payloads[i] = {"nonce": nonce["nonce"],
                               "nonce_authority": nonce["authority"]}
                continue
            # 3) token path
            mint = decode_spl_mint(data) or decode_token2022_mint(data)
            if mint is not None:
                protocol_out[i] = "Common"
                event_type_out[i] = "TokenAccount"
                payloads[i] = mint
                continue
            protocol_out[i] = "Common"
            event_type_out[i] = "TokenAccount"
            payloads[i] = {"amount": decode_token_amount(data, owner_l[i]),
                           "token_owner": owner_l[i]}

        touched: dict[str, list] = {}
        for j, payload in enumerate(payloads):
            for k, v in payload.items():
                if v is not None:
                    c = touched.get(k)
                    if c is None:
                        c = touched[k] = [None] * n
                    c[j] = v

        arrays = []
        for field in out_schema:
            nm = field.name
            if nm in _ACCT_PASSTHROUGH:
                arr = col[_ACCT_PASSTHROUGH[nm]]
                if arr.type != field.type:
                    arr = arr.cast(field.type)
            elif nm == "protocol":
                arr = pa.array(protocol_out, type=field.type)
            elif nm == "event_type":
                arr = pa.array(event_type_out, type=field.type)
            elif nm in touched:
                arr = pa.array(touched[nm], type=field.type)
            else:
                arr = pa.nulls(n, field.type)
            arrays.append(arr)
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def build_account_events(raw_accounts: DataFrame,
                         protocols: tuple[str, ...] | None = None
                         ) -> DataFrame:
    from ..operators.account_decode import PROTOCOL_ACCOUNT_DECODERS

    if protocols is None:
        protocols = tuple(PROGRAM_ID_BY_PROTOCOL)
    program_ids = {PROGRAM_ID_BY_PROTOCOL[p]: p for p in protocols}

    proto_entries = []
    for pid, proto in program_ids.items():
        proto_entries += [F.lit(pid), F.lit(proto)]
    proto_map = F.create_map(*proto_entries)

    disc_entries = []
    for (proto, disc), etype in ACCOUNT_DISCRIMINATORS.items():
        disc_entries += [F.lit(proto + ":" + disc), F.lit(etype)]
    disc_map = F.create_map(*disc_entries)

    routed = (
        raw_accounts
        .withColumn("acct_protocol", proto_map[F.col("owner")])
        .withColumn(
            "disc_hex",
            F.when((F.col("acct_protocol").isNotNull())
                   & (F.length("data") >= 8),
                   F.lower(F.hex(F.expr("substring(data, 1, 8)")))))
        .withColumn(
            "acct_event_type",
            disc_map[F.concat(F.col("acct_protocol"), F.lit(":"),
                              F.col("disc_hex"))])
    )
    decode_input = routed.select(
        "slot", "signature", "pubkey", "executable", "lamports", "owner",
        "rent_epoch", "data", "recv_us", "acct_protocol", "acct_event_type")
    schema = account_event_schema()
    return decode_input.mapInArrow(
        _make_account_decode(dict(PROTOCOL_ACCOUNT_DECODERS), schema),
        schema=schema)


def load_raw_accounts(spark, path: str) -> DataFrame:
    from ..schemas import RAW_ACCOUNT_SCHEMA
    return spark.read.schema(RAW_ACCOUNT_SCHEMA).parquet(path)
