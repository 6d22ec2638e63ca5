"""Schemas: raw input rows (FIXTURES.md) and the decoded event table.

The event table is a FLAT wide sparse schema (SURVEY §1.1: flat beats
nested for columnar pruning): common metadata columns + the union of all
per-event payload fields (NULL when not applicable). Nested reference
structs (MintParams, CurveParams, VestingParams, PoolFeeParameters,
SwapData) are flattened with prefixes.

Type policy (SURVEY §1.3):
  u64  -> DECIMAL(20,0)  (full unsigned range survives aggregation)
  u128 -> DECIMAL(38,0)  (documented clip: values above 1e38-1 are not
          representable; none occur in practice for sqrt prices/liquidity)
  i64  -> LONG, u32 -> LONG, u8/u16/i32 -> INT
  Pubkey -> STRING (base58), Vec<Pubkey> -> ARRAY<STRING>
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, BinaryType, BooleanType,
                               DecimalType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

# ---------------------------------------------------------------------------
# Raw input schemas (FIXTURES.md §1-3; TransactionPretty grpc/types.rs:69-90)
# ---------------------------------------------------------------------------

INSTRUCTION_TYPE = StructType([
    StructField("program_id_index", IntegerType()),
    StructField("account_indices", ArrayType(IntegerType())),
    StructField("data", BinaryType()),
])

INNER_GROUP_TYPE = StructType([
    StructField("index", IntegerType()),
    StructField("instructions", ArrayType(INSTRUCTION_TYPE)),
])

RAW_TRANSACTION_SCHEMA = StructType([
    StructField("slot", LongType()),
    StructField("transaction_index", LongType()),
    StructField("block_time", TimestampType()),
    StructField("signature", StringType()),
    StructField("is_vote", BooleanType()),
    StructField("recv_us", LongType()),
    StructField("static_account_keys", ArrayType(StringType())),
    StructField("loaded_writable_addresses", ArrayType(StringType())),
    StructField("loaded_readonly_addresses", ArrayType(StringType())),
    StructField("instructions", ArrayType(INSTRUCTION_TYPE)),
    StructField("inner_instructions", ArrayType(INNER_GROUP_TYPE)),
    StructField("source", StringType()),
])

RAW_ACCOUNT_SCHEMA = StructType([
    StructField("slot", LongType()),
    StructField("signature", StringType()),
    StructField("pubkey", StringType()),
    StructField("executable", BooleanType()),
    StructField("lamports", LongType()),
    StructField("owner", StringType()),
    StructField("rent_epoch", LongType()),
    StructField("data", BinaryType()),
    StructField("recv_us", LongType()),
])

RAW_BLOCKMETA_SCHEMA = StructType([
    StructField("slot", LongType()),
    StructField("block_hash", StringType()),
    StructField("block_time", TimestampType()),
    StructField("recv_us", LongType()),
])

# ---------------------------------------------------------------------------
# Payload field inventory: field name -> kind
# Kinds: pk u64 u128 i64 u32 u16 u8 i32 bool str pk_list
# Union over all event structs cited in registry.py's header.
# ---------------------------------------------------------------------------

PAYLOAD_FIELDS: dict[str, str] = {
    # --- shared across many events
    "user": "pk", "creator": "pk", "payer": "pk", "pool": "pk",
    "mint": "pk", "timestamp": "i64", "pool_state": "pk",
    "system_program": "pk", "token_program": "pk", "event_authority": "pk",
    "program": "pk", "rent": "pk", "rent_program": "pk",
    "associated_token_program": "pk", "token_2022_program": "pk",
    "remaining_accounts": "pk_list",
    # --- PumpFun create (pumpfun/events.rs:10-57)
    "name": "str", "symbol": "str", "uri": "str",
    "bonding_curve": "pk", "virtual_token_reserves": "u64",
    "virtual_sol_reserves": "u64", "real_token_reserves": "u64",
    "token_total_supply": "u64", "is_mayhem_mode": "bool",
    "mint_authority": "pk", "associated_bonding_curve": "pk",
    # --- PumpFun trade (pumpfun/events.rs:183-251)
    "sol_amount": "u64", "token_amount": "u64", "is_buy": "bool",
    "real_sol_reserves": "u64", "fee_recipient": "pk",
    "fee_basis_points": "u64", "fee": "u64",
    "creator_fee_basis_points": "u64", "creator_fee": "u64",
    "track_volume": "bool", "total_unclaimed_tokens": "u64",
    "total_claimed_tokens": "u64", "current_sol_volume": "u64",
    "last_update_timestamp": "i64", "max_sol_cost": "u64",
    "min_sol_output": "u64", "amount": "u64", "global": "pk",
    "associated_user": "pk", "creator_vault": "pk",
    "global_volume_accumulator": "pk", "user_volume_accumulator": "pk",
    "fee_config": "pk", "fee_program": "pk",
    # --- PumpFun migrate (pumpfun/events.rs:262-316)
    "mint_amount": "u64", "pool_migration_fee": "u64",
    "withdraw_authority": "pk", "pump_amm": "pk", "pool_authority": "pk",
    "pool_authority_mint_account": "pk", "pool_authority_wsol_account": "pk",
    "amm_global_config": "pk", "wsol_mint": "pk", "lp_mint": "pk",
    "user_pool_token_account": "pk", "pool_base_token_account": "pk",
    "pool_quote_token_account": "pk", "pump_amm_event_authority": "pk",
    # --- PumpSwap (pumpswap/events.rs)
    "base_amount_out": "u64", "max_quote_amount_in": "u64",
    "user_base_token_reserves": "u64", "user_quote_token_reserves": "u64",
    "pool_base_token_reserves": "u64", "pool_quote_token_reserves": "u64",
    "quote_amount_in": "u64", "lp_fee_basis_points": "u64", "lp_fee": "u64",
    "protocol_fee_basis_points": "u64", "protocol_fee": "u64",
    "quote_amount_in_with_lp_fee": "u64", "user_quote_amount_in": "u64",
    "user_base_token_account": "pk", "user_quote_token_account": "pk",
    "protocol_fee_recipient": "pk",
    "protocol_fee_recipient_token_account": "pk", "coin_creator": "pk",
    "coin_creator_fee_basis_points": "u64", "coin_creator_fee": "u64",
    "base_mint": "pk", "quote_mint": "pk", "coin_creator_vault_ata": "pk",
    "coin_creator_vault_authority": "pk", "base_token_program": "pk",
    "quote_token_program": "pk",
    "base_amount_in": "u64", "min_quote_amount_out": "u64",
    "quote_amount_out": "u64", "quote_amount_out_without_lp_fee": "u64",
    "user_quote_amount_out": "u64",
    "index": "u16", "base_mint_decimals": "u8", "quote_mint_decimals": "u8",
    "pool_base_amount": "u64", "pool_quote_amount": "u64",
    "minimum_liquidity": "u64", "initial_liquidity": "u64",
    "lp_token_amount_out": "u64", "pool_bump": "u8",
    "max_base_amount_in": "u64", "lp_mint_supply": "u64",
    "lp_token_amount_in": "u64", "min_base_amount_out": "u64",
    # --- Bonk trade (bonk/events.rs:14-72)
    "total_base_sell": "u64", "virtual_base": "u64", "virtual_quote": "u64",
    "real_base_before": "u64", "real_quote_before": "u64",
    "real_base_after": "u64", "real_quote_after": "u64",
    "amount_in": "u64", "amount_out": "u64", "platform_fee": "u64",
    "share_fee": "u64", "trade_direction": "str", "pool_status": "str",
    "exact_in": "bool", "minimum_amount_out": "u64",
    "maximum_amount_in": "u64", "share_fee_rate": "u64",
    "global_config": "pk", "platform_config": "pk",
    "user_base_token": "pk", "user_quote_token": "pk",
    "base_vault": "pk", "quote_vault": "pk", "base_token_mint": "pk",
    "quote_token_mint": "pk", "platform_associated_account": "pk",
    "creator_associated_account": "pk",
    # --- Bonk pool create (bonk/events.rs:85-109; MintParams/CurveParams/
    #     VestingParams flattened, bonk/types.rs:31-86)
    "config": "pk", "base_mint_param_decimals": "u8",
    "base_mint_param_name": "str", "base_mint_param_symbol": "str",
    "base_mint_param_uri": "str",
    "curve_type": "str", "curve_supply": "u64",
    "curve_total_base_sell": "u64", "curve_total_quote_fund_raising": "u64",
    "curve_migrate_type": "u8",
    "vesting_total_locked_amount": "u64", "vesting_cliff_period": "u64",
    "vesting_unlock_period": "u64", "amm_fee_on": "str",
    # --- Bonk migrate (bonk/events.rs:122-228)
    "base_lot_size": "u64", "quote_lot_size": "u64",
    "market_vault_signer_nonce": "u8", "openbook_program": "pk",
    "market": "pk", "request_queue": "pk", "event_queue": "pk",
    "bids": "pk", "asks": "pk", "market_vault_signer": "pk",
    "market_base_vault": "pk", "market_quote_vault": "pk",
    "amm_program": "pk", "amm_pool": "pk", "amm_authority": "pk",
    "amm_open_orders": "pk", "amm_lp_mint": "pk", "amm_base_vault": "pk",
    "amm_quote_vault": "pk", "amm_target_orders": "pk", "amm_config": "pk",
    "amm_create_fee_destination": "pk", "authority": "pk",
    "pool_lp_token": "pk", "spl_token_program": "pk",
    "cpswap_program": "pk", "cpswap_pool": "pk", "cpswap_authority": "pk",
    "cpswap_lp_mint": "pk", "cpswap_base_vault": "pk",
    "cpswap_quote_vault": "pk", "cpswap_config": "pk",
    "cpswap_create_pool_fee": "pk", "cpswap_observation": "pk",
    "lock_program": "pk", "lock_authority": "pk", "lock_lp_vault": "pk",
    "metadata_program": "pk",
    # --- Raydium CPMM (raydium_cpmm/events.rs)
    "max_amount_in": "u64", "input_token_account": "pk",
    "output_token_account": "pk", "input_vault": "pk", "output_vault": "pk",
    "input_token_program": "pk", "output_token_program": "pk",
    "input_token_mint": "pk", "output_token_mint": "pk",
    "observation_state": "pk",
    "lp_token_amount": "u64", "maximum_token0_amount": "u64",
    "maximum_token1_amount": "u64", "owner_lp_token": "pk",
    "token0_account": "pk", "token1_account": "pk", "token0_vault": "pk",
    "token1_vault": "pk", "token_program2022": "pk", "vault0_mint": "pk",
    "vault1_mint": "pk", "owner": "pk",
    "init_amount0": "u64", "init_amount1": "u64", "open_time": "u64",
    "token0_mint": "pk", "token1_mint": "pk", "creator_token0": "pk",
    "creator_token1": "pk", "creator_lp_token": "pk",
    "create_pool_fee": "pk", "token0_program": "pk", "token1_program": "pk",
    "minimum_token0_amount": "u64", "minimum_token1_amount": "u64",
    "memo_program": "pk",
    # --- Raydium CLMM (raydium_clmm/events.rs)
    "other_amount_threshold": "u64", "sqrt_price_limit_x64": "u128",
    "is_base_input": "bool", "tick_array": "pk",
    "input_vault_mint": "pk", "output_vault_mint": "pk",
    "nft_owner": "pk", "position_nft_mint": "pk",
    "position_nft_account": "pk", "personal_position": "pk",
    "liquidity": "u128", "amount0_min": "u64", "amount1_min": "u64",
    "nft_account": "pk", "protocol_position": "pk", "token_vault0": "pk",
    "token_vault1": "pk", "tick_array_lower": "pk", "tick_array_upper": "pk",
    "recipient_token_account0": "pk", "recipient_token_account1": "pk",
    "sqrt_price_x64": "u128", "pool_creator": "pk", "token_mint0": "pk",
    "token_mint1": "pk", "tick_array_bitmap": "pk",
    "token_program0": "pk", "token_program1": "pk",
    "amount0_max": "u64", "amount1_max": "u64", "base_flag": "bool",
    "token_account0": "pk", "token_account1": "pk",
    "tick_lower_index": "i32", "tick_upper_index": "i32",
    "tick_array_lower_start_index": "i32", "tick_array_upper_start_index": "i32",
    "with_metadata": "bool", "metadata_account": "pk",
    "position_nft_owner": "pk",
    # --- Raydium AMM v4 (raydium_amm_v4/events.rs)
    "amm": "pk", "serum_program": "pk", "serum_market": "pk",
    "serum_bids": "pk", "serum_asks": "pk", "serum_event_queue": "pk",
    "serum_coin_vault_account": "pk", "serum_pc_vault_account": "pk",
    "serum_vault_signer": "pk", "user_source_token_account": "pk",
    "user_destination_token_account": "pk", "user_source_owner": "pk",
    "max_coin_amount": "u64", "max_pc_amount": "u64", "base_side": "u64",
    "lp_mint_address": "pk", "pool_coin_token_account": "pk",
    "pool_pc_token_account": "pk", "user_coin_token_account": "pk",
    "user_pc_token_account": "pk", "user_lp_token_account": "pk",
    "user_owner": "pk", "nonce": "u8", "init_pc_amount": "u64",
    "init_coin_amount": "u64", "spl_associated_token_account": "pk",
    "coin_mint": "pk", "pc_mint": "pk", "pool_withdraw_queue": "pk",
    "pool_temp_lp": "pk", "user_wallet": "pk", "user_token_coin": "pk",
    "user_token_pc": "pk", "pool_temp_lp_token_account": "pk",
    "coin_pnl_token_account": "pk", "pc_pnl_token_account": "pk",
    "pnl_owner_account": "pk",
    # --- Meteora DAMM v2 (meteora_damm_v2/events.rs)
    "collect_fee_mode": "u8", "has_referral": "bool", "amount_0": "u64",
    "amount_1": "u64", "swap_mode": "u8", "included_fee_input_amount": "u64",
    "excluded_fee_input_amount": "u64", "amount_left": "u64",
    "output_amount": "u64", "next_sqrt_price": "u128", "trading_fee": "u64",
    "partner_fee": "u64", "referral_fee": "u64",
    "included_transfer_fee_amount_in": "u64",
    "included_transfer_fee_amount_out": "u64",
    "excluded_transfer_fee_amount_out": "u64", "current_timestamp": "u64",
    "reserve_a_amount": "u64", "reserve_b_amount": "u64",
    "token_a_vault": "pk", "token_b_vault": "pk", "token_a_mint": "pk",
    "token_b_mint": "pk", "token_a_program": "pk", "token_b_program": "pk",
    "referral_token_account": "pk", "sysvar": "pk",
    "alpha_vault": "pk",
    "base_fee_cliff_fee_numerator": "u64", "base_fee_first_factor": "u16",
    "base_fee_second_factor": "u64", "base_fee_third_factor": "u64",
    "base_fee_mode": "u8",
    "dynamic_fee_bin_step": "u16", "dynamic_fee_bin_step_u128": "u128",
    "dynamic_fee_filter_period": "u16", "dynamic_fee_decay_period": "u16",
    "dynamic_fee_reduction_factor": "u16",
    "dynamic_fee_max_volatility_accumulator": "u32",
    "dynamic_fee_variable_fee_control": "u32",
    "sqrt_min_price": "u128", "sqrt_max_price": "u128",
    "activation_type": "u8", "sqrt_price": "u128", "activation_point": "u64",
    "token_a_flag": "u8", "token_b_flag": "u8", "token_a_amount": "u64",
    "token_b_amount": "u64", "total_amount_a": "u64", "total_amount_b": "u64",
    "pool_type": "u8", "position": "pk", "payer_token_a": "pk",
    "payer_token_b": "pk", "pool_creator_authority": "pk",
    # meteora trade_direction/pool metadata reuse bonk's trade_direction (str)
    # --- ComputeBudget (common_event_parser.rs:16-30)
    "units": "u32", "micro_lamports": "u64",
}

# base_fee_second_factor is [u8;8] in the reference read little-endian as u64
# (meteora_damm_v2/events.rs:12).

_KIND_TO_SPARK = {
    "pk": StringType(), "str": StringType(),
    "u64": DecimalType(20, 0), "u128": DecimalType(38, 0),
    "i64": LongType(), "u32": LongType(),
    "u16": IntegerType(), "u8": IntegerType(), "i32": IntegerType(),
    "bool": BooleanType(), "pk_list": ArrayType(StringType()),
}

METADATA_FIELDS = [
    StructField("signature", StringType()),
    StructField("slot", LongType()),
    StructField("transaction_index", LongType()),
    StructField("block_time", TimestampType()),
    StructField("block_time_ms", LongType()),
    StructField("recv_us", LongType()),
    StructField("protocol", StringType()),
    StructField("event_type", StringType()),
    StructField("program_id", StringType()),
    StructField("outer_index", LongType()),
    StructField("inner_index", LongType()),
    # SwapData flattened (common/types.rs:291-297)
    StructField("swap_from_mint", StringType()),
    StructField("swap_to_mint", StringType()),
    StructField("swap_from_amount", DecimalType(20, 0)),
    StructField("swap_to_amount", DecimalType(20, 0)),
    StructField("swap_description", StringType()),
]

def event_schema() -> StructType:
    """The event schema derived from the CURRENT payload-field registry.

    Module-level ``EVENT_SCHEMA`` is this function's import-time value;
    call the function (as plans/pipeline.py does at plan-build time)
    when protocol plug-ins (`plugins.register_protocol`) may have
    widened ``PAYLOAD_FIELDS`` after import."""
    return StructType(
        METADATA_FIELDS
        + [StructField(name, _KIND_TO_SPARK[kind], True)
           for name, kind in sorted(PAYLOAD_FIELDS.items())]
    )


EVENT_SCHEMA = event_schema()

METADATA_COL_NAMES = [f.name for f in METADATA_FIELDS]
PAYLOAD_COL_NAMES = sorted(PAYLOAD_FIELDS)
