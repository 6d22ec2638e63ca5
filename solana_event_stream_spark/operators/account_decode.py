"""Account-state decoders (D3/P8, SURVEY §2.4/§2.7): protocol account
dispatch by (owner program, 8-byte discriminator), then the common SPL
Token / Token-2022 / Nonce fallbacks — the routing order of
core/account_event_parser.rs:59-143.

Round-1 protocol coverage: PumpFun bonding-curve and global accounts
(pumpfun/types.rs:14-110). The remaining protocol account structs
(PumpSwap Pool/GlobalConfig, Bonk PoolState/configs, CPMM/CLMM states,
tick arrays) have their discriminators registered below and fall through
to the common path until their decoders land.

Note: the reference's AMM v4 AmmInfo dispatch is unreachable — it matches
an 8-byte discriminator slice against the 1-byte pattern &[6]
(core/dispatcher.rs:280-287 vs raydium_amm_v4/events.rs:179), which never
succeeds; we intentionally do not register it.
"""

from __future__ import annotations

from .decode import _R, b58encode

ANCHOR_DISC_LEN = 8


def _hex(*ints: int) -> str:
    return bytes(ints).hex()


# (protocol, disc_hex) -> account event type (SURVEY §2.7 account rows)
ACCOUNT_DISCRIMINATORS: dict[tuple[str, str], str] = {
    # pumpfun/events.rs:374-375
    ("PumpFun", _hex(23, 183, 248, 55, 96, 216, 172, 96)): "AccountPumpFunBondingCurve",
    ("PumpFun", _hex(167, 232, 232, 177, 200, 108, 114, 127)): "AccountPumpFunGlobal",
    # pumpswap/events.rs:298-299
    ("PumpSwap", _hex(149, 8, 156, 202, 160, 252, 176, 217)): "AccountPumpSwapGlobalConfig",
    ("PumpSwap", _hex(241, 154, 109, 4, 17, 177, 109, 188)): "AccountPumpSwapPool",
    # bonk/events.rs:288-290
    ("Bonk", _hex(247, 237, 227, 245, 215, 195, 222, 70)): "AccountBonkPoolState",
    ("Bonk", _hex(149, 8, 156, 202, 160, 252, 176, 217)): "AccountBonkGlobalConfig",
    ("Bonk", _hex(160, 78, 128, 0, 248, 83, 230, 160)): "AccountBonkPlatformConfig",
    # raydium_cpmm/events.rs:151-152
    ("RaydiumCpmm", _hex(218, 244, 33, 104, 203, 203, 43, 111)): "AccountRaydiumCpmmAmmConfig",
    ("RaydiumCpmm", _hex(247, 237, 227, 245, 215, 195, 222, 70)): "AccountRaydiumCpmmPoolState",
    # raydium_clmm/events.rs:263-265
    ("RaydiumClmm", _hex(218, 244, 33, 104, 203, 203, 43, 111)): "AccountRaydiumClmmAmmConfig",
    ("RaydiumClmm", _hex(247, 237, 227, 245, 215, 195, 222, 70)): "AccountRaydiumClmmPoolState",
    ("RaydiumClmm", _hex(192, 155, 85, 205, 49, 249, 129, 42)): "AccountRaydiumClmmTickArrayState",
}

SPL_TOKEN_PROGRAM = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
TOKEN_2022_PROGRAM = "TokenzQdBNbLqP5VEhdkAS6EPFLC1PHnBqCXEpPxuEb"

BONDING_CURVE_SIZE = 8 * 5 + 1 + 32 + 1            # pumpfun/types.rs:26
GLOBAL_SIZE = (1 + 32 * 2 + 8 * 5 + 32 + 1 + 8 * 2
               + 32 * 7 + 32 * 2 + 1 + 32 * 2 + 1)  # pumpfun/types.rs:82
MINT_LEN = 82
TOKEN_ACCOUNT_LEN = 165
NONCE_LEN = 80


def _decode_pumpfun_bonding_curve(data: bytes):
    # pumpfun/types.rs:28-33: borsh over data[8 : 8+SIZE]
    if len(data) < BONDING_CURVE_SIZE + 8:
        return None
    r = _R(data[8:8 + BONDING_CURVE_SIZE])
    out = {
        "virtual_token_reserves": r.u64(), "virtual_sol_reserves": r.u64(),
        "real_token_reserves": r.u64(), "real_sol_reserves": r.u64(),
        "token_total_supply": r.u64(),
    }
    complete = r.borsh_bool()
    creator = r.pk()
    mayhem = r.borsh_bool()
    if any(v is None for v in out.values()) or complete is None \
            or creator is None or mayhem is None:
        return None
    out.update({"complete": complete, "creator": creator,
                "is_mayhem_mode": mayhem})
    return out


def _decode_pumpfun_global(data: bytes):
    # pumpfun/types.rs:84-89
    if len(data) < GLOBAL_SIZE + 8:
        return None
    r = _R(data[8:8 + GLOBAL_SIZE])
    initialized = r.borsh_bool()
    authority, fee_recipient = r.pk(), r.pk()
    nums = {
        "initial_virtual_token_reserves": r.u64(),
        "initial_virtual_sol_reserves": r.u64(),
        "initial_real_token_reserves": r.u64(),
        "token_total_supply": r.u64(), "fee_basis_points": r.u64(),
    }
    withdraw_authority = r.pk()
    enable_migrate = r.borsh_bool()
    pool_migration_fee, creator_fee_basis_points = r.u64(), r.u64()
    fee_recipients = [r.pk() for _ in range(7)]
    set_creator_authority = r.pk()
    admin_set_creator_authority = r.pk()
    create_v2_enabled = r.borsh_bool()
    whitelist_pda = r.pk()
    reserved_fee_recipient = r.pk()
    mayhem_mode_enabled = r.borsh_bool()
    vals = [initialized, authority, fee_recipient, withdraw_authority,
            enable_migrate, pool_migration_fee, creator_fee_basis_points,
            set_creator_authority, admin_set_creator_authority,
            create_v2_enabled, whitelist_pda, reserved_fee_recipient,
            mayhem_mode_enabled] + list(nums.values()) + fee_recipients
    if any(v is None for v in vals):
        return None
    return {
        "initialized": initialized, "authority": authority,
        "fee_recipient": fee_recipient, **nums,
        "withdraw_authority": withdraw_authority,
        "enable_migrate": enable_migrate,
        "pool_migration_fee": pool_migration_fee,
        "creator_fee_basis_points": creator_fee_basis_points,
        "fee_recipients": fee_recipients,
        "set_creator_authority": set_creator_authority,
        "admin_set_creator_authority": admin_set_creator_authority,
        "create_v2_enabled": create_v2_enabled,
        "whitelist_pda": whitelist_pda,
        "reserved_fee_recipient": reserved_fee_recipient,
        "mayhem_mode_enabled": mayhem_mode_enabled,
    }


PUMPSWAP_GLOBAL_CONFIG_SIZE = 32 + 8 + 8 + 1 + 32 * 8 + 8 + 32 * 3 + 1
PUMPSWAP_POOL_SIZE = 1 + 2 + 32 * 6 + 8 + 32 + 1
BONK_POOL_STATE_SIZE = 8 + 1 * 5 + 8 * 10 + 32 * 7 + 8 * 8 + 8 * 5
BONK_GLOBAL_CONFIG_SIZE = 8 + 1 + 2 + 8 * 8 + 32 * 5 + 8 * 16
BONK_PLATFORM_CONFIG_SIZE = 8 + 32 * 2 + 8 * 4 + 8 * 64 + 8 * 256 * 3
CPMM_AMM_CONFIG_SIZE = 228
CPMM_POOL_STATE_SIZE = 629


def _body(data: bytes, size: int):
    """Anchor account body: data[8 : 8+size] (every *_parser slices the
    8-byte discriminator off first, e.g. pumpswap/types.rs:43-46)."""
    if len(data) < size + 8:
        return None
    return _R(data[8:8 + size])


def _finish(out: dict, r: _R, size: int):
    if any(v is None for v in out.values()):
        return None
    if r.o != size:  # borsh from_slice exact-consumption
        return None
    return out


def _decode_pumpswap_global_config(data: bytes):
    # pumpswap/types.rs:14-35
    r = _body(data, PUMPSWAP_GLOBAL_CONFIG_SIZE)
    if r is None:
        return None
    out = {
        "admin": r.pk(), "lp_fee_basis_points": r.u64(),
        "protocol_fee_basis_points": r.u64(), "disable_flags": r.u8(),
        "protocol_fee_recipients": [r.pk() for _ in range(8)],
        "coin_creator_fee_basis_points": r.u64(),
        "admin_set_coin_creator_authority": r.pk(),
        "whitelist_pda": r.pk(), "reserved_fee_recipient": r.pk(),
        "mayhem_mode_enabled": r.borsh_bool(),
    }
    if None in out["protocol_fee_recipients"]:
        return None
    return _finish(out, r, PUMPSWAP_GLOBAL_CONFIG_SIZE)


def _decode_pumpswap_pool(data: bytes):
    # pumpswap/types.rs:62-84
    r = _body(data, PUMPSWAP_POOL_SIZE)
    if r is None:
        return None
    out = {
        "pool_bump": r.u8(), "index": r.u16(), "creator": r.pk(),
        "base_mint": r.pk(), "quote_mint": r.pk(), "lp_mint": r.pk(),
        "pool_base_token_account": r.pk(),
        "pool_quote_token_account": r.pk(), "lp_supply": r.u64(),
        "coin_creator": r.pk(), "is_mayhem_mode": r.borsh_bool(),
    }
    return _finish(out, r, PUMPSWAP_POOL_SIZE)


def _decode_bonk_pool_state(data: bytes):
    # bonk/types.rs:89-126
    r = _body(data, BONK_POOL_STATE_SIZE)
    if r is None:
        return None
    out = {
        "epoch": r.u64(), "auth_bump": r.u8(), "status": r.u8(),
        "base_decimals": r.u8(), "quote_decimals": r.u8(),
        "migrate_type": r.u8(), "supply": r.u64(),
        "total_base_sell": r.u64(), "virtual_base": r.u64(),
        "virtual_quote": r.u64(), "real_base": r.u64(),
        "real_quote": r.u64(), "total_quote_fund_raising": r.u64(),
        "quote_protocol_fee": r.u64(), "platform_fee": r.u64(),
        "migrate_fee": r.u64(),
        "vesting_total_locked_amount": r.u64(),
        "vesting_cliff_period": r.u64(), "vesting_unlock_period": r.u64(),
        "vesting_start_time": r.u64(),
        "vesting_allocated_share_amount": r.u64(),
        "global_config": r.pk(), "platform_config": r.pk(),
        "base_mint": r.pk(), "quote_mint": r.pk(), "base_vault": r.pk(),
        "quote_vault": r.pk(), "creator": r.pk(),
    }
    if r._take(8 * 8) is None:  # padding [u64; 8]
        return None
    return _finish(out, r, BONK_POOL_STATE_SIZE)


def _decode_bonk_global_config(data: bytes):
    # bonk/types.rs:156-176
    r = _body(data, BONK_GLOBAL_CONFIG_SIZE)
    if r is None:
        return None
    out = {
        "epoch": r.u64(), "curve_type_raw": r.u8(), "index": r.u16(),
        "migrate_fee": r.u64(), "trade_fee_rate": r.u64(),
        "max_share_fee_rate": r.u64(), "min_base_supply": r.u64(),
        "max_lock_rate": r.u64(), "min_base_sell_rate": r.u64(),
        "min_base_migrate_rate": r.u64(),
        "min_quote_fund_raising": r.u64(), "quote_mint": r.pk(),
        "protocol_fee_owner": r.pk(), "migrate_fee_owner": r.pk(),
        "migrate_to_amm_wallet": r.pk(), "migrate_to_cpswap_wallet": r.pk(),
    }
    if r._take(8 * 16) is None:  # padding [u64; 16]
        return None
    return _finish(out, r, BONK_GLOBAL_CONFIG_SIZE)


def _decode_bonk_platform_config(data: bytes):
    # bonk/types.rs:210-224 — Vec<u8> fields are borsh length-prefixed;
    # from_slice demands the struct consume exactly PLATFORM_CONFIG_SIZE
    r = _body(data, BONK_PLATFORM_CONFIG_SIZE)
    if r is None:
        return None
    out = {
        "epoch": r.u64(), "platform_fee_wallet": r.pk(),
        "platform_nft_wallet": r.pk(), "platform_scale": r.u64(),
        "creator_scale": r.u64(), "burn_scale": r.u64(),
        "fee_rate": r.u64(),
    }

    def vec_str():
        n = r.u32()
        if n is None:
            return None
        v = r._take(n)
        return None if v is None else v.decode("utf-8", errors="replace")

    out["platform_name"] = vec_str()
    out["platform_web"] = vec_str()
    out["platform_img"] = vec_str()
    pad_n = r.u32()
    if pad_n is None or r._take(pad_n) is None:
        return None
    return _finish(out, r, BONK_PLATFORM_CONFIG_SIZE)


def _decode_cpmm_amm_config(data: bytes):
    # raydium_cpmm/types.rs:17-30
    r = _body(data, CPMM_AMM_CONFIG_SIZE)
    if r is None:
        return None
    out = {
        "bump": r.u8(), "disable_create_pool": r.borsh_bool(),
        "index": r.u16(), "trade_fee_rate": r.u64(),
        "protocol_fee_rate": r.u64(), "fund_fee_rate": r.u64(),
        "create_pool_fee": r.u64(), "protocol_owner": r.pk(),
        "fund_owner": r.pk(),
    }
    if r._take(8 * 16) is None:  # padding [u64; 16]
        return None
    return _finish(out, r, CPMM_AMM_CONFIG_SIZE)


def _decode_cpmm_pool_state(data: bytes):
    # raydium_cpmm/types.rs:61-87
    r = _body(data, CPMM_POOL_STATE_SIZE)
    if r is None:
        return None
    out = {
        "amm_config": r.pk(), "pool_creator": r.pk(),
        "token0_vault": r.pk(), "token1_vault": r.pk(), "lp_mint": r.pk(),
        "token0_mint": r.pk(), "token1_mint": r.pk(),
        "token0_program": r.pk(), "token1_program": r.pk(),
        "observation_key": r.pk(), "auth_bump": r.u8(), "status": r.u8(),
        "lp_mint_decimals": r.u8(), "mint0_decimals": r.u8(),
        "mint1_decimals": r.u8(), "lp_supply": r.u64(),
        "protocol_fees_token0": r.u64(), "protocol_fees_token1": r.u64(),
        "fund_fees_token0": r.u64(), "fund_fees_token1": r.u64(),
        "open_time": r.u64(), "recent_epoch": r.u64(),
    }
    if r._take(8 * 31) is None:  # padding [u64; 31]
        return None
    return _finish(out, r, CPMM_POOL_STATE_SIZE)


CLMM_AMM_CONFIG_SIZE = 1 + 2 + 32 + 4 * 2 + 2 + 4 * 2 + 32 + 8 * 3
CLMM_POOL_STATE_SIZE = 1536
CLMM_TICK_ARRAY_STATE_SIZE = 10232


def _decode_clmm_amm_config(data: bytes):
    # raydium_clmm/types.rs:18-31 — the struct's `owner` is renamed
    # config_owner: the flat schema's `owner` column is the account's
    # owning program.
    r = _body(data, CLMM_AMM_CONFIG_SIZE)
    if r is None:
        return None
    out = {
        "bump": r.u8(), "index": r.u16(), "config_owner": r.pk(),
        "protocol_fee_rate": r.u32(), "trade_fee_rate": r.u32(),
        "tick_spacing": r.u16(), "fund_fee_rate": r.u32(),
    }
    if r.u32() is None:  # padding_u32
        return None
    out["fund_owner"] = r.pk()
    if r._take(8 * 3) is None:  # padding [u64; 3]
        return None
    return _finish(out, r, CLMM_AMM_CONFIG_SIZE)


def _reward_info(r: _R):
    # raydium_clmm/types.rs:62-75
    from decimal import Decimal as D
    vals = {
        "reward_state": r.u8(), "open_time": r.u64(), "end_time": r.u64(),
        "last_update_time": r.u64(),
        "emissions_per_second_x64": r.u128(),
        "reward_total_emissioned": r.u64(), "reward_claimed": r.u64(),
        "token_mint": r.pk(), "token_vault": r.pk(), "authority": r.pk(),
        "reward_growth_global_x64": r.u128(),
    }
    if any(v is None for v in vals.values()):
        return None
    for k in ("open_time", "end_time", "last_update_time",
              "emissions_per_second_x64", "reward_total_emissioned",
              "reward_claimed", "reward_growth_global_x64"):
        vals[k] = D(vals[k])
    return vals


def _decode_clmm_pool_state(data: bytes):
    # raydium_clmm/types.rs:77-118
    from decimal import Decimal as D
    r = _body(data, CLMM_POOL_STATE_SIZE)
    if r is None:
        return None
    bump = r.u8()
    out = {
        "amm_config": r.pk(), "config_owner": r.pk(),
        "token_mint0": r.pk(), "token_mint1": r.pk(),
        "token_vault0": r.pk(), "token_vault1": r.pk(),
        "observation_key": r.pk(), "mint0_decimals": r.u8(),
        "mint1_decimals": r.u8(), "tick_spacing": r.u16(),
        "liquidity": r.u128(), "sqrt_price_x64": r.u128(),
        "tick_current": r.i32(),
    }
    if r.u16() is None or r.u16() is None:  # padding3/padding4
        return None
    out.update({
        "fee_growth_global0_x64": r.u128(),
        "fee_growth_global1_x64": r.u128(),
        "protocol_fees_token0": r.u64(), "protocol_fees_token1": r.u64(),
        "swap_in_amount_token0": r.u128(),
        "swap_out_amount_token1": r.u128(),
        "swap_in_amount_token1": r.u128(),
        "swap_out_amount_token0": r.u128(),
        "status": r.u8(),
    })
    if r._take(7) is None:  # padding [u8; 7]
        return None
    rewards = []
    for _ in range(3):
        ri = _reward_info(r)
        if ri is None:
            return None
        rewards.append(ri)
    out["reward_infos"] = rewards
    bitmap = [r.u64() for _ in range(16)]
    out.update({
        "total_fees_token0": r.u64(), "total_fees_claimed_token0": r.u64(),
        "total_fees_token1": r.u64(), "total_fees_claimed_token1": r.u64(),
        "fund_fees_token0": r.u64(), "fund_fees_token1": r.u64(),
        "open_time": r.u64(), "recent_epoch": r.u64(),
    })
    if r._take(8 * 24) is None or r._take(8 * 32) is None:  # padding1/2
        return None
    if bump is None or None in bitmap \
            or any(v is None for v in out.values() if not isinstance(v, list)):
        return None
    out["auth_bump"] = bump
    out["tick_array_bitmap"] = [D(b) for b in bitmap]
    return _finish(out, r, CLMM_POOL_STATE_SIZE)


def _tick_state(r: _R):
    # raydium_clmm/types.rs:149-160 (168 bytes each)
    from decimal import Decimal as D
    tick = r.i32()
    ln_raw = r._take(16)
    vals = {
        "liquidity_gross": r.u128(), "fee_growth_outside0_x64": r.u128(),
        "fee_growth_outside1_x64": r.u128(),
    }
    growths = [r.u128() for _ in range(3)]
    if r._take(4 * 13) is None:  # padding [u32; 13]
        return None
    if tick is None or ln_raw is None or None in growths \
            or any(v is None for v in vals.values()):
        return None
    return {
        "tick": tick,
        "liquidity_net": D(int.from_bytes(ln_raw, "little", signed=True)),
        **{k: D(v) for k, v in vals.items()},
        "reward_growths_outside_x64": [D(g) for g in growths],
    }


def _decode_clmm_tick_array(data: bytes):
    # raydium_clmm/types.rs:174-198
    r = _body(data, CLMM_TICK_ARRAY_STATE_SIZE)
    if r is None:
        return None
    out = {"pool_id": r.pk(), "start_tick_index": r.i32()}
    ticks = []
    for _ in range(60):
        t = _tick_state(r)
        if t is None:
            return None
        ticks.append(t)
    out["ticks"] = ticks
    out["initialized_tick_count"] = r.u8()
    out["recent_epoch"] = r.u64()
    if r._take(107) is None:  # padding [u8; 107]
        return None
    if any(v is None for v in out.values() if not isinstance(v, list)):
        return None
    return _finish(out, r, CLMM_TICK_ARRAY_STATE_SIZE)


# Plug-in account payload fields (name -> schemas._KIND_TO_SPARK kind):
# plans/account_pipeline.account_event_schema() appends these to the
# static base schema, exactly as schemas.event_schema() appends
# PAYLOAD_FIELDS for the instruction side. Mutated only by
# plugins.register_protocol.
ACCOUNT_PLUGIN_FIELDS: dict[str, str] = {}

PROTOCOL_ACCOUNT_DECODERS = {
    "AccountPumpFunBondingCurve": _decode_pumpfun_bonding_curve,
    "AccountPumpFunGlobal": _decode_pumpfun_global,
    "AccountPumpSwapGlobalConfig": _decode_pumpswap_global_config,
    "AccountPumpSwapPool": _decode_pumpswap_pool,
    "AccountBonkPoolState": _decode_bonk_pool_state,
    "AccountBonkGlobalConfig": _decode_bonk_global_config,
    "AccountBonkPlatformConfig": _decode_bonk_platform_config,
    "AccountRaydiumCpmmAmmConfig": _decode_cpmm_amm_config,
    "AccountRaydiumCpmmPoolState": _decode_cpmm_pool_state,
    "AccountRaydiumClmmAmmConfig": _decode_clmm_amm_config,
    "AccountRaydiumClmmPoolState": _decode_clmm_pool_state,
    "AccountRaydiumClmmTickArrayState": _decode_clmm_tick_array,
}


def decode_nonce(data: bytes):
    """solana_account_decoder::parse_nonce, Initialized only
    (account_event_parser.rs:215-241). Layout: version u32, state u32
    (1=Initialized), authority pk, blockhash pk, fee_lamports u64."""
    if len(data) < NONCE_LEN:
        return None
    r = _R(data)
    version, state = r.u32(), r.u32()
    if version != 1 or state != 1:
        return None
    authority, blockhash = r.pk(), r.pk()
    return {"nonce": blockhash, "authority": authority}


def decode_spl_mint(data: bytes):
    """SPL Mint (exact 82 bytes; unpack_from_slice has no init check,
    account_event_parser.rs:157-173)."""
    if len(data) != MINT_LEN:
        return None
    supply = int.from_bytes(data[36:44], "little")
    decimals = data[44]
    return {"supply": supply, "decimals": decimals}


def decode_token2022_mint(data: bytes):
    """Token-2022 mint via StateWithExtensions: either base-82 form is
    excluded here (caught by decode_spl_mint first), or len > 165 with
    AccountType::Mint (1) at offset 165 (account_event_parser.rs:175-191).
    Extension TLV content is not needed for supply/decimals."""
    if len(data) <= TOKEN_ACCOUNT_LEN or data[TOKEN_ACCOUNT_LEN] != 1:
        return None
    return {
        "supply": int.from_bytes(data[36:44], "little"),
        "decimals": data[44],
    }


def decode_token_amount(data: bytes, owner: str):
    """Token account amount: Account2022 for token-2022 owner else SPL
    Account::unpack (exact 165 bytes, state != Uninitialized)
    (account_event_parser.rs:192-198)."""
    if owner == TOKEN_2022_PROGRAM:
        if len(data) < TOKEN_ACCOUNT_LEN:
            return None
        if len(data) > TOKEN_ACCOUNT_LEN and data[TOKEN_ACCOUNT_LEN] != 2:
            return None  # AccountType::Account tag required past base len
    elif len(data) != TOKEN_ACCOUNT_LEN:
        return None
    if data[108] == 0:  # AccountState::Uninitialized
        return None
    return int.from_bytes(data[64:72], "little")
