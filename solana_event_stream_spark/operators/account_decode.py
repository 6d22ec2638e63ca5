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


PROTOCOL_ACCOUNT_DECODERS = {
    "AccountPumpFunBondingCurve": _decode_pumpfun_bonding_curve,
    "AccountPumpFunGlobal": _decode_pumpfun_global,
    # remaining protocol account structs: round-2 (discriminators above
    # already route; decoder absence falls through to the common path,
    # exactly like an unparseable account in the reference)
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
