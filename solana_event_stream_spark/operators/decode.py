"""Byte-layout decoders for instruction / CPI-log payloads (P5/P6, SURVEY
§2.4). Pure Python over bytes — invoked from the Arrow-batched decode stage
in plans/pipeline.py; everything upstream/downstream stays in DataFrame ops.

Layout citations per decoder below. General rules replicated from the
reference:
- every decoder returns None on truncated/malformed input (F7 semantics,
  e.g. pumpfun/parser.rs:120, core/event_parser.rs:330-334);
- borsh-sourced decoders require exact consumption of their slice
  (borsh::from_slice errors on trailing bytes — e.g. bonk/events.rs:76-81
  decodes exactly 139 bytes; bonk pool-create requires an exactly-256-byte
  struct, bonk/events.rs:111-118);
- borsh bool/enum tags are strict (invalid tag -> None); hand-rolled
  decoders compare `== 1` (lenient) where the reference does.
"""

from __future__ import annotations

import struct

from ..registry import (BONK_BUY_TYPES, BONK_SELL_TYPES, ZERO_PUBKEY)

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


# Pubkeys repeat heavily within a workload (mints, vaults, programs);
# memoize the bignum base58 conversion per worker. Bounded so a
# pathological stream of unique keys cannot grow it past ~10 MB.
_B58_CACHE: dict[bytes, str] = {}
_B58_CACHE_MAX = 1 << 16


def b58encode(raw: bytes) -> str:
    s = _B58_CACHE.get(raw)
    if s is not None:
        return s
    n = int.from_bytes(raw, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    s = "1" * pad + "".join(reversed(out))
    if len(_B58_CACHE) < _B58_CACHE_MAX:
        _B58_CACHE[bytes(raw)] = s
    return s


def b58decode(s: str) -> bytes:
    n = 0
    for c in s:
        n = n * 58 + _B58_INDEX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = 0
    for c in s:
        if c == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


class _R:
    """Little-endian cursor; every read returns None past the end."""

    __slots__ = ("d", "o")

    def __init__(self, data: bytes, offset: int = 0):
        self.d = data
        self.o = offset

    def _take(self, n: int):
        if self.o + n > len(self.d):
            return None
        v = self.d[self.o:self.o + n]
        self.o += n
        return v

    def u8(self):
        v = self._take(1)
        return None if v is None else v[0]

    def u16(self):
        v = self._take(2)
        return None if v is None else int.from_bytes(v, "little")

    def u32(self):
        v = self._take(4)
        return None if v is None else int.from_bytes(v, "little")

    def u64(self):
        v = self._take(8)
        return None if v is None else int.from_bytes(v, "little")

    def u128(self):
        v = self._take(16)
        return None if v is None else int.from_bytes(v, "little")

    def i32(self):
        v = self._take(4)
        return None if v is None else struct.unpack("<i", v)[0]

    def i64(self):
        v = self._take(8)
        return None if v is None else struct.unpack("<q", v)[0]

    def pk(self):
        v = self._take(32)
        return None if v is None else b58encode(v)

    def borsh_bool(self):
        v = self.u8()
        if v is None or v > 1:
            return None
        return v == 1

    def borsh_str(self):
        n = self.u32()
        if n is None:
            return None
        v = self._take(n)
        if v is None:
            return None
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None

    def lossy_str(self):
        n = self.u32()
        if n is None:
            return None
        v = self._take(n)
        if v is None:
            return None
        return v.decode("utf-8", errors="replace")


def _acc(accounts, i):
    return accounts[i] if i < len(accounts) else None


# ===========================================================================
# Instruction decoders: fn(data_after_disc, accounts) -> dict | None
# ===========================================================================

def _pumpfun_create(data, accounts):
    # pumpfun/parser.rs:113-236 (create and create_v2 share the layout)
    if len(data) < 16 or len(accounts) < 11:
        return None
    r = _R(data)
    name, symbol, uri = r.lossy_str(), r.lossy_str(), r.lossy_str()
    if name is None or symbol is None or uri is None:
        return None
    creator = _R(data, r.o).pk() if r.o + 32 <= len(data) else ZERO_PUBKEY
    return {
        "name": name, "symbol": symbol, "uri": uri, "creator": creator,
        "mint": accounts[0], "mint_authority": accounts[1],
        "bonding_curve": accounts[2], "associated_bonding_curve": accounts[3],
        "user": accounts[7],
    }


def _pumpfun_buy(data, accounts):
    # pumpfun/parser.rs:239-274
    if len(data) < 16 or len(accounts) < 16:
        return None
    r = _R(data)
    return {
        "amount": r.u64(), "max_sol_cost": r.u64(), "is_buy": True,
        "global": accounts[0], "fee_recipient": accounts[1],
        "mint": accounts[2], "bonding_curve": accounts[3],
        "associated_bonding_curve": accounts[4], "associated_user": accounts[5],
        "user": accounts[6], "system_program": accounts[7],
        "token_program": accounts[8], "creator_vault": accounts[9],
        "event_authority": accounts[10], "program": accounts[11],
        "global_volume_accumulator": accounts[12],
        "user_volume_accumulator": accounts[13],
        "fee_config": accounts[14], "fee_program": accounts[15],
    }


def _pumpfun_sell(data, accounts):
    # pumpfun/parser.rs:277-312
    if len(data) < 16 or len(accounts) < 14:
        return None
    r = _R(data)
    return {
        "amount": r.u64(), "min_sol_output": r.u64(), "is_buy": False,
        "global": accounts[0], "fee_recipient": accounts[1],
        "mint": accounts[2], "bonding_curve": accounts[3],
        "associated_bonding_curve": accounts[4], "associated_user": accounts[5],
        "user": accounts[6], "system_program": accounts[7],
        "creator_vault": accounts[8], "token_program": accounts[9],
        "event_authority": accounts[10], "program": accounts[11],
        "global_volume_accumulator": ZERO_PUBKEY,
        "user_volume_accumulator": ZERO_PUBKEY,
        "fee_config": accounts[12], "fee_program": accounts[13],
    }


def _pumpfun_migrate(data, accounts):
    # pumpfun/parser.rs:315-353
    if len(accounts) < 24:
        return None
    names = ["global", "withdraw_authority", "mint", "bonding_curve",
             "associated_bonding_curve", "user", "system_program",
             "token_program", "pump_amm", "pool", "pool_authority",
             "pool_authority_mint_account", "pool_authority_wsol_account",
             "amm_global_config", "wsol_mint", "lp_mint",
             "user_pool_token_account", "pool_base_token_account",
             "pool_quote_token_account", "token_2022_program",
             "associated_token_program", "pump_amm_event_authority",
             "event_authority", "program"]
    return {k: accounts[i] for i, k in enumerate(names)}


def _pumpswap_buy(data, accounts):
    # pumpswap/parser.rs:132-166
    if len(data) < 16 or len(accounts) < 13:
        return None
    r = _R(data)
    return {
        "base_amount_out": r.u64(), "max_quote_amount_in": r.u64(),
        "pool": accounts[0], "user": accounts[1], "base_mint": accounts[3],
        "quote_mint": accounts[4], "user_base_token_account": accounts[5],
        "user_quote_token_account": accounts[6],
        "pool_base_token_account": accounts[7],
        "pool_quote_token_account": accounts[8],
        "protocol_fee_recipient": accounts[9],
        "protocol_fee_recipient_token_account": accounts[10],
        "base_token_program": accounts[11], "quote_token_program": accounts[12],
        "coin_creator_vault_ata": _acc(accounts, 17) or ZERO_PUBKEY,
        "coin_creator_vault_authority": _acc(accounts, 18) or ZERO_PUBKEY,
    }


def _pumpswap_sell(data, accounts):
    # pumpswap/parser.rs:169-203
    if len(data) < 16 or len(accounts) < 13:
        return None
    r = _R(data)
    out = _pumpswap_buy(data, accounts)
    return {
        **{k: v for k, v in out.items()
           if k not in ("base_amount_out", "max_quote_amount_in")},
        "base_amount_in": r.u64(), "min_quote_amount_out": _R(data, 8).u64(),
    }


def _pumpswap_create_pool(data, accounts):
    # pumpswap/parser.rs:206-244
    if len(data) < 18 or len(accounts) < 11:
        return None
    r = _R(data)
    index = r.u16()
    base_amount_in = r.u64()
    quote_amount_in = r.u64()
    coin_creator = _R(data, 18).pk() if len(data) >= 50 else ZERO_PUBKEY
    return {
        "index": index, "base_amount_in": base_amount_in,
        "quote_amount_in": quote_amount_in, "coin_creator": coin_creator,
        "pool": accounts[0], "creator": accounts[2], "base_mint": accounts[3],
        "quote_mint": accounts[4], "lp_mint": accounts[5],
        "user_base_token_account": accounts[6],
        "user_quote_token_account": accounts[7],
        "user_pool_token_account": accounts[8],
        "pool_base_token_account": accounts[9],
        "pool_quote_token_account": accounts[10],
    }


def _pumpswap_deposit(data, accounts):
    # pumpswap/parser.rs:247-278
    if len(data) < 24 or len(accounts) < 11:
        return None
    r = _R(data)
    return {
        "lp_token_amount_out": r.u64(), "max_base_amount_in": r.u64(),
        "max_quote_amount_in": r.u64(),
        "pool": accounts[0], "user": accounts[2], "base_mint": accounts[3],
        "quote_mint": accounts[4], "user_base_token_account": accounts[6],
        "user_quote_token_account": accounts[7],
        "user_pool_token_account": accounts[8],
        "pool_base_token_account": accounts[9],
        "pool_quote_token_account": accounts[10],
    }


def _pumpswap_withdraw(data, accounts):
    # pumpswap/parser.rs:281-312
    if len(data) < 24 or len(accounts) < 11:
        return None
    r = _R(data)
    out = _pumpswap_deposit(data, accounts)
    return {
        **{k: v for k, v in out.items()
           if k not in ("lp_token_amount_out", "max_base_amount_in",
                        "max_quote_amount_in")},
        "lp_token_amount_in": r.u64(), "min_base_amount_out": _R(data, 8).u64(),
        "min_quote_amount_out": _R(data, 16).u64(),
    }


_BONK_TRADE_ACCOUNTS = {
    "payer": 0, "global_config": 2, "platform_config": 3, "pool_state": 4,
    "user_base_token": 5, "user_quote_token": 6, "base_vault": 7,
    "quote_vault": 8, "base_token_mint": 9, "quote_token_mint": 10,
    "base_token_program": 11, "quote_token_program": 12,
    "system_program": 15, "platform_associated_account": 16,
    "creator_associated_account": 17,
}


def _bonk_trade(data, accounts, exact_in: bool, direction: str):
    # bonk/parser.rs:136-294 (4 variants share the account layout)
    if len(data) < 16 or len(accounts) < 18:
        return None
    r = _R(data)
    a, b, share = r.u64(), r.u64(), r.u64()
    if a is None or b is None or share is None:  # read_u64_le(data,16)? gate
        return None
    out = {k: accounts[i] for k, i in _BONK_TRADE_ACCOUNTS.items()}
    out["share_fee_rate"] = share
    out["trade_direction"] = direction
    if exact_in:
        out["amount_in"], out["minimum_amount_out"] = a, b
    else:
        out["amount_out"], out["maximum_amount_in"] = a, b
    return out


def _bonk_mint_curve_vesting(r: _R):
    # bonk/parser.rs:414-516
    decimals = r.u8()
    name, symbol, uri = r.borsh_str(), r.borsh_str(), r.borsh_str()
    if decimals is None or name is None or symbol is None or uri is None:
        return None
    curve_tag = r.u8()
    if curve_tag == 0:
        curve = {"curve_type": "Constant", "curve_supply": r.u64(),
                 "curve_total_base_sell": r.u64(),
                 "curve_total_quote_fund_raising": r.u64(),
                 "curve_migrate_type": r.u8()}
    elif curve_tag in (1, 2):
        curve = {"curve_type": "Fixed" if curve_tag == 1 else "Linear",
                 "curve_supply": r.u64(),
                 "curve_total_quote_fund_raising": r.u64(),
                 "curve_migrate_type": r.u8()}
    else:
        return None
    if any(v is None for v in curve.values()):
        return None
    vesting = {"vesting_total_locked_amount": r.u64(),
               "vesting_cliff_period": r.u64(),
               "vesting_unlock_period": r.u64()}
    if any(v is None for v in vesting.values()):
        return None
    return {"base_mint_param_decimals": decimals, "base_mint_param_name": name,
            "base_mint_param_symbol": symbol, "base_mint_param_uri": uri,
            **curve, **vesting}


def _bonk_initialize(data, accounts, version: str):
    # bonk/parser.rs:297-411
    if len(data) < 24 or len(accounts) < 10:
        return None
    r = _R(data)
    params = _bonk_mint_curve_vesting(r)
    if params is None:
        return None
    out = {
        **params,
        "payer": accounts[0], "creator": accounts[1],
        "global_config": accounts[2], "platform_config": accounts[3],
        "pool_state": accounts[5], "base_mint": accounts[6],
        "quote_mint": accounts[7], "base_vault": accounts[8],
        "quote_vault": accounts[9],
    }
    if version in ("v2", "t22"):
        fee_on = r.u8()
        if fee_on is None:
            return None
        out["amm_fee_on"] = "QuoteToken" if fee_on == 0 else "BothToken"
    return out


def _bonk_migrate_to_amm(data, accounts):
    # bonk/parser.rs:519-573
    if len(data) < 17 or len(accounts) < 32:
        return None
    r = _R(data)
    names = ["payer", "base_mint", "quote_mint", "openbook_program", "market",
             "request_queue", "event_queue", "bids", "asks",
             "market_vault_signer", "market_base_vault", "market_quote_vault",
             "amm_program", "amm_pool", "amm_authority", "amm_open_orders",
             "amm_lp_mint", "amm_base_vault", "amm_quote_vault",
             "amm_target_orders", "amm_config", "amm_create_fee_destination",
             "authority", "pool_state", "global_config", "base_vault",
             "quote_vault", "pool_lp_token", "spl_token_program",
             "associated_token_program", "system_program", "rent_program"]
    return {
        "base_lot_size": r.u64(), "quote_lot_size": r.u64(),
        "market_vault_signer_nonce": r.u8(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _bonk_migrate_to_cpswap(data, accounts):
    # bonk/parser.rs:576-616
    if len(accounts) < 28:
        return None
    names = ["payer", "base_mint", "quote_mint", "platform_config",
             "cpswap_program", "cpswap_pool", "cpswap_authority",
             "cpswap_lp_mint", "cpswap_base_vault", "cpswap_quote_vault",
             "cpswap_config", "cpswap_create_pool_fee", "cpswap_observation",
             "lock_program", "lock_authority", "lock_lp_vault", "authority",
             "pool_state", "global_config", "base_vault", "quote_vault",
             "pool_lp_token", "base_token_program", "quote_token_program",
             "associated_token_program", "system_program", "rent_program",
             "metadata_program"]
    return {
        **{k: accounts[i] for i, k in enumerate(names)},
        "remaining_accounts": list(accounts[28:]),
    }


def _cpmm_swap(data, accounts, base_input: bool):
    # raydium_cpmm/parser.rs:176-244
    if len(data) < 16 or len(accounts) < 13:
        return None
    r = _R(data)
    a, b = r.u64(), r.u64()
    out = {
        "payer": accounts[0], "authority": accounts[1],
        "amm_config": accounts[2], "pool_state": accounts[3],
        "input_token_account": accounts[4], "output_token_account": accounts[5],
        "input_vault": accounts[6], "output_vault": accounts[7],
        "input_token_program": accounts[8], "output_token_program": accounts[9],
        "input_token_mint": accounts[10], "output_token_mint": accounts[11],
        "observation_state": accounts[12],
    }
    if base_input:
        out["amount_in"], out["minimum_amount_out"] = a, b
    else:
        out["max_amount_in"], out["amount_out"] = a, b
    return out


def _cpmm_deposit(data, accounts):
    # raydium_cpmm/parser.rs:144-173
    if len(data) < 24 or len(accounts) < 13:
        return None
    r = _R(data)
    names = ["owner", "authority", "pool_state", "owner_lp_token",
             "token0_account", "token1_account", "token0_vault",
             "token1_vault", "token_program", "token_program2022",
             "vault0_mint", "vault1_mint", "lp_mint"]
    return {
        "lp_token_amount": r.u64(), "maximum_token0_amount": r.u64(),
        "maximum_token1_amount": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _cpmm_initialize(data, accounts):
    # raydium_cpmm/parser.rs:105-141
    if len(data) < 24 or len(accounts) < 20:
        return None
    r = _R(data)
    names = ["creator", "amm_config", "authority", "pool_state",
             "token0_mint", "token1_mint", "lp_mint", "creator_token0",
             "creator_token1", "creator_lp_token", "token0_vault",
             "token1_vault", "create_pool_fee", "observation_state",
             "token_program", "token0_program", "token1_program",
             "associated_token_program", "system_program", "rent"]
    return {
        "init_amount0": r.u64(), "init_amount1": r.u64(),
        "open_time": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _cpmm_withdraw(data, accounts):
    # raydium_cpmm/parser.rs:72-102
    if len(data) < 24 or len(accounts) < 14:
        return None
    r = _R(data)
    names = ["owner", "authority", "pool_state", "owner_lp_token",
             "token0_account", "token1_account", "token0_vault",
             "token1_vault", "token_program", "token_program2022",
             "vault0_mint", "vault1_mint", "lp_mint", "memo_program"]
    return {
        "lp_token_amount": r.u64(), "minimum_token0_amount": r.u64(),
        "minimum_token1_amount": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _clmm_swap(data, accounts):
    # raydium_clmm/parser.rs:307-341
    if len(data) < 33 or len(accounts) < 10:
        return None
    r = _R(data)
    names = ["payer", "amm_config", "pool_state", "input_token_account",
             "output_token_account", "input_vault", "output_vault",
             "observation_state", "token_program", "tick_array"]
    return {
        "amount": r.u64(), "other_amount_threshold": r.u64(),
        "sqrt_price_limit_x64": r.u128(), "is_base_input": r.u8() == 1,
        **{k: accounts[i] for i, k in enumerate(names)},
        "remaining_accounts": list(accounts[10:]),
    }


def _clmm_swap_v2(data, accounts):
    # raydium_clmm/parser.rs:343-380
    if len(data) < 33 or len(accounts) < 13:
        return None
    r = _R(data)
    names = ["payer", "amm_config", "pool_state", "input_token_account",
             "output_token_account", "input_vault", "output_vault",
             "observation_state", "token_program", "token_program2022",
             "memo_program", "input_vault_mint", "output_vault_mint"]
    return {
        "amount": r.u64(), "other_amount_threshold": r.u64(),
        "sqrt_price_limit_x64": r.u128(), "is_base_input": r.u8() == 1,
        **{k: accounts[i] for i, k in enumerate(names)},
        "remaining_accounts": list(accounts[13:]),
    }


def _clmm_close_position(data, accounts):
    # raydium_clmm/parser.rs:285-304
    if len(accounts) < 6:
        return None
    names = ["nft_owner", "position_nft_mint", "position_nft_account",
             "personal_position", "system_program", "token_program"]
    return {k: accounts[i] for i, k in enumerate(names)}


def _read_option_bool(r: _R):
    # common/utils.rs:60-72
    tag = r.u8()
    if tag is None:
        return None, False
    if tag == 0:
        return None, True
    v = r.u8()
    if v is None:
        return None, False
    return v != 0, True


def _clmm_increase_liquidity_v2(data, accounts):
    # raydium_clmm/parser.rs:183-215
    if len(data) < 34 or len(accounts) < 15:
        return None
    r = _R(data)
    liquidity = r.u128()
    a0, a1 = r.u64(), r.u64()
    base_flag, ok = _read_option_bool(r)
    if not ok:
        return None
    names = ["nft_owner", "nft_account", "pool_state", "protocol_position",
             "personal_position", "tick_array_lower", "tick_array_upper",
             "token_account0", "token_account1", "token_vault0",
             "token_vault1", "token_program", "token_program2022",
             "vault0_mint", "vault1_mint"]
    return {
        "liquidity": liquidity, "amount0_max": a0, "amount1_max": a1,
        "base_flag": base_flag,
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _clmm_decrease_liquidity_v2(data, accounts):
    # raydium_clmm/parser.rs:249-282
    if len(data) < 32 or len(accounts) < 16:
        return None
    r = _R(data)
    names = ["nft_owner", "nft_account", "personal_position", "pool_state",
             "protocol_position", "token_vault0", "token_vault1",
             "tick_array_lower", "tick_array_upper",
             "recipient_token_account0", "recipient_token_account1",
             "token_program", "token_program2022", "memo_program",
             "vault0_mint", "vault1_mint"]
    return {
        "liquidity": r.u128(), "amount0_min": r.u64(), "amount1_min": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
        "remaining_accounts": list(accounts[16:]),
    }


def _clmm_create_pool(data, accounts):
    # raydium_clmm/parser.rs:218-246
    if len(data) < 24 or len(accounts) < 13:
        return None
    r = _R(data)
    names = ["pool_creator", "amm_config", "pool_state", "token_mint0",
             "token_mint1", "token_vault0", "token_vault1",
             "observation_state", "tick_array_bitmap", "token_program0",
             "token_program1", "system_program", "rent"]
    return {
        "sqrt_price_x64": r.u128(), "open_time": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _clmm_open_position(data, accounts, with_t22: bool):
    # raydium_clmm/parser.rs:88-180
    need = 20 if with_t22 else 22
    if len(data) < 51 or len(accounts) < need:
        return None
    r = _R(data)
    head = {
        "tick_lower_index": r.i32(), "tick_upper_index": r.i32(),
        "tick_array_lower_start_index": r.i32(),
        "tick_array_upper_start_index": r.i32(),
        "liquidity": r.u128(), "amount0_max": r.u64(), "amount1_max": r.u64(),
        "with_metadata": r.u8() == 1,
    }
    base_flag, ok = _read_option_bool(r)
    if not ok:
        return None
    head["base_flag"] = base_flag
    if with_t22:
        names = ["payer", "position_nft_owner", "position_nft_mint",
                 "position_nft_account", "pool_state", "protocol_position",
                 "tick_array_lower", "tick_array_upper", "personal_position",
                 "token_account0", "token_account1", "token_vault0",
                 "token_vault1", "rent", "system_program", "token_program",
                 "associated_token_program", "token_program2022",
                 "vault0_mint", "vault1_mint"]
        return {**head, **{k: accounts[i] for i, k in enumerate(names)}}
    names = ["payer", "position_nft_owner", "position_nft_mint",
             "position_nft_account", "metadata_account", "pool_state",
             "protocol_position", "tick_array_lower", "tick_array_upper",
             "personal_position", "token_account0", "token_account1",
             "token_vault0", "token_vault1", "rent", "system_program",
             "token_program", "associated_token_program", "metadata_program",
             "token_program2022", "vault0_mint", "vault1_mint"]
    return {**head, **{k: accounts[i] for i, k in enumerate(names)},
            "remaining_accounts": list(accounts[22:])}


_AMMV4_SWAP_ACCOUNTS = [
    "token_program", "amm", "amm_authority", "amm_open_orders",
    "amm_target_orders", "pool_coin_token_account", "pool_pc_token_account",
    "serum_program", "serum_market", "serum_bids", "serum_asks",
    "serum_event_queue", "serum_coin_vault_account",
    "serum_pc_vault_account", "serum_vault_signer",
    "user_source_token_account", "user_destination_token_account",
    "user_source_owner"]


def _ammv4_swap(data, accounts, base_in: bool):
    # raydium_amm_v4/parser.rs:232-327 (17-account form inserts a default
    # amm_target_orders placeholder at index 4)
    if len(data) < 16 or len(accounts) < 17:
        return None
    r = _R(data)
    a, b = r.u64(), r.u64()
    accs = list(accounts)
    if len(accs) == 17:
        accs.insert(4, ZERO_PUBKEY)
    out = {k: accs[i] for i, k in enumerate(_AMMV4_SWAP_ACCOUNTS)}
    if base_in:
        out["amount_in"], out["minimum_amount_out"] = a, b
    else:
        out["max_amount_in"], out["amount_out"] = a, b
    return out


def _ammv4_deposit(data, accounts):
    # raydium_amm_v4/parser.rs:194-229
    if len(data) < 24 or len(accounts) < 14:
        return None
    r = _R(data)
    names = ["token_program", "amm", "amm_authority", "amm_open_orders",
             "amm_target_orders", "lp_mint_address",
             "pool_coin_token_account", "pool_pc_token_account",
             "serum_market", "user_coin_token_account",
             "user_pc_token_account", "user_lp_token_account", "user_owner",
             "serum_event_queue"]
    return {
        "max_coin_amount": r.u64(), "max_pc_amount": r.u64(),
        "base_side": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _ammv4_initialize2(data, accounts):
    # raydium_amm_v4/parser.rs:147-191
    if len(data) < 25 or len(accounts) < 21:
        return None
    r = _R(data)
    names = ["token_program", "spl_associated_token_account",
             "system_program", "rent", "amm", "amm_authority",
             "amm_open_orders", "lp_mint", "coin_mint", "pc_mint",
             "pool_coin_token_account", "pool_pc_token_account",
             "pool_withdraw_queue", "amm_target_orders", "pool_temp_lp",
             "serum_program", "serum_market", "user_wallet",
             "user_token_coin", "user_token_pc", "user_lp_token_account"]
    return {
        "nonce": r.u8(), "open_time": r.u64(), "init_pc_amount": r.u64(),
        "init_coin_amount": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _ammv4_withdraw(data, accounts):
    # raydium_amm_v4/parser.rs:105-144
    if len(data) < 8 or len(accounts) < 22:
        return None
    names = ["token_program", "amm", "amm_authority", "amm_open_orders",
             "amm_target_orders", "lp_mint_address",
             "pool_coin_token_account", "pool_pc_token_account",
             "pool_withdraw_queue", "pool_temp_lp_token_account",
             "serum_program", "serum_market", "serum_coin_vault_account",
             "serum_pc_vault_account", "serum_vault_signer",
             "user_lp_token_account", "user_coin_token_account",
             "user_pc_token_account", "user_owner", "serum_event_queue",
             "serum_bids", "serum_asks"]
    return {"amount": _R(data).u64(),
            **{k: accounts[i] for i, k in enumerate(names)}}


def _ammv4_withdraw_pnl(data, accounts):
    # raydium_amm_v4/parser.rs:71-102
    if len(accounts) < 17:
        return None
    names = ["token_program", "amm", "amm_config", "amm_authority",
             "amm_open_orders", "pool_coin_token_account",
             "pool_pc_token_account", "coin_pnl_token_account",
             "pc_pnl_token_account", "pnl_owner_account",
             "amm_target_orders", "serum_program", "serum_market",
             "serum_event_queue", "serum_coin_vault_account",
             "serum_pc_vault_account", "serum_vault_signer"]
    return {k: accounts[i] for i, k in enumerate(names)}


def _meteora_swap(data, accounts):
    # meteora_damm_v2/parser.rs:60-95
    if len(data) < 16 or len(accounts) < 14:
        return None
    r = _R(data)
    names = ["pool_authority", "pool", "input_token_account",
             "output_token_account", "token_a_vault", "token_b_vault",
             "token_a_mint", "token_b_mint", "payer", "token_a_program",
             "token_b_program", "referral_token_account", "event_authority",
             "program"]
    return {
        "amount_0": r.u64(), "amount_1": r.u64(),
        **{k: accounts[i] for i, k in enumerate(names)},
    }


def _meteora_swap2(data, accounts):
    # meteora_damm_v2/parser.rs:98-144
    if len(data) < 17 or len(accounts) < 14:
        return None
    r = _R(data)
    amount_0, amount_1, swap_mode = r.u64(), r.u64(), r.u8()
    has_referral = len(accounts) >= 15
    out = {
        "amount_0": amount_0, "amount_1": amount_1, "swap_mode": swap_mode,
        "has_referral": has_referral,
        "pool_authority": accounts[0], "pool": accounts[1],
        "input_token_account": accounts[2], "output_token_account": accounts[3],
        "token_a_vault": accounts[4], "token_b_vault": accounts[5],
        "token_a_mint": accounts[6], "token_b_mint": accounts[7],
        "payer": accounts[8], "token_a_program": accounts[9],
        "token_b_program": accounts[10],
        "referral_token_account": accounts[11] if has_referral else None,
        "event_authority": accounts[12 if has_referral else 11],
        "program": accounts[13 if has_referral else 12],
        "sysvar": accounts[14 if has_referral else 13],
    }
    return out


def _meteora_pool_fees(r: _R):
    # meteora_damm_v2/events.rs:8-35 (borsh)
    out = {
        "base_fee_cliff_fee_numerator": r.u64(),
        "base_fee_first_factor": r.u16(),
        "base_fee_second_factor": r.u64(),  # [u8;8] read little-endian
        "base_fee_third_factor": r.u64(),
        "base_fee_mode": r.u8(),
    }
    if r._take(3) is None:  # padding [u8;3]
        return None
    tag = r.u8()
    if tag is None or tag > 1:
        return None
    if tag == 1:
        out.update({
            "dynamic_fee_bin_step": r.u16(),
            "dynamic_fee_bin_step_u128": r.u128(),
            "dynamic_fee_filter_period": r.u16(),
            "dynamic_fee_decay_period": r.u16(),
            "dynamic_fee_reduction_factor": r.u16(),
            "dynamic_fee_max_volatility_accumulator": r.u32(),
            "dynamic_fee_variable_fee_control": r.u32(),
        })
    if any(v is None for v in out.values()):
        return None
    return out


def _meteora_initialize_pool(data, accounts):
    # meteora_damm_v2/parser.rs:147-208
    if len(accounts) < 20 or len(data) < 33:
        return None
    r = _R(data)
    liquidity, sqrt_price = r.u128(), r.u128()
    tag = r.u8()
    if tag == 1 and len(data) >= r.o + 8:
        r.u64()  # activation_point read but unused (parser.rs:177-181)
    return {
        "liquidity": liquidity, "sqrt_price": sqrt_price,
        "creator": accounts[0], "position_nft_mint": accounts[1],
        "position_nft_account": accounts[2], "payer": accounts[3],
        "config": accounts[4], "pool_authority": accounts[5],
        "pool": accounts[6], "position": accounts[7],
        "token_a_mint": accounts[8], "token_b_mint": accounts[9],
        "token_a_vault": accounts[10], "token_b_vault": accounts[11],
        "payer_token_a": accounts[12], "payer_token_b": accounts[13],
        "token_a_program": accounts[14], "token_b_program": accounts[15],
        "event_authority": accounts[18], "program": accounts[19],
        "remaining_accounts": list(accounts[20:]),
    }


def _meteora_init_custom_tail(r: _R):
    vals = {
        "sqrt_min_price": r.u128(), "sqrt_max_price": r.u128(),
        "_has_alpha": r.u8(),
        "liquidity": r.u128(), "sqrt_price": r.u128(),
        "activation_type": r.u8(), "collect_fee_mode": r.u8(),
    }
    if any(v is None for v in vals.values()):
        return None
    vals.pop("_has_alpha")
    return vals


def _meteora_initialize_customizable_pool(data, accounts):
    # meteora_damm_v2/parser.rs:211-315
    if len(accounts) < 19 or len(data) < 99:
        return None
    r = _R(data)
    fees = _meteora_pool_fees(r)
    if fees is None:
        return None
    tail = _meteora_init_custom_tail(r)
    if tail is None:
        return None
    return {
        **fees, **tail,
        "creator": accounts[0], "position_nft_mint": accounts[1],
        "position_nft_account": accounts[2], "payer": accounts[3],
        "pool_authority": accounts[4], "pool": accounts[5],
        "position": accounts[6], "token_a_mint": accounts[7],
        "token_b_mint": accounts[8], "token_a_vault": accounts[9],
        "token_b_vault": accounts[10], "payer_token_a": accounts[11],
        "payer_token_b": accounts[12], "token_a_program": accounts[13],
        "token_b_program": accounts[14], "token_2022_program": accounts[15],
        "system_program": accounts[16], "event_authority": accounts[17],
        "program": accounts[18],
        "remaining_accounts": list(accounts[19:]),
    }


def _meteora_initialize_pool_dynamic(data, accounts):
    # meteora_damm_v2/parser.rs:318-419
    if len(accounts) < 21 or len(data) < 99:
        return None
    r = _R(data)
    fees = _meteora_pool_fees(r)
    if fees is None:
        return None
    tail = _meteora_init_custom_tail(r)
    if tail is None:
        return None
    return {
        **fees, **tail,
        "creator": accounts[0], "position_nft_mint": accounts[1],
        "position_nft_account": accounts[2], "payer": accounts[3],
        "pool_creator_authority": accounts[4], "config": accounts[5],
        "pool_authority": accounts[6], "pool": accounts[7],
        "position": accounts[8], "token_a_mint": accounts[9],
        "token_b_mint": accounts[10], "token_a_vault": accounts[11],
        "token_b_vault": accounts[12], "payer_token_a": accounts[13],
        "payer_token_b": accounts[14], "token_a_program": accounts[15],
        "token_b_program": accounts[16], "token_2022_program": accounts[17],
        "system_program": accounts[18], "event_authority": accounts[19],
        "program": accounts[20],
    }


INSTRUCTION_DECODERS = {
    "PumpFunCreateToken": _pumpfun_create,
    "PumpFunCreateV2Token": _pumpfun_create,
    "PumpFunBuy": _pumpfun_buy,
    "PumpFunSell": _pumpfun_sell,
    "PumpFunMigrate": _pumpfun_migrate,
    "PumpSwapBuy": _pumpswap_buy,
    "PumpSwapSell": _pumpswap_sell,
    "PumpSwapCreatePool": _pumpswap_create_pool,
    "PumpSwapDeposit": _pumpswap_deposit,
    "PumpSwapWithdraw": _pumpswap_withdraw,
    "BonkBuyExactIn": lambda d, a: _bonk_trade(d, a, True, "Buy"),
    "BonkBuyExactOut": lambda d, a: _bonk_trade(d, a, False, "Buy"),
    "BonkSellExactIn": lambda d, a: _bonk_trade(d, a, True, "Sell"),
    "BonkSellExactOut": lambda d, a: _bonk_trade(d, a, False, "Sell"),
    "BonkInitialize": lambda d, a: _bonk_initialize(d, a, "v1"),
    "BonkInitializeV2": lambda d, a: _bonk_initialize(d, a, "v2"),
    "BonkInitializeWithToken2022": lambda d, a: _bonk_initialize(d, a, "t22"),
    "BonkMigrateToAmm": _bonk_migrate_to_amm,
    "BonkMigrateToCpswap": _bonk_migrate_to_cpswap,
    "RaydiumCpmmSwapBaseInput": lambda d, a: _cpmm_swap(d, a, True),
    "RaydiumCpmmSwapBaseOutput": lambda d, a: _cpmm_swap(d, a, False),
    "RaydiumCpmmDeposit": _cpmm_deposit,
    "RaydiumCpmmInitialize": _cpmm_initialize,
    "RaydiumCpmmWithdraw": _cpmm_withdraw,
    "RaydiumClmmSwap": _clmm_swap,
    "RaydiumClmmSwapV2": _clmm_swap_v2,
    "RaydiumClmmClosePosition": _clmm_close_position,
    "RaydiumClmmIncreaseLiquidityV2": _clmm_increase_liquidity_v2,
    "RaydiumClmmDecreaseLiquidityV2": _clmm_decrease_liquidity_v2,
    "RaydiumClmmCreatePool": _clmm_create_pool,
    "RaydiumClmmOpenPositionWithToken22Nft": lambda d, a: _clmm_open_position(d, a, True),
    "RaydiumClmmOpenPositionV2": lambda d, a: _clmm_open_position(d, a, False),
    "RaydiumAmmV4SwapBaseIn": lambda d, a: _ammv4_swap(d, a, True),
    "RaydiumAmmV4SwapBaseOut": lambda d, a: _ammv4_swap(d, a, False),
    "RaydiumAmmV4Deposit": _ammv4_deposit,
    "RaydiumAmmV4Initialize2": _ammv4_initialize2,
    "RaydiumAmmV4Withdraw": _ammv4_withdraw,
    "RaydiumAmmV4WithdrawPnl": _ammv4_withdraw_pnl,
    "MeteoraDammV2Swap": _meteora_swap,
    "MeteoraDammV2Swap2": _meteora_swap2,
    "MeteoraDammV2InitializePool": _meteora_initialize_pool,
    "MeteoraDammV2InitializeCustomizablePool": _meteora_initialize_customizable_pool,
    "MeteoraDammV2InitializePoolWithDynamicConfig": _meteora_initialize_pool_dynamic,
}


# ===========================================================================
# CPI-log decoders: fn(payload_after_16B_disc) -> dict | None
# ===========================================================================

def _cpi_pumpfun_create(data):
    # pumpfun/events.rs:59-180 (hand decoder; trailing bytes tolerated)
    r = _R(data)
    out = {
        "name": r.borsh_str(), "symbol": r.borsh_str(), "uri": r.borsh_str(),
        "mint": r.pk(), "bonding_curve": r.pk(), "user": r.pk(),
        "creator": r.pk(), "timestamp": r.i64(),
        "virtual_token_reserves": r.u64(), "virtual_sol_reserves": r.u64(),
        "real_token_reserves": r.u64(), "token_total_supply": r.u64(),
    }
    if any(v is None for v in out.values()):
        return None
    if len(data) >= r.o + 33:  # optional V2 tail (events.rs:154-161)
        out["token_program"] = r.pk()
        out["is_mayhem_mode"] = r.u8() == 1
    else:
        out["token_program"] = ZERO_PUBKEY
        out["is_mayhem_mode"] = False
    return out


def _cpi_pumpfun_trade(data):
    # pumpfun/events.rs:253-260 — borsh prefix, exactly 250 bytes
    if len(data) < 250:
        return None
    r = _R(data)
    out = {
        "mint": r.pk(), "sol_amount": r.u64(), "token_amount": r.u64(),
        "is_buy": r.borsh_bool(), "user": r.pk(), "timestamp": r.i64(),
        "virtual_sol_reserves": r.u64(), "virtual_token_reserves": r.u64(),
        "real_sol_reserves": r.u64(), "real_token_reserves": r.u64(),
        "fee_recipient": r.pk(), "fee_basis_points": r.u64(), "fee": r.u64(),
        "creator": r.pk(), "creator_fee_basis_points": r.u64(),
        "creator_fee": r.u64(), "track_volume": r.borsh_bool(),
        "total_unclaimed_tokens": r.u64(), "total_claimed_tokens": r.u64(),
        "current_sol_volume": r.u64(), "last_update_timestamp": r.i64(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpfun_migrate(data):
    # pumpfun/events.rs:318-325 — exactly 160 bytes
    if len(data) < 160:
        return None
    r = _R(data)
    out = {
        "user": r.pk(), "mint": r.pk(), "mint_amount": r.u64(),
        "sol_amount": r.u64(), "pool_migration_fee": r.u64(),
        "bonding_curve": r.pk(), "timestamp": r.i64(), "pool": r.pk(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpswap_buy(data):
    # pumpswap/events.rs:59-66 — exactly 385 bytes
    if len(data) < 385:
        return None
    r = _R(data)
    out = {
        "timestamp": r.i64(), "base_amount_out": r.u64(),
        "max_quote_amount_in": r.u64(), "user_base_token_reserves": r.u64(),
        "user_quote_token_reserves": r.u64(),
        "pool_base_token_reserves": r.u64(),
        "pool_quote_token_reserves": r.u64(), "quote_amount_in": r.u64(),
        "lp_fee_basis_points": r.u64(), "lp_fee": r.u64(),
        "protocol_fee_basis_points": r.u64(), "protocol_fee": r.u64(),
        "quote_amount_in_with_lp_fee": r.u64(),
        "user_quote_amount_in": r.u64(), "pool": r.pk(), "user": r.pk(),
        "user_base_token_account": r.pk(), "user_quote_token_account": r.pk(),
        "protocol_fee_recipient": r.pk(),
        "protocol_fee_recipient_token_account": r.pk(),
        "coin_creator": r.pk(), "coin_creator_fee_basis_points": r.u64(),
        "coin_creator_fee": r.u64(), "track_volume": r.borsh_bool(),
        "total_unclaimed_tokens": r.u64(), "total_claimed_tokens": r.u64(),
        "current_sol_volume": r.u64(), "last_update_timestamp": r.i64(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpswap_sell(data):
    # pumpswap/events.rs:114-121 — exactly 352 bytes
    if len(data) < 352:
        return None
    r = _R(data)
    out = {
        "timestamp": r.i64(), "base_amount_in": r.u64(),
        "min_quote_amount_out": r.u64(), "user_base_token_reserves": r.u64(),
        "user_quote_token_reserves": r.u64(),
        "pool_base_token_reserves": r.u64(),
        "pool_quote_token_reserves": r.u64(), "quote_amount_out": r.u64(),
        "lp_fee_basis_points": r.u64(), "lp_fee": r.u64(),
        "protocol_fee_basis_points": r.u64(), "protocol_fee": r.u64(),
        "quote_amount_out_without_lp_fee": r.u64(),
        "user_quote_amount_out": r.u64(), "pool": r.pk(), "user": r.pk(),
        "user_base_token_account": r.pk(), "user_quote_token_account": r.pk(),
        "protocol_fee_recipient": r.pk(),
        "protocol_fee_recipient_token_account": r.pk(),
        "coin_creator": r.pk(), "coin_creator_fee_basis_points": r.u64(),
        "coin_creator_fee": r.u64(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpswap_create_pool(data):
    # pumpswap/events.rs:156-163 — exactly 325 bytes
    if len(data) < 325:
        return None
    r = _R(data)
    out = {
        "timestamp": r.i64(), "index": r.u16(), "creator": r.pk(),
        "base_mint": r.pk(), "quote_mint": r.pk(),
        "base_mint_decimals": r.u8(), "quote_mint_decimals": r.u8(),
        "base_amount_in": r.u64(), "quote_amount_in": r.u64(),
        "pool_base_amount": r.u64(), "pool_quote_amount": r.u64(),
        "minimum_liquidity": r.u64(), "initial_liquidity": r.u64(),
        "lp_token_amount_out": r.u64(), "pool_bump": r.u8(), "pool": r.pk(),
        "lp_mint": r.pk(), "user_base_token_account": r.pk(),
        "user_quote_token_account": r.pk(), "coin_creator": r.pk(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpswap_deposit(data):
    # pumpswap/events.rs:196-203 — exactly 248 bytes
    if len(data) < 248:
        return None
    r = _R(data)
    out = {
        "timestamp": r.i64(), "lp_token_amount_out": r.u64(),
        "max_base_amount_in": r.u64(), "max_quote_amount_in": r.u64(),
        "user_base_token_reserves": r.u64(),
        "user_quote_token_reserves": r.u64(),
        "pool_base_token_reserves": r.u64(),
        "pool_quote_token_reserves": r.u64(), "base_amount_in": r.u64(),
        "quote_amount_in": r.u64(), "lp_mint_supply": r.u64(),
        "pool": r.pk(), "user": r.pk(), "user_base_token_account": r.pk(),
        "user_quote_token_account": r.pk(), "user_pool_token_account": r.pk(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


def _cpi_pumpswap_withdraw(data):
    # pumpswap/events.rs:236-243 — exactly 248 bytes
    if len(data) < 248:
        return None
    r = _R(data)
    out = {
        "timestamp": r.i64(), "lp_token_amount_in": r.u64(),
        "min_base_amount_out": r.u64(), "min_quote_amount_out": r.u64(),
        "user_base_token_reserves": r.u64(),
        "user_quote_token_reserves": r.u64(),
        "pool_base_token_reserves": r.u64(),
        "pool_quote_token_reserves": r.u64(), "base_amount_out": r.u64(),
        "quote_amount_out": r.u64(), "lp_mint_supply": r.u64(),
        "pool": r.pk(), "user": r.pk(), "user_base_token_account": r.pk(),
        "user_quote_token_account": r.pk(), "user_pool_token_account": r.pk(),
    }
    if any(v is None for v in out.values()):
        return None
    return out


_TRADE_DIRECTIONS = {0: "Buy", 1: "Sell"}          # bonk/types.rs:17-21
_POOL_STATUS = {0: "Fund", 1: "Migrate", 2: "Trade"}  # bonk/types.rs:23-29


def _cpi_bonk_trade(data):
    # bonk/events.rs:74-81 — borsh, exactly 139 bytes
    if len(data) < 139:
        return None
    r = _R(data)
    out = {
        "pool_state": r.pk(), "total_base_sell": r.u64(),
        "virtual_base": r.u64(), "virtual_quote": r.u64(),
        "real_base_before": r.u64(), "real_quote_before": r.u64(),
        "real_base_after": r.u64(), "real_quote_after": r.u64(),
        "amount_in": r.u64(), "amount_out": r.u64(), "protocol_fee": r.u64(),
        "platform_fee": r.u64(), "creator_fee": r.u64(), "share_fee": r.u64(),
    }
    td, ps = r.u8(), r.u8()
    exact_in = r.borsh_bool()
    if any(v is None for v in out.values()) or exact_in is None \
            or td not in _TRADE_DIRECTIONS or ps not in _POOL_STATUS:
        return None
    out["trade_direction"] = _TRADE_DIRECTIONS[td]
    out["pool_status"] = _POOL_STATUS[ps]
    out["exact_in"] = exact_in
    return out


def _cpi_bonk_pool_create(data):
    # bonk/events.rs:111-118 — borsh::from_slice(&data[..256]): the struct
    # must consume exactly 256 bytes (variable-size strings => only
    # exactly-256-byte encodings decode; trailing bytes are an error).
    if len(data) < 256:
        return None
    r = _R(data[:256])
    head = {"pool_state": r.pk(), "creator": r.pk(), "config": r.pk()}
    if any(v is None for v in head.values()):
        return None
    params = _bonk_mint_curve_vesting(r)
    if params is None:
        return None
    tag = r.u8()
    if tag is None or tag > 1:
        return None
    amm_fee_on = None
    if tag == 1:
        v = r.u8()
        if v is None or v > 1:
            return None
        amm_fee_on = "QuoteToken" if v == 0 else "BothToken"
    if r.o != 256:  # borsh exact-consumption rule
        return None
    return {**head, **params, "amm_fee_on": amm_fee_on}


def _cpi_meteora_swap(data):
    # meteora_damm_v2/events.rs:403-409 — borsh prefix, exactly 180 bytes
    if len(data) < 180:
        return None
    r = _R(data)
    out = {
        "pool": r.pk(), "trade_direction": None, "collect_fee_mode": None,
    }
    td = r.u8()
    cfm = r.u8()
    has_ref = r.borsh_bool()
    out2 = {
        "amount_0": r.u64(), "amount_1": r.u64(), "swap_mode": r.u8(),
        "included_fee_input_amount": r.u64(),
        "excluded_fee_input_amount": r.u64(), "amount_left": r.u64(),
        "output_amount": r.u64(), "next_sqrt_price": r.u128(),
        "trading_fee": r.u64(), "protocol_fee": r.u64(),
        "partner_fee": r.u64(), "referral_fee": r.u64(),
        "included_transfer_fee_amount_in": r.u64(),
        "included_transfer_fee_amount_out": r.u64(),
        "excluded_transfer_fee_amount_out": r.u64(),
        "current_timestamp": r.u64(), "reserve_a_amount": r.u64(),
        "reserve_b_amount": r.u64(),
    }
    if out["pool"] is None or td is None or cfm is None or has_ref is None \
            or any(v is None for v in out2.values()):
        return None
    # Meteora's trade_direction is a raw u8 (events.rs:45); stored as its
    # decimal string in the shared trade_direction column ("0"/"1").
    return {"pool": out["pool"], "trade_direction": str(td),
            "collect_fee_mode": cfm, "has_referral": has_ref, **out2}


def _cpi_meteora_init_pool(data):
    # meteora_damm_v2/events.rs:413-417 — borsh over the FULL payload
    # (exact consumption, no fixed slice)
    r = _R(data)
    head = {
        "pool": r.pk(), "token_a_mint": r.pk(), "token_b_mint": r.pk(),
        "creator": r.pk(), "payer": r.pk(), "alpha_vault": r.pk(),
    }
    fees = _meteora_pool_fees(r)
    tail = {
        "sqrt_min_price": r.u128(), "sqrt_max_price": r.u128(),
        "activation_type": r.u8(), "collect_fee_mode": r.u8(),
        "liquidity": r.u128(), "sqrt_price": r.u128(),
        "activation_point": r.u64(), "token_a_flag": r.u8(),
        "token_b_flag": r.u8(), "token_a_amount": r.u64(),
        "token_b_amount": r.u64(), "total_amount_a": r.u64(),
        "total_amount_b": r.u64(), "pool_type": r.u8(),
    }
    if any(v is None for v in head.values()) or fees is None \
            or any(v is None for v in tail.values()) or r.o != len(data):
        return None
    return {**head, **fees, **tail}


CPI_DECODERS = {
    "pumpfun_create": _cpi_pumpfun_create,
    "pumpfun_trade": _cpi_pumpfun_trade,
    "pumpfun_migrate": _cpi_pumpfun_migrate,
    "pumpswap_buy": _cpi_pumpswap_buy,
    "pumpswap_sell": _cpi_pumpswap_sell,
    "pumpswap_create_pool": _cpi_pumpswap_create_pool,
    "pumpswap_deposit": _cpi_pumpswap_deposit,
    "pumpswap_withdraw": _cpi_pumpswap_withdraw,
    "bonk_trade": _cpi_bonk_trade,
    "bonk_pool_create": _cpi_bonk_pool_create,
    "meteora_swap": _cpi_meteora_swap,
    "meteora_init_pool": _cpi_meteora_init_pool,
}


def decode_cpi_with_f8(kind: str, payload: bytes, instruction_event_type: str,
                       decoders: dict | None = None):
    """Decode a CPI payload, applying the F8 direction-consistency rule for
    Bonk trades (bonk/parser.rs:115-133): a trade CPI whose direction
    contradicts the instruction's Buy*/Sell* type is treated as no-match.

    ``decoders`` overrides the module registry — the decode stage passes
    its driver-captured snapshot so plug-in CPI kinds resolve on
    executors (plans/pipeline.py:_decode_tables)."""
    decoder = (CPI_DECODERS if decoders is None else decoders).get(kind)
    if decoder is None:
        return None
    out = decoder(payload)
    if out is None:
        return None
    if kind == "bonk_trade":
        if instruction_event_type in BONK_BUY_TYPES \
                and out["trade_direction"] != "Buy":
            return None
        if instruction_event_type in BONK_SELL_TYPES \
                and out["trade_direction"] != "Sell":
            return None
    return out


def decode_compute_budget(data: bytes):
    # core/common_event_parser.rs:47-82 — 1-byte discriminator
    if not data:
        return None
    if data[0] == 2 and len(data) >= 5:
        return "SetComputeUnitLimit", {
            "units": int.from_bytes(data[1:5], "little")}
    if data[0] == 3 and len(data) >= 9:
        return "SetComputeUnitPrice", {
            "micro_lamports": int.from_bytes(data[1:9], "little")}
    return None
