"""Fixture generator: golden-first corpus for the event pipeline.

Constructs event scenarios as dicts, hand-ENCODES them into transaction
byte layouts (independent of the package's decoders — the pipeline must
round-trip them back), and writes:

  /root/repo/fixtures/raw_transactions.parquet  (FIXTURES.md §1 schema)
  /root/repo/fixtures/events_golden.parquet     (FIXTURES.md §4, flattened)

Deterministic: per-scenario name-derived seeds (see main()). Run:
python tests/gen_fixtures.py

Goldens reuse registry metadata (MERGE_SPECS field lists) for assembly but
never the decode/scan code, so pipeline bugs cannot leak into goldens.
"""

from __future__ import annotations

import os
import random
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_event_stream_spark.operators.decode import b58encode  # noqa: E402
from solana_event_stream_spark.registry import (  # noqa: E402
    BONK_PROGRAM_ID, COMPUTE_BUDGET_PROGRAM_ID, MERGE_SPECS,
    METEORA_DAMM_V2_PROGRAM_ID, PROGRAM_ID_BY_PROTOCOL, PUMPFUN_PROGRAM_ID,
    PUMPSWAP_PROGRAM_ID, RAYDIUM_AMM_V4_PROGRAM_ID, RAYDIUM_CLMM_PROGRAM_ID,
    RAYDIUM_CPMM_PROGRAM_ID, SOL_MINT, SYSTEM_PROGRAMS, ZERO_PUBKEY)

rng = random.Random(42)

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")

SPL_TOKEN = SYSTEM_PROGRAMS[0]
SYSTEM_PROGRAM = SYSTEM_PROGRAMS[2]


def pk() -> str:
    return b58encode(bytes(rng.getrandbits(8) for _ in range(32)))


def sig() -> str:
    return b58encode(bytes(rng.getrandbits(8) for _ in range(64)))


def u64(v): return struct.pack("<Q", v)
def u32(v): return struct.pack("<I", v)
def u16(v): return struct.pack("<H", v)
def u128(v): return v.to_bytes(16, "little")
def i64(v): return struct.pack("<q", v)
def i32(v): return struct.pack("<i", v)
def u8(v): return struct.pack("<B", v)
def pkb(s):
    from solana_event_stream_spark.operators.decode import b58decode
    return b58decode(s)
def s_(s): return u32(len(s.encode())) + s.encode()


ANCHOR = bytes([228, 69, 165, 46, 81, 203, 154, 29])

IX_DISC = {
    "PumpFunCreateToken": bytes([24, 30, 200, 40, 5, 28, 7, 119]),
    "PumpFunCreateV2Token": bytes([214, 144, 76, 236, 95, 139, 49, 180]),
    "PumpFunBuy": bytes([102, 6, 61, 18, 1, 218, 235, 234]),
    "PumpFunSell": bytes([51, 230, 133, 164, 1, 127, 131, 173]),
    "PumpFunMigrate": bytes([155, 234, 231, 146, 236, 158, 162, 30]),
    "PumpSwapBuy": bytes([102, 6, 61, 18, 1, 218, 235, 234]),
    "PumpSwapSell": bytes([51, 230, 133, 164, 1, 127, 131, 173]),
    "PumpSwapCreatePool": bytes([233, 146, 209, 142, 207, 104, 64, 188]),
    "PumpSwapDeposit": bytes([242, 35, 198, 137, 82, 225, 242, 182]),
    "PumpSwapWithdraw": bytes([183, 18, 70, 156, 148, 109, 161, 34]),
    "BonkBuyExactIn": bytes([250, 234, 13, 123, 213, 156, 19, 236]),
    "BonkBuyExactOut": bytes([24, 211, 116, 40, 105, 3, 153, 56]),
    "BonkSellExactIn": bytes([149, 39, 222, 155, 211, 124, 152, 26]),
    "BonkSellExactOut": bytes([95, 200, 71, 34, 8, 9, 11, 166]),
    "BonkInitialize": bytes([175, 175, 109, 31, 13, 152, 155, 237]),
    "BonkInitializeV2": bytes([67, 153, 175, 39, 218, 16, 38, 32]),
    "BonkInitializeWithToken2022": bytes([37, 190, 126, 222, 44, 154, 171, 17]),
    "BonkMigrateToAmm": bytes([207, 82, 192, 145, 254, 207, 145, 223]),
    "BonkMigrateToCpswap": bytes([136, 92, 200, 103, 28, 218, 144, 140]),
    "RaydiumCpmmSwapBaseInput": bytes([143, 190, 90, 218, 196, 30, 51, 222]),
    "RaydiumCpmmSwapBaseOutput": bytes([55, 217, 98, 86, 163, 74, 180, 173]),
    "RaydiumCpmmDeposit": bytes([242, 35, 198, 137, 82, 225, 242, 182]),
    "RaydiumCpmmInitialize": bytes([175, 175, 109, 31, 13, 152, 155, 237]),
    "RaydiumCpmmWithdraw": bytes([183, 18, 70, 156, 148, 109, 161, 34]),
    "RaydiumClmmSwap": bytes([248, 198, 158, 145, 225, 117, 135, 200]),
    "RaydiumClmmSwapV2": bytes([43, 4, 237, 11, 26, 201, 30, 98]),
    "RaydiumClmmClosePosition": bytes([123, 134, 81, 0, 49, 68, 98, 98]),
    "RaydiumClmmIncreaseLiquidityV2": bytes([133, 29, 89, 223, 69, 238, 176, 10]),
    "RaydiumClmmDecreaseLiquidityV2": bytes([58, 127, 188, 62, 79, 82, 196, 96]),
    "RaydiumClmmCreatePool": bytes([233, 146, 209, 142, 207, 104, 64, 188]),
    "RaydiumClmmOpenPositionWithToken22Nft": bytes([77, 255, 174, 82, 125, 29, 201, 46]),
    "RaydiumClmmOpenPositionV2": bytes([77, 184, 74, 214, 112, 86, 241, 199]),
    "RaydiumAmmV4SwapBaseIn": bytes([9]),
    "RaydiumAmmV4SwapBaseOut": bytes([11]),
    "RaydiumAmmV4Deposit": bytes([3]),
    "RaydiumAmmV4Initialize2": bytes([1]),
    "RaydiumAmmV4Withdraw": bytes([4]),
    "RaydiumAmmV4WithdrawPnl": bytes([7]),
    "MeteoraDammV2Swap": bytes.fromhex("f8c69e91e17587c8"),
    "MeteoraDammV2Swap2": bytes.fromhex("414b3f4ceb5b5b88"),
    "MeteoraDammV2InitializeCustomizablePool": bytes.fromhex("14a1f118bdddb402"),
    "MeteoraDammV2InitializePool": bytes.fromhex("5fb40aac54aee828"),
    "MeteoraDammV2InitializePoolWithDynamicConfig": bytes.fromhex("955248c5fdfc440f"),
}

CPI_DISC = {
    "pumpfun_create": ANCHOR + bytes([27, 114, 169, 77, 222, 235, 99, 118]),
    "pumpfun_trade": ANCHOR + bytes([189, 219, 127, 211, 78, 230, 97, 238]),
    "pumpfun_migrate": ANCHOR + bytes([189, 233, 93, 185, 92, 148, 234, 148]),
    "pumpswap_buy": ANCHOR + bytes([103, 244, 82, 31, 44, 245, 119, 119]),
    "pumpswap_sell": ANCHOR + bytes([62, 47, 55, 10, 165, 3, 220, 42]),
    "pumpswap_create_pool": ANCHOR + bytes([177, 49, 12, 210, 160, 118, 167, 116]),
    "pumpswap_deposit": ANCHOR + bytes([120, 248, 61, 83, 31, 142, 107, 144]),
    "pumpswap_withdraw": ANCHOR + bytes([22, 9, 133, 26, 160, 44, 71, 192]),
    "bonk_trade": ANCHOR + bytes([189, 219, 127, 211, 78, 230, 97, 238]),
    "bonk_pool_create": ANCHOR + bytes([151, 215, 226, 9, 118, 161, 115, 174]),
    "meteora_swap": ANCHOR + bytes.fromhex("bd4233a826507599"),
    "meteora_init_pool": ANCHOR + bytes.fromhex("e432f655cb428625"),
}

# ---------------------------------------------------------------------------
# Scenario assembly helpers
# ---------------------------------------------------------------------------

TXS: list[dict] = []
GOLDEN: list[dict] = []
_slot = 1000
_recv = 1_700_000_000_000_000

BLOCK_TIME_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
BLOCK_TIME_MS = BLOCK_TIME_US // 1000


def new_tx(accounts, instructions, inner=None, is_vote=False, source="grpc",
           block_time_us=BLOCK_TIME_US, extra_writable=None,
           extra_readonly=None):
    global _slot, _recv
    _slot += 1
    _recv += 1000
    tx = {
        "slot": _slot,
        "transaction_index": len(TXS) % 7,
        "block_time": block_time_us,
        "signature": sig(),
        "is_vote": is_vote,
        "recv_us": _recv,
        "static_account_keys": accounts,
        "loaded_writable_addresses": extra_writable or [],
        "loaded_readonly_addresses": extra_readonly or [],
        "instructions": instructions,
        "inner_instructions": inner or [],
        "source": source,
    }
    TXS.append(tx)
    return tx


def ix(prog_idx, acct_idxs, data):
    return {"program_id_index": prog_idx, "account_indices": acct_idxs,
            "data": data}


def golden(tx, event_type, protocol, program_id, outer_index, inner_index,
           payload, swap=None, is_dev=None, is_bot=None):
    row = {
        "signature": tx["signature"], "slot": tx["slot"],
        "transaction_index": tx["transaction_index"],
        "block_time": tx["block_time"],
        "block_time_ms": (tx["block_time"] // 1000) if tx["block_time"]
        is not None else 0,
        "recv_us": tx["recv_us"], "protocol": protocol,
        "event_type": event_type, "program_id": program_id,
        "outer_index": outer_index, "inner_index": inner_index,
        "swap_from_mint": swap["from_mint"] if swap else None,
        "swap_to_mint": swap["to_mint"] if swap else None,
        "swap_from_amount": swap["from_amount"] if swap else None,
        "swap_to_amount": swap["to_amount"] if swap else None,
        "swap_description": swap.get("description") if swap else None,
        "is_dev_create_token_trade": is_dev, "is_bot": is_bot,
    }
    row.update(payload)
    GOLDEN.append(row)
    return row


def merged(ix_payload: dict, cpi_payload: dict, event_type: str) -> dict:
    """Apply the merge spec field list (registry data, not pipeline code)."""
    spec = MERGE_SPECS.get(event_type)
    out = dict(ix_payload)
    if spec:
        for fld in spec[1]:
            if fld in cpi_payload:
                out[fld] = cpi_payload[fld]
    return out


def spl_transfer(src_idx, dst_idx, amount, prog_idx, checked=False,
                 mint_idx=0):
    """Encode an SPL transfer (tag 3) or transferChecked (tag 12)."""
    if checked:
        return ix(prog_idx, [src_idx, mint_idx, dst_idx, dst_idx],
                  bytes([12]) + u64(amount) + u8(9))
    return ix(prog_idx, [src_idx, dst_idx, dst_idx],
              bytes([3]) + u64(amount) + b"\x00" * 3)


def system_transfer(src_idx, dst_idx, lamports, prog_idx):
    return ix(prog_idx, [src_idx, dst_idx], u32(2) + u64(lamports))


BOT_WALLET = pk()

# ===========================================================================
# PumpFun scenarios
# ===========================================================================

def scenario_pumpfun_trades():
    # -- buy with CPI trade log + SPL transfers for J2 + compute budget
    user = pk()
    mint = pk()
    accts = [user, pk(), mint, pk(), pk(), pk(), pk(), pk(), pk(), pk(),
             pk(), pk(), pk(), pk(), pk(), pk()]
    # buy account order (pumpfun/parser.rs:239-274): global, fee_recipient,
    # mint, bonding_curve, abc, assoc_user, user, sys, token, creator_vault,
    # event_auth, program, gva, uva, fee_config, fee_program
    buy_accounts = [pk(), pk(), mint, pk(), pk(), pk(), user, SYSTEM_PROGRAM,
                    SPL_TOKEN, pk(), pk(), pk(), pk(), pk(), pk(), pk()]
    tx_accounts = list(buy_accounts) + [PUMPFUN_PROGRAM_ID,
                                        COMPUTE_BUDGET_PROGRAM_ID]
    pf_i, cu_i = 16, 17
    cpi = {
        "mint": mint, "sol_amount": 1_000_000_000, "token_amount": 50_000,
        "is_buy": True, "user": user, "timestamp": 1704067200,
        "virtual_sol_reserves": 30_000_000_000,
        "virtual_token_reserves": 1_000_000_000_000,
        "real_sol_reserves": 20_000_000_000,
        "real_token_reserves": 800_000_000_000,
        "fee_recipient": buy_accounts[1], "fee_basis_points": 100,
        "fee": 10_000_000, "creator": pk(), "creator_fee_basis_points": 50,
        "creator_fee": 5_000_000, "track_volume": True,
        "total_unclaimed_tokens": 1, "total_claimed_tokens": 2,
        "current_sol_volume": 3, "last_update_timestamp": 1704067100,
    }
    cpi_bytes = (CPI_DISC["pumpfun_trade"] + pkb(cpi["mint"])
                 + u64(cpi["sol_amount"]) + u64(cpi["token_amount"])
                 + u8(1) + pkb(cpi["user"]) + i64(cpi["timestamp"])
                 + u64(cpi["virtual_sol_reserves"])
                 + u64(cpi["virtual_token_reserves"])
                 + u64(cpi["real_sol_reserves"])
                 + u64(cpi["real_token_reserves"])
                 + pkb(cpi["fee_recipient"]) + u64(cpi["fee_basis_points"])
                 + u64(cpi["fee"]) + pkb(cpi["creator"])
                 + u64(cpi["creator_fee_basis_points"])
                 + u64(cpi["creator_fee"]) + u8(1)
                 + u64(cpi["total_unclaimed_tokens"])
                 + u64(cpi["total_claimed_tokens"])
                 + u64(cpi["current_sol_volume"])
                 + i64(cpi["last_update_timestamp"]))
    assert len(cpi_bytes) == 16 + 250
    # Realistic inner ordering: transfers first, CPI event log last — the
    # J2 scan breaks at the first non-system program (types.rs:461-465),
    # i.e. at the log.
    inner = [{
        "index": 1,
        "instructions": [
            system_transfer(6, 3, 999, 7),  # accounts[7] == system program
            ix(pf_i, [], cpi_bytes),
        ],
    }]
    tx = new_tx(tx_accounts, [
        ix(cu_i, [], bytes([2]) + u32(400_000)),
        ix(pf_i, list(range(16)), IX_DISC["PumpFunBuy"] + u64(50_000) + u64(2_000_000_000)),
    ], inner)
    golden(tx, "SetComputeUnitLimit", "Common", COMPUTE_BUDGET_PROGRAM_ID,
           0, None, {"units": 400_000})
    ix_payload = {
        "amount": 50_000, "max_sol_cost": 2_000_000_000, "is_buy": True,
        "global": buy_accounts[0], "fee_recipient": buy_accounts[1],
        "mint": mint, "bonding_curve": buy_accounts[3],
        "associated_bonding_curve": buy_accounts[4],
        "associated_user": buy_accounts[5], "user": user,
        "system_program": SYSTEM_PROGRAM, "token_program": SPL_TOKEN,
        "creator_vault": buy_accounts[9], "event_authority": buy_accounts[10],
        "program": buy_accounts[11],
        "global_volume_accumulator": buy_accounts[12],
        "user_volume_accumulator": buy_accounts[13],
        "fee_config": buy_accounts[14], "fee_program": buy_accounts[15],
    }
    payload = merged(ix_payload, cpi, "PumpFunBuy")
    # J2: pumpfun sets mints directly; P11 fills amounts from sol/token
    swap = {"from_mint": SOL_MINT, "to_mint": mint,
            "from_amount": cpi["sol_amount"], "to_amount": cpi["token_amount"],
            "description": None}
    golden(tx, "PumpFunBuy", "PumpFun", PUMPFUN_PROGRAM_ID, 1, None,
           payload, swap=swap, is_dev=False, is_bot=False)

    # -- sell without CPI, no inner group => no swap_data
    sell_accounts = [pk(), pk(), mint, pk(), pk(), pk(), BOT_WALLET,
                     SYSTEM_PROGRAM, pk(), SPL_TOKEN, pk(), pk(), pk(), pk()]
    tx2_accounts = sell_accounts + [PUMPFUN_PROGRAM_ID]
    tx2 = new_tx(tx2_accounts, [
        ix(14, list(range(14)), IX_DISC["PumpFunSell"] + u64(7_000) + u64(10)),
    ])
    golden(tx2, "PumpFunSell", "PumpFun", PUMPFUN_PROGRAM_ID, 0, None, {
        "amount": 7_000, "min_sol_output": 10, "is_buy": False,
        "global": sell_accounts[0], "fee_recipient": sell_accounts[1],
        "mint": mint, "bonding_curve": sell_accounts[3],
        "associated_bonding_curve": sell_accounts[4],
        "associated_user": sell_accounts[5], "user": BOT_WALLET,
        "system_program": SYSTEM_PROGRAM, "creator_vault": sell_accounts[8],
        "token_program": SPL_TOKEN, "event_authority": sell_accounts[10],
        "program": sell_accounts[11],
        "global_volume_accumulator": ZERO_PUBKEY,
        "user_volume_accumulator": ZERO_PUBKEY,
        "fee_config": sell_accounts[12], "fee_program": sell_accounts[13],
    }, is_dev=False, is_bot=True)


def scenario_pumpfun_create_and_dev_trade():
    user = pk()
    creator = pk()
    mint = pk()
    create_accounts = [mint, pk(), pk(), pk(), pk(), pk(), pk(), user,
                       pk(), pk(), pk()]
    trade_accounts = [pk(), pk(), mint, pk(), pk(), pk(), user,
                      SYSTEM_PROGRAM, SPL_TOKEN, pk(), pk(), pk(), pk(),
                      pk(), pk(), pk()]
    tx_accounts = create_accounts + trade_accounts + [PUMPFUN_PROGRAM_ID]
    pf_i = len(tx_accounts) - 1
    create_data = (IX_DISC["PumpFunCreateToken"] + s_("MyTok") + s_("MTK")
                   + s_("https://x.test/meta.json") + pkb(creator))
    cpi_create = {
        "name": "MyTok", "symbol": "MTK", "uri": "https://x.test/meta.json",
        "mint": mint, "bonding_curve": create_accounts[2], "user": user,
        "creator": creator, "timestamp": 1704067201,
        "virtual_token_reserves": 1_000_000_000_000,
        "virtual_sol_reserves": 30_000_000_000,
        "real_token_reserves": 790_000_000_000,
        "token_total_supply": 1_000_000_000_000,
        "token_program": SPL_TOKEN, "is_mayhem_mode": False,
    }
    cpi_create_bytes = (CPI_DISC["pumpfun_create"] + s_(cpi_create["name"])
                        + s_(cpi_create["symbol"]) + s_(cpi_create["uri"])
                        + pkb(mint) + pkb(cpi_create["bonding_curve"])
                        + pkb(user) + pkb(creator)
                        + i64(cpi_create["timestamp"])
                        + u64(cpi_create["virtual_token_reserves"])
                        + u64(cpi_create["virtual_sol_reserves"])
                        + u64(cpi_create["real_token_reserves"])
                        + u64(cpi_create["token_total_supply"])
                        + pkb(SPL_TOKEN) + u8(0))
    inner = [{"index": 0, "instructions": [ix(pf_i, [], cpi_create_bytes)]}]
    tx = new_tx(tx_accounts, [
        ix(pf_i, list(range(11)), create_data),
        ix(pf_i, list(range(11, 27)),
           IX_DISC["PumpFunBuy"] + u64(111) + u64(222)),
    ], inner)
    ix_payload = {
        "name": "MyTok", "symbol": "MTK", "uri": "https://x.test/meta.json",
        "creator": creator, "mint": mint,
        "mint_authority": create_accounts[1],
        "bonding_curve": create_accounts[2],
        "associated_bonding_curve": create_accounts[3], "user": user,
    }
    payload = merged(ix_payload, cpi_create, "PumpFunCreateToken")
    golden(tx, "PumpFunCreateToken", "PumpFun", PUMPFUN_PROGRAM_ID, 0, None,
           payload)
    # trade by the same user in the same signature -> dev trade (J3).
    # outer ix 1 has no inner group -> no CPI merge, no swap data.
    golden(tx, "PumpFunBuy", "PumpFun", PUMPFUN_PROGRAM_ID, 1, None, {
        "amount": 111, "max_sol_cost": 222, "is_buy": True,
        "global": trade_accounts[0], "fee_recipient": trade_accounts[1],
        "mint": mint, "bonding_curve": trade_accounts[3],
        "associated_bonding_curve": trade_accounts[4],
        "associated_user": trade_accounts[5], "user": user,
        "system_program": SYSTEM_PROGRAM, "token_program": SPL_TOKEN,
        "creator_vault": trade_accounts[9],
        "event_authority": trade_accounts[10], "program": trade_accounts[11],
        "global_volume_accumulator": trade_accounts[12],
        "user_volume_accumulator": trade_accounts[13],
        "fee_config": trade_accounts[14], "fee_program": trade_accounts[15],
    }, is_dev=True, is_bot=False)


def scenario_pumpfun_migrate():
    # with CPI -> kept; without CPI -> dropped (F9)
    user, mint = pk(), pk()
    accounts = [pk() for _ in range(24)] + [PUMPFUN_PROGRAM_ID]
    pf_i = 24
    cpi = {
        "user": user, "mint": mint, "mint_amount": 5, "sol_amount": 6,
        "pool_migration_fee": 7, "bonding_curve": pk(),
        "timestamp": 1704067202, "pool": pk(),
    }
    cpi_bytes = (CPI_DISC["pumpfun_migrate"] + pkb(user) + pkb(mint)
                 + u64(5) + u64(6) + u64(7) + pkb(cpi["bonding_curve"])
                 + i64(cpi["timestamp"]) + pkb(cpi["pool"]))
    assert len(cpi_bytes) == 16 + 160
    inner = [{"index": 0, "instructions": [ix(pf_i, [], cpi_bytes)]}]
    tx = new_tx(accounts, [
        ix(pf_i, list(range(24)), IX_DISC["PumpFunMigrate"]),
        ix(pf_i, list(range(24)), IX_DISC["PumpFunMigrate"]),  # no CPI: drop
    ], inner)
    names = ["global", "withdraw_authority", "mint", "bonding_curve",
             "associated_bonding_curve", "user", "system_program",
             "token_program", "pump_amm", "pool", "pool_authority",
             "pool_authority_mint_account", "pool_authority_wsol_account",
             "amm_global_config", "wsol_mint", "lp_mint",
             "user_pool_token_account", "pool_base_token_account",
             "pool_quote_token_account", "token_2022_program",
             "associated_token_program", "pump_amm_event_authority",
             "event_authority", "program"]
    ix_payload = {k: accounts[i] for i, k in enumerate(names)}
    golden(tx, "PumpFunMigrate", "PumpFun", PUMPFUN_PROGRAM_ID, 0, None,
           merged(ix_payload, cpi, "PumpFunMigrate"))


# ===========================================================================
# Bonk scenarios
# ===========================================================================

def _bonk_trade_accounts():
    return [pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(),
            pk(), SPL_TOKEN, SPL_TOKEN, pk(), pk(), SYSTEM_PROGRAM, pk(), pk()]


def _bonk_trade_ix_payload(accounts):
    return {
        "payer": accounts[0], "global_config": accounts[2],
        "platform_config": accounts[3], "pool_state": accounts[4],
        "user_base_token": accounts[5], "user_quote_token": accounts[6],
        "base_vault": accounts[7], "quote_vault": accounts[8],
        "base_token_mint": accounts[9], "quote_token_mint": accounts[10],
        "base_token_program": accounts[11],
        "quote_token_program": accounts[12],
        "system_program": accounts[15],
        "platform_associated_account": accounts[16],
        "creator_associated_account": accounts[17],
    }


def _bonk_cpi(direction: str, exact_in: bool, pool_state: str):
    return {
        "pool_state": pool_state, "total_base_sell": 100, "virtual_base": 200,
        "virtual_quote": 300, "real_base_before": 400,
        "real_quote_before": 500, "real_base_after": 600,
        "real_quote_after": 700, "amount_in": 123_456, "amount_out": 654_321,
        "protocol_fee": 11, "platform_fee": 12, "creator_fee": 13,
        "share_fee": 14, "trade_direction": direction,
        "pool_status": "Trade", "exact_in": exact_in,
    }


def _bonk_cpi_bytes(c):
    td = {"Buy": 0, "Sell": 1}[c["trade_direction"]]
    ps = {"Fund": 0, "Migrate": 1, "Trade": 2}[c["pool_status"]]
    return (CPI_DISC["bonk_trade"] + pkb(c["pool_state"])
            + u64(c["total_base_sell"]) + u64(c["virtual_base"])
            + u64(c["virtual_quote"]) + u64(c["real_base_before"])
            + u64(c["real_quote_before"]) + u64(c["real_base_after"])
            + u64(c["real_quote_after"]) + u64(c["amount_in"])
            + u64(c["amount_out"]) + u64(c["protocol_fee"])
            + u64(c["platform_fee"]) + u64(c["creator_fee"])
            + u64(c["share_fee"]) + u8(td) + u8(ps)
            + u8(1 if c["exact_in"] else 0))


def scenario_bonk_trades():
    # buy exact-in with matching CPI + J2 transfers
    accounts = _bonk_trade_accounts()
    tx_accounts = accounts + [BONK_PROGRAM_ID]
    bk_i = 18
    cpi = _bonk_cpi("Buy", True, accounts[4])
    inner = [{"index": 0, "instructions": [
        # user_quote_token(6) -> quote_vault(8): from=quote (case 1)
        spl_transfer(6, 8, 123_456, 11),
        # base_vault(7) -> user_base_token(5): to=base (case 2)
        spl_transfer(7, 5, 654_321, 11),
        ix(bk_i, [], _bonk_cpi_bytes(cpi)),  # CPI log last
    ]}]
    tx = new_tx(tx_accounts, [
        ix(bk_i, list(range(18)),
           IX_DISC["BonkBuyExactIn"] + u64(123_456) + u64(600_000) + u64(25)),
    ], inner)
    ix_payload = {
        **_bonk_trade_ix_payload(accounts),
        "amount_in": 123_456, "minimum_amount_out": 600_000,
        "share_fee_rate": 25, "trade_direction": "Buy",
    }
    payload = merged(ix_payload, cpi, "BonkBuyExactIn")
    # J2 semantics (types.rs:491-517): user_quote->quote_vault matches case
    # (user_to_token, to_vault) -> from_mint=to_mint(quote), from_amount;
    # base_vault->user_base matches (from_vault, user_from_token) ->
    # to_mint=from_mint(base), to_amount.
    swap = {"from_mint": accounts[10], "to_mint": accounts[9],
            "from_amount": 123_456, "to_amount": 654_321,
            "description": None}
    golden(tx, "BonkBuyExactIn", "Bonk", BONK_PROGRAM_ID, 0, None, payload,
           swap=swap, is_dev=False, is_bot=False)

    # sell exact-out whose CPI has contradicting direction (Buy) -> F8:
    # CPI ignored, instruction-only event emitted
    accounts2 = _bonk_trade_accounts()
    tx2_accounts = accounts2 + [BONK_PROGRAM_ID]
    cpi_bad = _bonk_cpi("Buy", False, accounts2[4])
    inner2 = [{"index": 0, "instructions": [
        ix(18, [], _bonk_cpi_bytes(cpi_bad))]}]
    tx2 = new_tx(tx2_accounts, [
        ix(18, list(range(18)),
           IX_DISC["BonkSellExactOut"] + u64(9_999) + u64(10_000) + u64(0)),
    ], inner2)
    golden(tx2, "BonkSellExactOut", "Bonk", BONK_PROGRAM_ID, 0, None, {
        **_bonk_trade_ix_payload(accounts2),
        "amount_out": 9_999, "maximum_amount_in": 10_000,
        "share_fee_rate": 0, "trade_direction": "Sell",
    }, is_dev=False, is_bot=False)


def scenario_bonk_initialize_and_dev():
    creator = pk()
    accounts = [pk(), creator, pk(), pk(), pk(), pk(), pk(), pk(), pk(),
                pk()] + [BONK_PROGRAM_ID]
    bk_i = 10
    mint_params = (u8(6) + s_("BonkTok") + s_("BT") + s_("u://b"))
    curve = u8(0) + u64(1_000) + u64(2_000) + u64(3_000) + u8(1)
    vesting = u64(10) + u64(20) + u64(30)
    data = IX_DISC["BonkInitializeV2"] + mint_params + curve + vesting + u8(1)

    # CPI pool-create log must encode to EXACTLY 256 bytes
    # (bonk/events.rs:111-118). fixed = 96 + 1 + 3*4 + len(strs) + curve
    # (1+25) + vesting 24 + option 2.
    name, symbol = "BonkTok", "BT"
    fixed = 96 + 1 + 4 + len(name) + 4 + len(symbol) + 4 + 26 + 24 + 2
    uri = "u" * (256 - fixed)
    cpi = {
        "pool_state": pk(), "creator": creator, "config": pk(),
        "base_mint_param_decimals": 6, "base_mint_param_name": name,
        "base_mint_param_symbol": symbol, "base_mint_param_uri": uri,
        "curve_type": "Constant", "curve_supply": 1_000,
        "curve_total_base_sell": 2_000,
        "curve_total_quote_fund_raising": 3_000, "curve_migrate_type": 1,
        "vesting_total_locked_amount": 10, "vesting_cliff_period": 20,
        "vesting_unlock_period": 30, "amm_fee_on": "QuoteToken",
    }
    cpi_bytes = (CPI_DISC["bonk_pool_create"] + pkb(cpi["pool_state"])
                 + pkb(creator) + pkb(cpi["config"]) + u8(6) + s_(name)
                 + s_(symbol) + s_(uri) + u8(0) + u64(1_000) + u64(2_000)
                 + u64(3_000) + u8(1) + u64(10) + u64(20) + u64(30)
                 + u8(1) + u8(0))
    assert len(cpi_bytes) == 16 + 256, len(cpi_bytes)

    trade_accounts = _bonk_trade_accounts()
    trade_accounts[0] = creator  # payer == pool creator -> dev trade
    all_accounts = accounts + trade_accounts
    inner = [{"index": 0, "instructions": [ix(bk_i, [], cpi_bytes)]}]
    tx = new_tx(all_accounts, [
        ix(bk_i, list(range(10)), data),
        ix(bk_i, list(range(11, 29)),
           IX_DISC["BonkSellExactIn"] + u64(77) + u64(88) + u64(99)),
    ], inner)
    ix_payload = {
        "payer": accounts[0], "creator": creator,
        "global_config": accounts[2], "platform_config": accounts[3],
        "pool_state": accounts[5], "base_mint": accounts[6],
        "quote_mint": accounts[7], "base_vault": accounts[8],
        "quote_vault": accounts[9],
        "base_mint_param_decimals": 6, "base_mint_param_name": "BonkTok",
        "base_mint_param_symbol": "BT", "base_mint_param_uri": "u://b",
        "curve_type": "Constant", "curve_supply": 1_000,
        "curve_total_base_sell": 2_000,
        "curve_total_quote_fund_raising": 3_000, "curve_migrate_type": 1,
        "vesting_total_locked_amount": 10, "vesting_cliff_period": 20,
        "vesting_unlock_period": 30, "amm_fee_on": "BothToken",
    }
    golden(tx, "BonkInitializeV2", "Bonk", BONK_PROGRAM_ID, 0, None,
           merged(ix_payload, cpi, "BonkInitializeV2"))
    golden(tx, "BonkSellExactIn", "Bonk", BONK_PROGRAM_ID, 1, None, {
        **_bonk_trade_ix_payload(trade_accounts),
        "amount_in": 77, "minimum_amount_out": 88, "share_fee_rate": 99,
        "trade_direction": "Sell",
    }, is_dev=True, is_bot=False)


def scenario_bonk_migrations():
    accounts = [pk() for _ in range(32)] + [BONK_PROGRAM_ID]
    tx = new_tx(accounts, [
        ix(32, list(range(32)),
           IX_DISC["BonkMigrateToAmm"] + u64(41) + u64(42) + u8(43)),
    ])
    names = ["payer", "base_mint", "quote_mint", "openbook_program",
             "market", "request_queue", "event_queue", "bids", "asks",
             "market_vault_signer", "market_base_vault", "market_quote_vault",
             "amm_program", "amm_pool", "amm_authority", "amm_open_orders",
             "amm_lp_mint", "amm_base_vault", "amm_quote_vault",
             "amm_target_orders", "amm_config", "amm_create_fee_destination",
             "authority", "pool_state", "global_config", "base_vault",
             "quote_vault", "pool_lp_token", "spl_token_program",
             "associated_token_program", "system_program", "rent_program"]
    golden(tx, "BonkMigrateToAmm", "Bonk", BONK_PROGRAM_ID, 0, None, {
        "base_lot_size": 41, "quote_lot_size": 42,
        "market_vault_signer_nonce": 43,
        **{k: accounts[i] for i, k in enumerate(names)},
    })

    accounts2 = [pk() for _ in range(30)] + [BONK_PROGRAM_ID]
    tx2 = new_tx(accounts2, [
        ix(30, list(range(30)), IX_DISC["BonkMigrateToCpswap"])])
    names2 = ["payer", "base_mint", "quote_mint", "platform_config",
              "cpswap_program", "cpswap_pool", "cpswap_authority",
              "cpswap_lp_mint", "cpswap_base_vault", "cpswap_quote_vault",
              "cpswap_config", "cpswap_create_pool_fee", "cpswap_observation",
              "lock_program", "lock_authority", "lock_lp_vault", "authority",
              "pool_state", "global_config", "base_vault", "quote_vault",
              "pool_lp_token", "base_token_program", "quote_token_program",
              "associated_token_program", "system_program", "rent_program",
              "metadata_program"]
    golden(tx2, "BonkMigrateToCpswap", "Bonk", BONK_PROGRAM_ID, 0, None, {
        **{k: accounts2[i] for i, k in enumerate(names2)},
        "remaining_accounts": accounts2[28:30],
    })


# ===========================================================================
# Negative / edge scenarios
# ===========================================================================

def scenario_negatives():
    # vote tx (dropped), foreign program (no event), truncated data (F7),
    # out-of-range account indices (padding), unknown CU disc
    new_tx([pk(), PUMPFUN_PROGRAM_ID],
           [ix(1, [0], IX_DISC["PumpFunBuy"] + u64(1) + u64(2))],
           is_vote=True)
    new_tx([pk(), pk()], [ix(1, [0], b"\x01\x02\x03\x04\x05\x06\x07\x08")])
    new_tx([pk(), PUMPFUN_PROGRAM_ID],
           [ix(1, [0], IX_DISC["PumpFunBuy"] + u64(1))])  # truncated: None
    new_tx([pk(), COMPUTE_BUDGET_PROGRAM_ID], [ix(1, [], bytes([9, 1, 2]))])
    # out-of-range indices: padding resolves them to ZERO_PUBKEY; decode
    # then sees 16 accounts but guard accounts>=16 passes with defaults
    accounts = [pk(), PUMPFUN_PROGRAM_ID]
    tx = new_tx(accounts, [
        ix(1, list(range(2, 18)), IX_DISC["PumpFunSell"] + u64(3) + u64(4))])
    golden(tx, "PumpFunSell", "PumpFun", PUMPFUN_PROGRAM_ID, 0, None, {
        "amount": 3, "min_sol_output": 4, "is_buy": False,
        "global": ZERO_PUBKEY, "fee_recipient": ZERO_PUBKEY,
        "mint": ZERO_PUBKEY, "bonding_curve": ZERO_PUBKEY,
        "associated_bonding_curve": ZERO_PUBKEY,
        "associated_user": ZERO_PUBKEY, "user": ZERO_PUBKEY,
        "system_program": ZERO_PUBKEY, "creator_vault": ZERO_PUBKEY,
        "token_program": ZERO_PUBKEY, "event_authority": ZERO_PUBKEY,
        "program": ZERO_PUBKEY, "global_volume_accumulator": ZERO_PUBKEY,
        "user_volume_accumulator": ZERO_PUBKEY, "fee_config": ZERO_PUBKEY,
        "fee_program": ZERO_PUBKEY,
    }, is_dev=False, is_bot=False)
    # shred-sourced row: no block_time, no inner instructions
    accounts3 = [pk(), pk(), pk(), pk(), pk(), pk(), pk(), SYSTEM_PROGRAM,
                 SPL_TOKEN, pk(), pk(), pk(), pk(), pk(), pk(), pk(),
                 PUMPFUN_PROGRAM_ID]
    tx3 = new_tx(accounts3, [
        ix(16, list(range(16)), IX_DISC["PumpFunBuy"] + u64(5) + u64(6))],
        source="shred", block_time_us=None)
    golden(tx3, "PumpFunBuy", "PumpFun", PUMPFUN_PROGRAM_ID, 0, None, {
        "amount": 5, "max_sol_cost": 6, "is_buy": True,
        "global": accounts3[0], "fee_recipient": accounts3[1],
        "mint": accounts3[2], "bonding_curve": accounts3[3],
        "associated_bonding_curve": accounts3[4],
        "associated_user": accounts3[5], "user": accounts3[6],
        "system_program": SYSTEM_PROGRAM, "token_program": SPL_TOKEN,
        "creator_vault": accounts3[9], "event_authority": accounts3[10],
        "program": accounts3[11],
        "global_volume_accumulator": accounts3[12],
        "user_volume_accumulator": accounts3[13],
        "fee_config": accounts3[14], "fee_program": accounts3[15],
    }, is_dev=False, is_bot=False)


# ===========================================================================
# PumpSwap scenarios
# ===========================================================================

def _ps_accounts():
    # buy/sell layout (pumpswap/parser.rs:132-203): pool,user,global,
    # base_mint,quote_mint,user_base,user_quote,pool_base,pool_quote,
    # fee_recipient,fee_recipient_ata,base_prog,quote_prog + 17/18 optional
    return [pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(),
            pk(), SPL_TOKEN, SPL_TOKEN, pk(), pk(), pk(), pk(), pk(), pk()]


def _ps_buy_ix_payload(a):
    return {
        "pool": a[0], "user": a[1], "base_mint": a[3], "quote_mint": a[4],
        "user_base_token_account": a[5], "user_quote_token_account": a[6],
        "pool_base_token_account": a[7], "pool_quote_token_account": a[8],
        "protocol_fee_recipient": a[9],
        "protocol_fee_recipient_token_account": a[10],
        "base_token_program": a[11], "quote_token_program": a[12],
        "coin_creator_vault_ata": a[17], "coin_creator_vault_authority": a[18],
    }


def _ps_buy_cpi(a):
    return {
        "timestamp": 1704067300, "base_amount_out": 1_000,
        "max_quote_amount_in": 2_000, "user_base_token_reserves": 3_000,
        "user_quote_token_reserves": 4_000,
        "pool_base_token_reserves": 5_000,
        "pool_quote_token_reserves": 6_000, "quote_amount_in": 1_900,
        "lp_fee_basis_points": 20, "lp_fee": 38,
        "protocol_fee_basis_points": 5, "protocol_fee": 9,
        "quote_amount_in_with_lp_fee": 1_938, "user_quote_amount_in": 1_947,
        "pool": a[0], "user": a[1], "user_base_token_account": a[5],
        "user_quote_token_account": a[6], "protocol_fee_recipient": a[9],
        "protocol_fee_recipient_token_account": a[10], "coin_creator": pk(),
        "coin_creator_fee_basis_points": 3, "coin_creator_fee": 6,
        "track_volume": True, "total_unclaimed_tokens": 7,
        "total_claimed_tokens": 8, "current_sol_volume": 9,
        "last_update_timestamp": 1704067290,
    }


def _ps_buy_cpi_bytes(c):
    b = (CPI_DISC["pumpswap_buy"] + i64(c["timestamp"])
         + u64(c["base_amount_out"]) + u64(c["max_quote_amount_in"])
         + u64(c["user_base_token_reserves"])
         + u64(c["user_quote_token_reserves"])
         + u64(c["pool_base_token_reserves"])
         + u64(c["pool_quote_token_reserves"]) + u64(c["quote_amount_in"])
         + u64(c["lp_fee_basis_points"]) + u64(c["lp_fee"])
         + u64(c["protocol_fee_basis_points"]) + u64(c["protocol_fee"])
         + u64(c["quote_amount_in_with_lp_fee"])
         + u64(c["user_quote_amount_in"]) + pkb(c["pool"]) + pkb(c["user"])
         + pkb(c["user_base_token_account"])
         + pkb(c["user_quote_token_account"])
         + pkb(c["protocol_fee_recipient"])
         + pkb(c["protocol_fee_recipient_token_account"])
         + pkb(c["coin_creator"]) + u64(c["coin_creator_fee_basis_points"])
         + u64(c["coin_creator_fee"]) + u8(1 if c["track_volume"] else 0)
         + u64(c["total_unclaimed_tokens"]) + u64(c["total_claimed_tokens"])
         + u64(c["current_sol_volume"]) + i64(c["last_update_timestamp"]))
    assert len(b) == 16 + 385
    return b


def scenario_pumpswap_trades():
    a = _ps_accounts()
    tx_accounts = a + [PUMPSWAP_PROGRAM_ID]
    ps_i = 19
    cpi = _ps_buy_cpi(a)
    inner = [{"index": 0, "instructions": [ix(ps_i, [], _ps_buy_cpi_bytes(cpi))]}]
    tx = new_tx(tx_accounts, [
        ix(ps_i, list(range(19)),
           IX_DISC["PumpSwapBuy"] + u64(1_000) + u64(2_000))], inner)
    payload = merged({**_ps_buy_ix_payload(a), "base_amount_out": 1_000,
                      "max_quote_amount_in": 2_000}, cpi, "PumpSwapBuy")
    swap = {"from_mint": a[4], "to_mint": a[3],
            "from_amount": cpi["user_quote_amount_in"],
            "to_amount": cpi["base_amount_out"], "description": None}
    golden(tx, "PumpSwapBuy", "PumpSwap", PUMPSWAP_PROGRAM_ID, 0, None,
           payload, swap=swap)

    # sell with CPI
    a2 = _ps_accounts()
    cpi_sell = {
        "timestamp": 1704067301, "base_amount_in": 500,
        "min_quote_amount_out": 400, "user_base_token_reserves": 10,
        "user_quote_token_reserves": 20, "pool_base_token_reserves": 30,
        "pool_quote_token_reserves": 40, "quote_amount_out": 450,
        "lp_fee_basis_points": 20, "lp_fee": 1,
        "protocol_fee_basis_points": 5, "protocol_fee": 2,
        "quote_amount_out_without_lp_fee": 449, "user_quote_amount_out": 447,
        "pool": a2[0], "user": a2[1], "user_base_token_account": a2[5],
        "user_quote_token_account": a2[6], "protocol_fee_recipient": a2[9],
        "protocol_fee_recipient_token_account": a2[10], "coin_creator": pk(),
        "coin_creator_fee_basis_points": 1, "coin_creator_fee": 1,
    }
    b = (CPI_DISC["pumpswap_sell"] + i64(cpi_sell["timestamp"])
         + u64(cpi_sell["base_amount_in"])
         + u64(cpi_sell["min_quote_amount_out"])
         + u64(cpi_sell["user_base_token_reserves"])
         + u64(cpi_sell["user_quote_token_reserves"])
         + u64(cpi_sell["pool_base_token_reserves"])
         + u64(cpi_sell["pool_quote_token_reserves"])
         + u64(cpi_sell["quote_amount_out"])
         + u64(cpi_sell["lp_fee_basis_points"]) + u64(cpi_sell["lp_fee"])
         + u64(cpi_sell["protocol_fee_basis_points"])
         + u64(cpi_sell["protocol_fee"])
         + u64(cpi_sell["quote_amount_out_without_lp_fee"])
         + u64(cpi_sell["user_quote_amount_out"]) + pkb(cpi_sell["pool"])
         + pkb(cpi_sell["user"]) + pkb(cpi_sell["user_base_token_account"])
         + pkb(cpi_sell["user_quote_token_account"])
         + pkb(cpi_sell["protocol_fee_recipient"])
         + pkb(cpi_sell["protocol_fee_recipient_token_account"])
         + pkb(cpi_sell["coin_creator"])
         + u64(cpi_sell["coin_creator_fee_basis_points"])
         + u64(cpi_sell["coin_creator_fee"]))
    assert len(b) == 16 + 352
    inner2 = [{"index": 0, "instructions": [ix(19, [], b)]}]
    tx2 = new_tx(a2 + [PUMPSWAP_PROGRAM_ID], [
        ix(19, list(range(19)),
           IX_DISC["PumpSwapSell"] + u64(500) + u64(400))], inner2)
    payload2 = merged({**_ps_buy_ix_payload(a2), "base_amount_in": 500,
                       "min_quote_amount_out": 400}, cpi_sell, "PumpSwapSell")
    swap2 = {"from_mint": a2[3], "to_mint": a2[4],
             "from_amount": cpi_sell["base_amount_in"],
             "to_amount": cpi_sell["user_quote_amount_out"],
             "description": None}
    golden(tx2, "PumpSwapSell", "PumpSwap", PUMPSWAP_PROGRAM_ID, 0, None,
           payload2, swap=swap2)


def scenario_pumpswap_pool_ops():
    # create pool (50-byte data incl. coin_creator)
    a = [pk() for _ in range(11)] + [PUMPSWAP_PROGRAM_ID]
    coin_creator = pk()
    tx = new_tx(a, [ix(11, list(range(11)),
                       IX_DISC["PumpSwapCreatePool"] + u16(3) + u64(100)
                       + u64(200) + pkb(coin_creator))])
    golden(tx, "PumpSwapCreatePool", "PumpSwap", PUMPSWAP_PROGRAM_ID, 0,
           None, {
               "index": 3, "base_amount_in": 100, "quote_amount_in": 200,
               "coin_creator": coin_creator, "pool": a[0], "creator": a[2],
               "base_mint": a[3], "quote_mint": a[4], "lp_mint": a[5],
               "user_base_token_account": a[6],
               "user_quote_token_account": a[7],
               "user_pool_token_account": a[8],
               "pool_base_token_account": a[9],
               "pool_quote_token_account": a[10],
           })

    # deposit + withdraw with CPI logs (248B each)
    def dep_cpi(a):
        return {
            "timestamp": 1704067302, "lp_token_amount_out": 11,
            "max_base_amount_in": 12, "max_quote_amount_in": 13,
            "user_base_token_reserves": 14, "user_quote_token_reserves": 15,
            "pool_base_token_reserves": 16, "pool_quote_token_reserves": 17,
            "base_amount_in": 18, "quote_amount_in": 19,
            "lp_mint_supply": 20, "pool": a[0], "user": a[2],
            "user_base_token_account": a[6], "user_quote_token_account": a[7],
            "user_pool_token_account": a[8],
        }

    def dep_cpi_bytes(disc, c, amount_keys):
        b = (disc + i64(c["timestamp"])
             + b"".join(u64(c[k]) for k in amount_keys)
             + pkb(c["pool"]) + pkb(c["user"])
             + pkb(c["user_base_token_account"])
             + pkb(c["user_quote_token_account"])
             + pkb(c["user_pool_token_account"]))
        assert len(b) == 16 + 248, len(b)
        return b

    a2 = [pk() for _ in range(11)] + [PUMPSWAP_PROGRAM_ID]
    c = dep_cpi(a2)
    inner = [{"index": 0, "instructions": [ix(11, [], dep_cpi_bytes(
        CPI_DISC["pumpswap_deposit"], c,
        ["lp_token_amount_out", "max_base_amount_in", "max_quote_amount_in",
         "user_base_token_reserves", "user_quote_token_reserves",
         "pool_base_token_reserves", "pool_quote_token_reserves",
         "base_amount_in", "quote_amount_in", "lp_mint_supply"]))]}]
    tx2 = new_tx(a2, [ix(11, list(range(11)),
                         IX_DISC["PumpSwapDeposit"] + u64(11) + u64(12)
                         + u64(13))], inner)
    ix_payload = {
        "lp_token_amount_out": 11, "max_base_amount_in": 12,
        "max_quote_amount_in": 13, "pool": a2[0], "user": a2[2],
        "base_mint": a2[3], "quote_mint": a2[4],
        "user_base_token_account": a2[6], "user_quote_token_account": a2[7],
        "user_pool_token_account": a2[8], "pool_base_token_account": a2[9],
        "pool_quote_token_account": a2[10],
    }
    golden(tx2, "PumpSwapDeposit", "PumpSwap", PUMPSWAP_PROGRAM_ID, 0, None,
           merged(ix_payload, c, "PumpSwapDeposit"))

    a3 = [pk() for _ in range(11)] + [PUMPSWAP_PROGRAM_ID]
    cw = {
        "timestamp": 1704067303, "lp_token_amount_in": 21,
        "min_base_amount_out": 22, "min_quote_amount_out": 23,
        "user_base_token_reserves": 24, "user_quote_token_reserves": 25,
        "pool_base_token_reserves": 26, "pool_quote_token_reserves": 27,
        "base_amount_out": 28, "quote_amount_out": 29, "lp_mint_supply": 30,
        "pool": a3[0], "user": a3[2], "user_base_token_account": a3[6],
        "user_quote_token_account": a3[7], "user_pool_token_account": a3[8],
    }
    inner3 = [{"index": 0, "instructions": [ix(11, [], dep_cpi_bytes(
        CPI_DISC["pumpswap_withdraw"], cw,
        ["lp_token_amount_in", "min_base_amount_out", "min_quote_amount_out",
         "user_base_token_reserves", "user_quote_token_reserves",
         "pool_base_token_reserves", "pool_quote_token_reserves",
         "base_amount_out", "quote_amount_out", "lp_mint_supply"]))]}]
    tx3 = new_tx(a3, [ix(11, list(range(11)),
                         IX_DISC["PumpSwapWithdraw"] + u64(21) + u64(22)
                         + u64(23))], inner3)
    ix_payload3 = {
        "lp_token_amount_in": 21, "min_base_amount_out": 22,
        "min_quote_amount_out": 23, "pool": a3[0], "user": a3[2],
        "base_mint": a3[3], "quote_mint": a3[4],
        "user_base_token_account": a3[6], "user_quote_token_account": a3[7],
        "user_pool_token_account": a3[8], "pool_base_token_account": a3[9],
        "pool_quote_token_account": a3[10],
    }
    golden(tx3, "PumpSwapWithdraw", "PumpSwap", PUMPSWAP_PROGRAM_ID, 0, None,
           merged(ix_payload3, cw, "PumpSwapWithdraw"))


# ===========================================================================
# Raydium CPMM scenarios
# ===========================================================================

def scenario_cpmm():
    # swap base input + J2 transfers (mints known from accounts)
    a = [pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), SPL_TOKEN,
         SPL_TOKEN, pk(), pk(), pk()]
    tx_accounts = a + [RAYDIUM_CPMM_PROGRAM_ID]
    cp_i = 13
    inner = [{"index": 0, "instructions": [
        spl_transfer(4, 6, 1_111, 8),   # input_acct -> input_vault (case 3)
        spl_transfer(7, 5, 2_222, 8),   # output_vault -> output_acct (case 4)
    ]}]
    tx = new_tx(tx_accounts, [
        ix(cp_i, list(range(13)),
           IX_DISC["RaydiumCpmmSwapBaseInput"] + u64(1_111) + u64(2_000))],
        inner)
    payload = {
        "amount_in": 1_111, "minimum_amount_out": 2_000,
        "payer": a[0], "authority": a[1], "amm_config": a[2],
        "pool_state": a[3], "input_token_account": a[4],
        "output_token_account": a[5], "input_vault": a[6],
        "output_vault": a[7], "input_token_program": a[8],
        "output_token_program": a[9], "input_token_mint": a[10],
        "output_token_mint": a[11], "observation_state": a[12],
    }
    swap = {"from_mint": a[10], "to_mint": a[11], "from_amount": 1_111,
            "to_amount": 2_222, "description": None}
    golden(tx, "RaydiumCpmmSwapBaseInput", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, None, payload, swap=swap)

    # swap base output, no inner group
    a2 = [pk() for _ in range(13)]
    tx2 = new_tx(a2 + [RAYDIUM_CPMM_PROGRAM_ID], [
        ix(13, list(range(13)),
           IX_DISC["RaydiumCpmmSwapBaseOutput"] + u64(999) + u64(888))])
    golden(tx2, "RaydiumCpmmSwapBaseOutput", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, None, {
               "max_amount_in": 999, "amount_out": 888,
               "payer": a2[0], "authority": a2[1], "amm_config": a2[2],
               "pool_state": a2[3], "input_token_account": a2[4],
               "output_token_account": a2[5], "input_vault": a2[6],
               "output_vault": a2[7], "input_token_program": a2[8],
               "output_token_program": a2[9], "input_token_mint": a2[10],
               "output_token_mint": a2[11], "observation_state": a2[12],
           })

    # deposit / initialize / withdraw
    a3 = [pk() for _ in range(13)]
    tx3 = new_tx(a3 + [RAYDIUM_CPMM_PROGRAM_ID], [
        ix(13, list(range(13)),
           IX_DISC["RaydiumCpmmDeposit"] + u64(1) + u64(2) + u64(3))])
    names3 = ["owner", "authority", "pool_state", "owner_lp_token",
              "token0_account", "token1_account", "token0_vault",
              "token1_vault", "token_program", "token_program2022",
              "vault0_mint", "vault1_mint", "lp_mint"]
    golden(tx3, "RaydiumCpmmDeposit", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, None, {
               "lp_token_amount": 1, "maximum_token0_amount": 2,
               "maximum_token1_amount": 3,
               **{k: a3[i] for i, k in enumerate(names3)}})

    a4 = [pk() for _ in range(20)]
    tx4 = new_tx(a4 + [RAYDIUM_CPMM_PROGRAM_ID], [
        ix(20, list(range(20)),
           IX_DISC["RaydiumCpmmInitialize"] + u64(4) + u64(5) + u64(6))])
    names4 = ["creator", "amm_config", "authority", "pool_state",
              "token0_mint", "token1_mint", "lp_mint", "creator_token0",
              "creator_token1", "creator_lp_token", "token0_vault",
              "token1_vault", "create_pool_fee", "observation_state",
              "token_program", "token0_program", "token1_program",
              "associated_token_program", "system_program", "rent"]
    golden(tx4, "RaydiumCpmmInitialize", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, None, {
               "init_amount0": 4, "init_amount1": 5, "open_time": 6,
               **{k: a4[i] for i, k in enumerate(names4)}})

    a5 = [pk() for _ in range(14)]
    tx5 = new_tx(a5 + [RAYDIUM_CPMM_PROGRAM_ID], [
        ix(14, list(range(14)),
           IX_DISC["RaydiumCpmmWithdraw"] + u64(7) + u64(8) + u64(9))])
    names5 = names3 + ["memo_program"]
    golden(tx5, "RaydiumCpmmWithdraw", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, None, {
               "lp_token_amount": 7, "minimum_token0_amount": 8,
               "minimum_token1_amount": 9,
               **{k: a5[i] for i, k in enumerate(names5)}})


# ===========================================================================
# Raydium CLMM scenarios
# ===========================================================================

def scenario_clmm():
    SQRT = 79_228_162_514_264_337_593_543  # > u64, exercises u128 decode
    # swap v1 (description, amounts via transfers, mints stay zero)
    a = [pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), SPL_TOKEN, pk(),
         pk()]
    tx_accounts = a + [RAYDIUM_CLMM_PROGRAM_ID]
    inner = [{"index": 0, "instructions": [
        spl_transfer(3, 5, 50, 8),   # input_acct -> input_vault
        spl_transfer(6, 4, 60, 8),   # output_vault -> output_acct
    ]}]
    tx = new_tx(tx_accounts, [
        ix(11, list(range(11)),
           IX_DISC["RaydiumClmmSwap"] + u64(50) + u64(45) + u128(SQRT)
           + u8(1))], inner)
    payload = {
        "amount": 50, "other_amount_threshold": 45,
        "sqrt_price_limit_x64": SQRT, "is_base_input": True,
        "payer": a[0], "amm_config": a[1], "pool_state": a[2],
        "input_token_account": a[3], "output_token_account": a[4],
        "input_vault": a[5], "output_vault": a[6], "observation_state": a[7],
        "token_program": a[8], "tick_array": a[9],
        "remaining_accounts": [a[10]],
    }
    swap = {"from_mint": ZERO_PUBKEY, "to_mint": ZERO_PUBKEY,
            "from_amount": 50, "to_amount": 60,
            "description": "Unable to get from_mint and to_mint from "
                           "RaydiumClmmSwapEvent"}
    golden(tx, "RaydiumClmmSwap", "RaydiumClmm", RAYDIUM_CLMM_PROGRAM_ID,
           0, None, payload, swap=swap)

    # swap v2 (mints from accounts 11/12)
    a2 = [pk() for _ in range(13)]
    tx2 = new_tx(a2 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(13, list(range(13)),
           IX_DISC["RaydiumClmmSwapV2"] + u64(70) + u64(65) + u128(SQRT)
           + u8(0))])
    golden(tx2, "RaydiumClmmSwapV2", "RaydiumClmm", RAYDIUM_CLMM_PROGRAM_ID,
           0, None, {
               "amount": 70, "other_amount_threshold": 65,
               "sqrt_price_limit_x64": SQRT, "is_base_input": False,
               "payer": a2[0], "amm_config": a2[1], "pool_state": a2[2],
               "input_token_account": a2[3], "output_token_account": a2[4],
               "input_vault": a2[5], "output_vault": a2[6],
               "observation_state": a2[7], "token_program": a2[8],
               "token_program2022": a2[9], "memo_program": a2[10],
               "input_vault_mint": a2[11], "output_vault_mint": a2[12],
               "remaining_accounts": [],
           })

    # close position
    a3 = [pk() for _ in range(6)]
    tx3 = new_tx(a3 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(6, list(range(6)), IX_DISC["RaydiumClmmClosePosition"] + b"")])
    golden(tx3, "RaydiumClmmClosePosition", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "nft_owner": a3[0], "position_nft_mint": a3[1],
               "position_nft_account": a3[2], "personal_position": a3[3],
               "system_program": a3[4], "token_program": a3[5]})

    # increase liquidity v2 (base_flag = Some(true))
    LIQ = 2**90 + 7
    a4 = [pk() for _ in range(15)]
    tx4 = new_tx(a4 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(15, list(range(15)),
           IX_DISC["RaydiumClmmIncreaseLiquidityV2"] + u128(LIQ) + u64(10)
           + u64(11) + u8(1) + u8(1))])
    names4 = ["nft_owner", "nft_account", "pool_state", "protocol_position",
              "personal_position", "tick_array_lower", "tick_array_upper",
              "token_account0", "token_account1", "token_vault0",
              "token_vault1", "token_program", "token_program2022",
              "vault0_mint", "vault1_mint"]
    golden(tx4, "RaydiumClmmIncreaseLiquidityV2", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "liquidity": LIQ, "amount0_max": 10, "amount1_max": 11,
               "base_flag": True,
               **{k: a4[i] for i, k in enumerate(names4)}})

    # decrease liquidity v2
    a5 = [pk() for _ in range(17)]
    tx5 = new_tx(a5 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(17, list(range(17)),
           IX_DISC["RaydiumClmmDecreaseLiquidityV2"] + u128(LIQ) + u64(12)
           + u64(13))])
    names5 = ["nft_owner", "nft_account", "personal_position", "pool_state",
              "protocol_position", "token_vault0", "token_vault1",
              "tick_array_lower", "tick_array_upper",
              "recipient_token_account0", "recipient_token_account1",
              "token_program", "token_program2022", "memo_program",
              "vault0_mint", "vault1_mint"]
    golden(tx5, "RaydiumClmmDecreaseLiquidityV2", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "liquidity": LIQ, "amount0_min": 12, "amount1_min": 13,
               **{k: a5[i] for i, k in enumerate(names5)},
               "remaining_accounts": [a5[16]]})

    # create pool
    a6 = [pk() for _ in range(13)]
    tx6 = new_tx(a6 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(13, list(range(13)),
           IX_DISC["RaydiumClmmCreatePool"] + u128(SQRT) + u64(1704067400))])
    names6 = ["pool_creator", "amm_config", "pool_state", "token_mint0",
              "token_mint1", "token_vault0", "token_vault1",
              "observation_state", "tick_array_bitmap", "token_program0",
              "token_program1", "system_program", "rent"]
    golden(tx6, "RaydiumClmmCreatePool", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "sqrt_price_x64": SQRT, "open_time": 1704067400,
               **{k: a6[i] for i, k in enumerate(names6)}})

    # open position v2 (base_flag None) + t22 variant (base_flag Some(false))
    pos_data = (i32(-100) + i32(200) + i32(-300) + i32(400) + u128(LIQ)
                + u64(14) + u64(15) + u8(1))
    a7 = [pk() for _ in range(23)]
    tx7 = new_tx(a7 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(23, list(range(23)),
           IX_DISC["RaydiumClmmOpenPositionV2"] + pos_data + u8(0) + u8(0))])
    names7 = ["payer", "position_nft_owner", "position_nft_mint",
              "position_nft_account", "metadata_account", "pool_state",
              "protocol_position", "tick_array_lower", "tick_array_upper",
              "personal_position", "token_account0", "token_account1",
              "token_vault0", "token_vault1", "rent", "system_program",
              "token_program", "associated_token_program",
              "metadata_program", "token_program2022", "vault0_mint",
              "vault1_mint"]
    golden(tx7, "RaydiumClmmOpenPositionV2", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "tick_lower_index": -100, "tick_upper_index": 200,
               "tick_array_lower_start_index": -300,
               "tick_array_upper_start_index": 400, "liquidity": LIQ,
               "amount0_max": 14, "amount1_max": 15, "with_metadata": True,
               "base_flag": None,
               **{k: a7[i] for i, k in enumerate(names7)},
               "remaining_accounts": [a7[22]]})

    a8 = [pk() for _ in range(20)]
    tx8 = new_tx(a8 + [RAYDIUM_CLMM_PROGRAM_ID], [
        ix(20, list(range(20)),
           IX_DISC["RaydiumClmmOpenPositionWithToken22Nft"] + pos_data
           + u8(1) + u8(0))])
    names8 = ["payer", "position_nft_owner", "position_nft_mint",
              "position_nft_account", "pool_state", "protocol_position",
              "tick_array_lower", "tick_array_upper", "personal_position",
              "token_account0", "token_account1", "token_vault0",
              "token_vault1", "rent", "system_program", "token_program",
              "associated_token_program", "token_program2022",
              "vault0_mint", "vault1_mint"]
    golden(tx8, "RaydiumClmmOpenPositionWithToken22Nft", "RaydiumClmm",
           RAYDIUM_CLMM_PROGRAM_ID, 0, None, {
               "tick_lower_index": -100, "tick_upper_index": 200,
               "tick_array_lower_start_index": -300,
               "tick_array_upper_start_index": 400, "liquidity": LIQ,
               "amount0_max": 14, "amount1_max": 15, "with_metadata": True,
               "base_flag": False,
               **{k: a8[i] for i, k in enumerate(names8)}})


# ===========================================================================
# Raydium AMM v4 scenarios (1-byte discriminators)
# ===========================================================================

def scenario_ammv4():
    # swap base in, 17 accounts -> amm_target_orders placeholder inserted
    a = [pk() for _ in range(17)]
    tx = new_tx(a + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(17, list(range(17)),
           IX_DISC["RaydiumAmmV4SwapBaseIn"] + u64(100) + u64(90))])
    accs = list(a)
    accs.insert(4, ZERO_PUBKEY)
    names = ["token_program", "amm", "amm_authority", "amm_open_orders",
             "amm_target_orders", "pool_coin_token_account",
             "pool_pc_token_account", "serum_program", "serum_market",
             "serum_bids", "serum_asks", "serum_event_queue",
             "serum_coin_vault_account", "serum_pc_vault_account",
             "serum_vault_signer", "user_source_token_account",
             "user_destination_token_account", "user_source_owner"]
    golden(tx, "RaydiumAmmV4SwapBaseIn", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None, {
               "amount_in": 100, "minimum_amount_out": 90,
               **{k: accs[i] for i, k in enumerate(names)}})

    # swap base out, 18 accounts + J2 transfers (amounts only, description)
    a2 = [SPL_TOKEN] + [pk() for _ in range(17)]
    inner = [{"index": 0, "instructions": [
        spl_transfer(15, 6, 300, 0),   # user_source -> pool_pc (case 3)
        spl_transfer(5, 16, 400, 0),   # pool_coin -> user_dest (case 4)
    ]}]
    tx2 = new_tx(a2 + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(18, list(range(18)),
           IX_DISC["RaydiumAmmV4SwapBaseOut"] + u64(310) + u64(400))],
        inner)
    golden(tx2, "RaydiumAmmV4SwapBaseOut", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None, {
               "max_amount_in": 310, "amount_out": 400,
               **{k: a2[i] for i, k in enumerate(names)}},
           swap={"from_mint": ZERO_PUBKEY, "to_mint": ZERO_PUBKEY,
                 "from_amount": 300, "to_amount": 400,
                 "description": "Unable to get from_mint and to_mint from "
                                "RaydiumAmmV4SwapEvent"})

    # deposit
    a3 = [pk() for _ in range(14)]
    tx3 = new_tx(a3 + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(14, list(range(14)),
           IX_DISC["RaydiumAmmV4Deposit"] + u64(1) + u64(2) + u64(3))])
    names3 = ["token_program", "amm", "amm_authority", "amm_open_orders",
              "amm_target_orders", "lp_mint_address",
              "pool_coin_token_account", "pool_pc_token_account",
              "serum_market", "user_coin_token_account",
              "user_pc_token_account", "user_lp_token_account",
              "user_owner", "serum_event_queue"]
    golden(tx3, "RaydiumAmmV4Deposit", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None, {
               "max_coin_amount": 1, "max_pc_amount": 2, "base_side": 3,
               **{k: a3[i] for i, k in enumerate(names3)}})

    # initialize2
    a4 = [pk() for _ in range(21)]
    tx4 = new_tx(a4 + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(21, list(range(21)),
           IX_DISC["RaydiumAmmV4Initialize2"] + u8(255) + u64(1704067500)
           + u64(4) + u64(5))])
    names4 = ["token_program", "spl_associated_token_account",
              "system_program", "rent", "amm", "amm_authority",
              "amm_open_orders", "lp_mint", "coin_mint", "pc_mint",
              "pool_coin_token_account", "pool_pc_token_account",
              "pool_withdraw_queue", "amm_target_orders", "pool_temp_lp",
              "serum_program", "serum_market", "user_wallet",
              "user_token_coin", "user_token_pc", "user_lp_token_account"]
    golden(tx4, "RaydiumAmmV4Initialize2", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None, {
               "nonce": 255, "open_time": 1704067500, "init_pc_amount": 4,
               "init_coin_amount": 5,
               **{k: a4[i] for i, k in enumerate(names4)}})

    # withdraw
    a5 = [pk() for _ in range(22)]
    tx5 = new_tx(a5 + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(22, list(range(22)), IX_DISC["RaydiumAmmV4Withdraw"] + u64(6))])
    names5 = ["token_program", "amm", "amm_authority", "amm_open_orders",
              "amm_target_orders", "lp_mint_address",
              "pool_coin_token_account", "pool_pc_token_account",
              "pool_withdraw_queue", "pool_temp_lp_token_account",
              "serum_program", "serum_market", "serum_coin_vault_account",
              "serum_pc_vault_account", "serum_vault_signer",
              "user_lp_token_account", "user_coin_token_account",
              "user_pc_token_account", "user_owner", "serum_event_queue",
              "serum_bids", "serum_asks"]
    golden(tx5, "RaydiumAmmV4Withdraw", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None, {
               "amount": 6, **{k: a5[i] for i, k in enumerate(names5)}})

    # withdraw pnl
    a6 = [pk() for _ in range(17)]
    tx6 = new_tx(a6 + [RAYDIUM_AMM_V4_PROGRAM_ID], [
        ix(17, list(range(17)), IX_DISC["RaydiumAmmV4WithdrawPnl"] + b"")])
    names6 = ["token_program", "amm", "amm_config", "amm_authority",
              "amm_open_orders", "pool_coin_token_account",
              "pool_pc_token_account", "coin_pnl_token_account",
              "pc_pnl_token_account", "pnl_owner_account",
              "amm_target_orders", "serum_program", "serum_market",
              "serum_event_queue", "serum_coin_vault_account",
              "serum_pc_vault_account", "serum_vault_signer"]
    golden(tx6, "RaydiumAmmV4WithdrawPnl", "RaydiumAmmV4",
           RAYDIUM_AMM_V4_PROGRAM_ID, 0, None,
           {k: a6[i] for i, k in enumerate(names6)})


# ===========================================================================
# Meteora DAMM v2 scenarios
# ===========================================================================

def _meteora_swap_cpi():
    return {
        "pool": pk(), "trade_direction": "0", "collect_fee_mode": 1,
        "has_referral": True, "amount_0": 10_000, "amount_1": 9_000,
        "swap_mode": 0, "included_fee_input_amount": 10_000,
        "excluded_fee_input_amount": 9_950, "amount_left": 0,
        "output_amount": 9_500, "next_sqrt_price": 2**70 + 3,
        "trading_fee": 30, "protocol_fee": 10, "partner_fee": 5,
        "referral_fee": 5, "included_transfer_fee_amount_in": 1,
        "included_transfer_fee_amount_out": 2,
        "excluded_transfer_fee_amount_out": 3,
        "current_timestamp": 1704067600, "reserve_a_amount": 111_111,
        "reserve_b_amount": 222_222,
    }


def _meteora_swap_cpi_bytes(c):
    b = (CPI_DISC["meteora_swap"] + pkb(c["pool"])
         + u8(int(c["trade_direction"])) + u8(c["collect_fee_mode"])
         + u8(1 if c["has_referral"] else 0) + u64(c["amount_0"])
         + u64(c["amount_1"]) + u8(c["swap_mode"])
         + u64(c["included_fee_input_amount"])
         + u64(c["excluded_fee_input_amount"]) + u64(c["amount_left"])
         + u64(c["output_amount"]) + u128(c["next_sqrt_price"])
         + u64(c["trading_fee"]) + u64(c["protocol_fee"])
         + u64(c["partner_fee"]) + u64(c["referral_fee"])
         + u64(c["included_transfer_fee_amount_in"])
         + u64(c["included_transfer_fee_amount_out"])
         + u64(c["excluded_transfer_fee_amount_out"])
         + u64(c["current_timestamp"]) + u64(c["reserve_a_amount"])
         + u64(c["reserve_b_amount"]))
    assert len(b) == 16 + 180, len(b)
    return b


def scenario_meteora_swaps():
    a = [pk() for _ in range(14)]
    md_i = 14
    cpi = _meteora_swap_cpi()
    inner = [{"index": 0,
              "instructions": [ix(md_i, [], _meteora_swap_cpi_bytes(cpi))]}]
    tx = new_tx(a + [METEORA_DAMM_V2_PROGRAM_ID], [
        ix(md_i, list(range(14)),
           IX_DISC["MeteoraDammV2Swap"] + u64(10_000) + u64(9_000))], inner)
    ix_payload = {
        "amount_0": 10_000, "amount_1": 9_000,
        "pool_authority": a[0], "pool": a[1], "input_token_account": a[2],
        "output_token_account": a[3], "token_a_vault": a[4],
        "token_b_vault": a[5], "token_a_mint": a[6], "token_b_mint": a[7],
        "payer": a[8], "token_a_program": a[9], "token_b_program": a[10],
        "referral_token_account": a[11], "event_authority": a[12],
        "program": a[13],
    }
    golden(tx, "MeteoraDammV2Swap", "MeteoraDammV2",
           METEORA_DAMM_V2_PROGRAM_ID, 0, None,
           merged(ix_payload, cpi, "MeteoraDammV2Swap"))

    # swap2 with referral (15 accounts), no CPI
    a2 = [pk() for _ in range(15)]
    tx2 = new_tx(a2 + [METEORA_DAMM_V2_PROGRAM_ID], [
        ix(15, list(range(15)),
           IX_DISC["MeteoraDammV2Swap2"] + u64(5_000) + u64(4_500) + u8(1))])
    golden(tx2, "MeteoraDammV2Swap2", "MeteoraDammV2",
           METEORA_DAMM_V2_PROGRAM_ID, 0, None, {
               "amount_0": 5_000, "amount_1": 4_500, "swap_mode": 1,
               "has_referral": True,
               "pool_authority": a2[0], "pool": a2[1],
               "input_token_account": a2[2], "output_token_account": a2[3],
               "token_a_vault": a2[4], "token_b_vault": a2[5],
               "token_a_mint": a2[6], "token_b_mint": a2[7], "payer": a2[8],
               "token_a_program": a2[9], "token_b_program": a2[10],
               "referral_token_account": a2[11], "event_authority": a2[12],
               "program": a2[13], "sysvar": a2[14]})

    # swap2 without referral (14 accounts)
    a3 = [pk() for _ in range(14)]
    tx3 = new_tx(a3 + [METEORA_DAMM_V2_PROGRAM_ID], [
        ix(14, list(range(14)),
           IX_DISC["MeteoraDammV2Swap2"] + u64(6_000) + u64(5_500) + u8(0))])
    golden(tx3, "MeteoraDammV2Swap2", "MeteoraDammV2",
           METEORA_DAMM_V2_PROGRAM_ID, 0, None, {
               "amount_0": 6_000, "amount_1": 5_500, "swap_mode": 0,
               "has_referral": False,
               "pool_authority": a3[0], "pool": a3[1],
               "input_token_account": a3[2], "output_token_account": a3[3],
               "token_a_vault": a3[4], "token_b_vault": a3[5],
               "token_a_mint": a3[6], "token_b_mint": a3[7], "payer": a3[8],
               "token_a_program": a3[9], "token_b_program": a3[10],
               "referral_token_account": None, "event_authority": a3[11],
               "program": a3[12], "sysvar": a3[13]})


def _meteora_fees():
    return {
        "base_fee_cliff_fee_numerator": 2_500_000,
        "base_fee_first_factor": 10, "base_fee_second_factor": 3,
        "base_fee_third_factor": 4, "base_fee_mode": 0,
    }


def _meteora_fees_bytes(fees, dynamic=None):
    b = (u64(fees["base_fee_cliff_fee_numerator"])
         + u16(fees["base_fee_first_factor"])
         + u64(fees["base_fee_second_factor"])
         + u64(fees["base_fee_third_factor"]) + u8(fees["base_fee_mode"])
         + b"\x00\x00\x00")
    if dynamic is None:
        return b + u8(0)
    return (b + u8(1) + u16(dynamic["dynamic_fee_bin_step"])
            + u128(dynamic["dynamic_fee_bin_step_u128"])
            + u16(dynamic["dynamic_fee_filter_period"])
            + u16(dynamic["dynamic_fee_decay_period"])
            + u16(dynamic["dynamic_fee_reduction_factor"])
            + u32(dynamic["dynamic_fee_max_volatility_accumulator"])
            + u32(dynamic["dynamic_fee_variable_fee_control"]))


def scenario_meteora_init_pools():
    LIQ, SQRT = 2**100, 2**64 + 1

    # initialize_pool with CPI init-pool log (exact-consumption borsh)
    a = [pk() for _ in range(20)]
    fees = _meteora_fees()
    cpi = {
        "pool": pk(), "token_a_mint": pk(), "token_b_mint": pk(),
        "creator": pk(), "payer": pk(), "alpha_vault": pk(), **fees,
        "sqrt_min_price": 1, "sqrt_max_price": 2**125,
        "activation_type": 1, "collect_fee_mode": 0, "liquidity": LIQ,
        "sqrt_price": SQRT, "activation_point": 1704067700,
        "token_a_flag": 0, "token_b_flag": 1, "token_a_amount": 1_000,
        "token_b_amount": 2_000, "total_amount_a": 3_000,
        "total_amount_b": 4_000, "pool_type": 0,
    }
    cpi_bytes = (CPI_DISC["meteora_init_pool"] + pkb(cpi["pool"])
                 + pkb(cpi["token_a_mint"]) + pkb(cpi["token_b_mint"])
                 + pkb(cpi["creator"]) + pkb(cpi["payer"])
                 + pkb(cpi["alpha_vault"]) + _meteora_fees_bytes(fees)
                 + u128(cpi["sqrt_min_price"]) + u128(cpi["sqrt_max_price"])
                 + u8(cpi["activation_type"]) + u8(cpi["collect_fee_mode"])
                 + u128(cpi["liquidity"]) + u128(cpi["sqrt_price"])
                 + u64(cpi["activation_point"]) + u8(cpi["token_a_flag"])
                 + u8(cpi["token_b_flag"]) + u64(cpi["token_a_amount"])
                 + u64(cpi["token_b_amount"]) + u64(cpi["total_amount_a"])
                 + u64(cpi["total_amount_b"]) + u8(cpi["pool_type"]))
    inner = [{"index": 0, "instructions": [ix(20, [], cpi_bytes)]}]
    tx = new_tx(a + [METEORA_DAMM_V2_PROGRAM_ID], [
        ix(20, list(range(20)),
           IX_DISC["MeteoraDammV2InitializePool"] + u128(LIQ) + u128(SQRT)
           + u8(1) + u64(1704067700))], inner)
    ix_payload = {
        "liquidity": LIQ, "sqrt_price": SQRT,
        "creator": a[0], "position_nft_mint": a[1],
        "position_nft_account": a[2], "payer": a[3], "config": a[4],
        "pool_authority": a[5], "pool": a[6], "position": a[7],
        "token_a_mint": a[8], "token_b_mint": a[9], "token_a_vault": a[10],
        "token_b_vault": a[11], "payer_token_a": a[12],
        "payer_token_b": a[13], "token_a_program": a[14],
        "token_b_program": a[15], "event_authority": a[18], "program": a[19],
        "remaining_accounts": [],
    }
    golden(tx, "MeteoraDammV2InitializePool", "MeteoraDammV2",
           METEORA_DAMM_V2_PROGRAM_ID, 0, None,
           merged(ix_payload, cpi, "MeteoraDammV2InitializePool"))

    # initialize_customizable_pool WITH dynamic fee, no CPI
    a2 = [pk() for _ in range(19)]
    fees2 = _meteora_fees()
    dyn = {
        "dynamic_fee_bin_step": 80, "dynamic_fee_bin_step_u128": 2**65,
        "dynamic_fee_filter_period": 30, "dynamic_fee_decay_period": 600,
        "dynamic_fee_reduction_factor": 5000,
        "dynamic_fee_max_volatility_accumulator": 350_000,
        "dynamic_fee_variable_fee_control": 40_000,
    }
    data2 = (IX_DISC["MeteoraDammV2InitializeCustomizablePool"]
             + _meteora_fees_bytes(fees2, dyn) + u128(1) + u128(2**125)
             + u8(0) + u128(LIQ) + u128(SQRT) + u8(1) + u8(0) + u8(0))
    tx2 = new_tx(a2 + [METEORA_DAMM_V2_PROGRAM_ID],
                 [ix(19, list(range(19)), data2)])
    golden(tx2, "MeteoraDammV2InitializeCustomizablePool", "MeteoraDammV2",
           METEORA_DAMM_V2_PROGRAM_ID, 0, None, {
               **fees2, **dyn, "sqrt_min_price": 1,
               "sqrt_max_price": 2**125, "liquidity": LIQ,
               "sqrt_price": SQRT, "activation_type": 1,
               "collect_fee_mode": 0,
               "creator": a2[0], "position_nft_mint": a2[1],
               "position_nft_account": a2[2], "payer": a2[3],
               "pool_authority": a2[4], "pool": a2[5], "position": a2[6],
               "token_a_mint": a2[7], "token_b_mint": a2[8],
               "token_a_vault": a2[9], "token_b_vault": a2[10],
               "payer_token_a": a2[11], "payer_token_b": a2[12],
               "token_a_program": a2[13], "token_b_program": a2[14],
               "token_2022_program": a2[15], "system_program": a2[16],
               "event_authority": a2[17], "program": a2[18],
               "remaining_accounts": []})

    # initialize_pool_with_dynamic_config, no dynamic fee, no CPI
    a3 = [pk() for _ in range(21)]
    fees3 = _meteora_fees()
    data3 = (IX_DISC["MeteoraDammV2InitializePoolWithDynamicConfig"]
             + _meteora_fees_bytes(fees3) + u128(7) + u128(2**126)
             + u8(1) + u128(LIQ) + u128(SQRT) + u8(0) + u8(1) + u8(0)
             + b"\x00" * 40)  # trailing bytes tolerated by the hand parser
    tx3 = new_tx(a3 + [METEORA_DAMM_V2_PROGRAM_ID],
                 [ix(21, list(range(21)), data3)])
    golden(tx3, "MeteoraDammV2InitializePoolWithDynamicConfig",
           "MeteoraDammV2", METEORA_DAMM_V2_PROGRAM_ID, 0, None, {
               **fees3, "sqrt_min_price": 7, "sqrt_max_price": 2**126,
               "liquidity": LIQ, "sqrt_price": SQRT, "activation_type": 0,
               "collect_fee_mode": 1,
               "creator": a3[0], "position_nft_mint": a3[1],
               "position_nft_account": a3[2], "payer": a3[3],
               "pool_creator_authority": a3[4], "config": a3[5],
               "pool_authority": a3[6], "pool": a3[7], "position": a3[8],
               "token_a_mint": a3[9], "token_b_mint": a3[10],
               "token_a_vault": a3[11], "token_b_vault": a3[12],
               "payer_token_a": a3[13], "payer_token_b": a3[14],
               "token_a_program": a3[15], "token_b_program": a3[16],
               "token_2022_program": a3[17], "system_program": a3[18],
               "event_authority": a3[19], "program": a3[20]})


def scenario_inner_instruction_event():
    # A DEX instruction appearing as an INNER instruction (nested CPI) is
    # parsed through the same pipeline with inner_index set
    # (core/event_parser.rs:256-287).
    foreign = pk()
    a = [pk(), pk(), pk(), pk(), pk(), pk(), pk(), SYSTEM_PROGRAM,
         SPL_TOKEN, pk(), pk(), pk(), pk(), pk(), pk(), pk()]
    tx_accounts = a + [foreign, PUMPFUN_PROGRAM_ID]
    inner = [{"index": 0, "instructions": [
        ix(17, list(range(16)), IX_DISC["PumpFunBuy"] + u64(42) + u64(43)),
    ]}]
    tx = new_tx(tx_accounts, [ix(16, [0], b"\x00" * 8)], inner)
    # J2: group exists -> swap emitted with mints set; amounts come from
    # P11 over sol_amount/token_amount which are unset here (no CPI) ->
    # NULL (the reference would carry struct-default 0; our sparse schema
    # keeps NULL for never-decoded fields — documented representation).
    golden(tx, "PumpFunBuy", "PumpFun", PUMPFUN_PROGRAM_ID, 0, 0, {
        "amount": 42, "max_sol_cost": 43, "is_buy": True,
        "global": a[0], "fee_recipient": a[1], "mint": a[2],
        "bonding_curve": a[3], "associated_bonding_curve": a[4],
        "associated_user": a[5], "user": a[6],
        "system_program": SYSTEM_PROGRAM, "token_program": SPL_TOKEN,
        "creator_vault": a[9], "event_authority": a[10], "program": a[11],
        "global_volume_accumulator": a[12],
        "user_volume_accumulator": a[13],
        "fee_config": a[14], "fee_program": a[15],
    }, swap={"from_mint": SOL_MINT, "to_mint": a[2], "from_amount": None,
             "to_amount": None, "description": None},
        is_dev=False, is_bot=False)


def scenario_inner_swap_trailing_transfers():
    # J2 parity for an INNER event with trailing transfers: the reference
    # scan starts at current_index + 1 (types.rs:461 `.skip(current_index
    # + 1)`), so the event's OWN (non-system) protocol instruction at its
    # position must not count as a break; the first non-system program
    # strictly AFTER the event does, and transfers past it are ignored.
    foreign = pk()
    a = [pk(), pk(), pk(), pk(), pk(), pk(), pk(), pk(), SPL_TOKEN,
         SPL_TOKEN, pk(), pk(), pk()]
    tx_accounts = a + [RAYDIUM_CPMM_PROGRAM_ID, foreign]
    cp_i = 13
    inner = [{"index": 0, "instructions": [
        # pos 0: the event itself — CPMM program, NOT a system program
        ix(cp_i, list(range(13)),
           IX_DISC["RaydiumCpmmSwapBaseInput"] + u64(1_111) + u64(2_000)),
        # pos 1: input_acct(4) -> input_vault(6): case 3, scanned
        spl_transfer(4, 6, 1_111, 8),
        # pos 2: non-system program => break (disc matches no event)
        ix(cp_i, [], b"\x99" * 8),
        # pos 3: output_vault(7) -> output_acct(5): case 4, but AFTER the
        # break — must NOT be scanned
        spl_transfer(7, 5, 2_222, 8),
    ]}]
    tx = new_tx(tx_accounts, [ix(14, [0], b"\x00" * 8)], inner)
    payload = {
        "amount_in": 1_111, "minimum_amount_out": 2_000,
        "payer": a[0], "authority": a[1], "amm_config": a[2],
        "pool_state": a[3], "input_token_account": a[4],
        "output_token_account": a[5], "input_vault": a[6],
        "output_vault": a[7], "input_token_program": a[8],
        "output_token_program": a[9], "input_token_mint": a[10],
        "output_token_mint": a[11], "observation_state": a[12],
    }
    # Only the pos-1 transfer is matched: from-side filled, to-side stays
    # at the swap-struct defaults (zero pubkey / 0).
    swap = {"from_mint": a[10], "to_mint": ZERO_PUBKEY,
            "from_amount": 1_111, "to_amount": 0, "description": None}
    golden(tx, "RaydiumCpmmSwapBaseInput", "RaydiumCpmm",
           RAYDIUM_CPMM_PROGRAM_ID, 0, 0, payload, swap=swap)


# ===========================================================================
# Account-update fixtures (raw_accounts + accounts_golden)
# ===========================================================================

ACCOUNTS: list[dict] = []
ACCOUNTS_GOLDEN: list[dict] = []

PF_BONDING_DISC = bytes([23, 183, 248, 55, 96, 216, 172, 96])
PF_GLOBAL_DISC = bytes([167, 232, 232, 177, 200, 108, 114, 127])


def new_account(owner, data, lamports=1_000_000, executable=False):
    global _slot, _recv
    _slot += 1
    _recv += 500
    acct = {
        "slot": _slot, "signature": sig(), "pubkey": pk(),
        "executable": executable, "lamports": lamports, "owner": owner,
        "rent_epoch": 361, "data": data, "recv_us": _recv,
    }
    ACCOUNTS.append(acct)
    return acct


def account_golden(acct, protocol, event_type, payload):
    ACCOUNTS_GOLDEN.append({
        "slot": acct["slot"], "signature": acct["signature"],
        "protocol": protocol, "event_type": event_type,
        "program_id": acct["owner"], "recv_us": acct["recv_us"],
        "pubkey": acct["pubkey"], "executable": acct["executable"],
        "lamports": acct["lamports"], "owner": acct["owner"],
        "rent_epoch": acct["rent_epoch"], **payload,
    })


def scenario_accounts():
    # PumpFun bonding curve (disc + 51-byte borsh body)
    creator = pk()
    bc_body = (u64(111) + u64(222) + u64(333) + u64(444) + u64(555)
               + u8(1) + pkb(creator) + u8(0))
    acct = new_account(PUMPFUN_PROGRAM_ID, PF_BONDING_DISC + bc_body)
    account_golden(acct, "PumpFun", "AccountPumpFunBondingCurve", {
        "virtual_token_reserves": 111, "virtual_sol_reserves": 222,
        "real_token_reserves": 333, "real_sol_reserves": 444,
        "token_total_supply": 555, "complete": True, "creator": creator,
        "is_mayhem_mode": False})

    # PumpFun global
    auth, feerec, wauth = pk(), pk(), pk()
    recips = [pk() for _ in range(7)]
    sca, asca, wl, rfr = pk(), pk(), pk(), pk()
    gl_body = (u8(1) + pkb(auth) + pkb(feerec) + u64(1) + u64(2) + u64(3)
               + u64(4) + u64(5) + pkb(wauth) + u8(0) + u64(6) + u64(7)
               + b"".join(pkb(r) for r in recips) + pkb(sca) + pkb(asca)
               + u8(1) + pkb(wl) + pkb(rfr) + u8(0))
    acct2 = new_account(PUMPFUN_PROGRAM_ID, PF_GLOBAL_DISC + gl_body)
    account_golden(acct2, "PumpFun", "AccountPumpFunGlobal", {
        "initialized": True, "authority": auth, "fee_recipient": feerec,
        "initial_virtual_token_reserves": 1,
        "initial_virtual_sol_reserves": 2,
        "initial_real_token_reserves": 3, "token_total_supply": 4,
        "fee_basis_points": 5, "withdraw_authority": wauth,
        "enable_migrate": False, "pool_migration_fee": 6,
        "creator_fee_basis_points": 7, "fee_recipients": recips,
        "set_creator_authority": sca, "admin_set_creator_authority": asca,
        "create_v2_enabled": True, "whitelist_pda": wl,
        "reserved_fee_recipient": rfr, "mayhem_mode_enabled": False})

    # SPL mint (exact 82B): supply @36, decimals @44
    mint_data = bytearray(82)
    mint_data[36:44] = u64(10_000_000)
    mint_data[44] = 9
    acct3 = new_account(SPL_TOKEN, bytes(mint_data))
    account_golden(acct3, "Common", "TokenAccount", {
        "supply": 10_000_000, "decimals": 9})

    # SPL token account (exact 165B, state=1 initialized): amount @64
    tok = bytearray(165)
    tok[64:72] = u64(42_000)
    tok[108] = 1
    acct4 = new_account(SPL_TOKEN, bytes(tok))
    account_golden(acct4, "Common", "TokenAccount", {
        "amount": 42_000, "token_owner": SPL_TOKEN})

    # Token-2022 mint with extension TLV (len > 165, type byte 1 @165)
    t22 = bytearray(170)
    t22[36:44] = u64(777)
    t22[44] = 6
    t22[165] = 1
    acct5 = new_account(SYSTEM_PROGRAMS[1], bytes(t22))
    account_golden(acct5, "Common", "TokenAccount", {
        "supply": 777, "decimals": 6})

    # initialized nonce (80B): version=1, state=1, authority, blockhash
    nauth, nhash = pk(), pk()
    nonce_data = u32(1) + u32(1) + pkb(nauth) + pkb(nhash) + u64(5000)
    acct6 = new_account(SYSTEM_PROGRAM, nonce_data)
    account_golden(acct6, "Common", "NonceAccount", {
        "nonce": nhash, "nonce_authority": nauth})

    # uninitialized nonce -> falls through to TokenAccount (amount NULL)
    acct7 = new_account(SYSTEM_PROGRAM,
                        u32(1) + u32(0) + pkb(pk()) + pkb(pk()) + u64(0))
    account_golden(acct7, "Common", "TokenAccount",
                   {"token_owner": SYSTEM_PROGRAM})

    # PumpFun-owned account with unknown discriminator -> common path ->
    # TokenAccount with NULL amount (wrong length for token decode)
    acct8 = new_account(PUMPFUN_PROGRAM_ID, b"\xff" * 40)
    account_golden(acct8, "Common", "TokenAccount",
                   {"token_owner": PUMPFUN_PROGRAM_ID})

    # truncated bonding curve (disc ok, body short) -> common fallback
    acct9 = new_account(PUMPFUN_PROGRAM_ID, PF_BONDING_DISC + b"\x01" * 10)
    account_golden(acct9, "Common", "TokenAccount",
                   {"token_owner": PUMPFUN_PROGRAM_ID})

    # --- PumpSwap global config + pool (pumpswap/types.rs:14-84)
    PS_GC_DISC = bytes([149, 8, 156, 202, 160, 252, 176, 217])
    PS_POOL_DISC = bytes([241, 154, 109, 4, 17, 177, 109, 188])
    admin, ascca, wl2, rfr2 = pk(), pk(), pk(), pk()
    recips8 = [pk() for _ in range(8)]
    gc_body = (pkb(admin) + u64(20) + u64(5) + u8(3)
               + b"".join(pkb(r) for r in recips8) + u64(7) + pkb(ascca)
               + pkb(wl2) + pkb(rfr2) + u8(1))
    a10 = new_account(PUMPSWAP_PROGRAM_ID, PS_GC_DISC + gc_body)
    account_golden(a10, "PumpSwap", "AccountPumpSwapGlobalConfig", {
        "admin": admin, "lp_fee_basis_points": 20,
        "protocol_fee_basis_points": 5, "disable_flags": 3,
        "protocol_fee_recipients": recips8,
        "coin_creator_fee_basis_points": 7,
        "admin_set_coin_creator_authority": ascca, "whitelist_pda": wl2,
        "reserved_fee_recipient": rfr2, "mayhem_mode_enabled": True})

    ps_pool = [pk() for _ in range(8)]
    pool_body = (u8(254) + u16(9) + b"".join(pkb(p) for p in ps_pool[:6])
                 + u64(123_456_789) + pkb(ps_pool[6]) + u8(0))
    a11 = new_account(PUMPSWAP_PROGRAM_ID, PS_POOL_DISC + pool_body)
    account_golden(a11, "PumpSwap", "AccountPumpSwapPool", {
        "pool_bump": 254, "index": 9, "creator": ps_pool[0],
        "base_mint": ps_pool[1], "quote_mint": ps_pool[2],
        "lp_mint": ps_pool[3], "pool_base_token_account": ps_pool[4],
        "pool_quote_token_account": ps_pool[5], "lp_supply": 123_456_789,
        "coin_creator": ps_pool[6], "is_mayhem_mode": False})

    # --- Bonk pool state / global config / platform config
    BK_PS_DISC = bytes([247, 237, 227, 245, 215, 195, 222, 70])
    BK_GC_DISC = bytes([149, 8, 156, 202, 160, 252, 176, 217])
    BK_PC_DISC = bytes([160, 78, 128, 0, 248, 83, 230, 160])
    bk_pks = [pk() for _ in range(7)]
    ps_body = (u64(700) + u8(255) + u8(2) + u8(6) + u8(9) + u8(1)
               + b"".join(u64(v) for v in
                          [1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000,
                           9000, 10000])
               + b"".join(u64(v) for v in [11, 12, 13, 14, 15])
               + b"".join(pkb(p) for p in bk_pks) + b"\x00" * 64)
    a12 = new_account(BONK_PROGRAM_ID, BK_PS_DISC + ps_body)
    account_golden(a12, "Bonk", "AccountBonkPoolState", {
        "epoch": 700, "auth_bump": 255, "status": 2, "base_decimals": 6,
        "quote_decimals": 9, "migrate_type": 1, "supply": 1000,
        "total_base_sell": 2000, "virtual_base": 3000,
        "virtual_quote": 4000, "real_base": 5000, "real_quote": 6000,
        "total_quote_fund_raising": 7000, "quote_protocol_fee": 8000,
        "platform_fee": 9000, "migrate_fee": 10000,
        "vesting_total_locked_amount": 11, "vesting_cliff_period": 12,
        "vesting_unlock_period": 13, "vesting_start_time": 14,
        "vesting_allocated_share_amount": 15,
        "global_config": bk_pks[0], "platform_config": bk_pks[1],
        "base_mint": bk_pks[2], "quote_mint": bk_pks[3],
        "base_vault": bk_pks[4], "quote_vault": bk_pks[5],
        "creator": bk_pks[6]})

    gc_pks = [pk() for _ in range(5)]
    bk_gc_body = (u64(701) + u8(0) + u16(4)
                  + b"".join(u64(v) for v in
                             [21, 22, 23, 24, 25, 26, 27, 28])
                  + b"".join(pkb(p) for p in gc_pks) + b"\x00" * 128)
    a13 = new_account(BONK_PROGRAM_ID, BK_GC_DISC + bk_gc_body)
    account_golden(a13, "Bonk", "AccountBonkGlobalConfig", {
        "epoch": 701, "curve_type_raw": 0, "index": 4, "migrate_fee": 21,
        "trade_fee_rate": 22, "max_share_fee_rate": 23,
        "min_base_supply": 24, "max_lock_rate": 25,
        "min_base_sell_rate": 26, "min_base_migrate_rate": 27,
        "min_quote_fund_raising": 28, "quote_mint": gc_pks[0],
        "protocol_fee_owner": gc_pks[1], "migrate_fee_owner": gc_pks[2],
        "migrate_to_amm_wallet": gc_pks[3],
        "migrate_to_cpswap_wallet": gc_pks[4]})

    # platform config: Vec<u8> fields; total body must be exactly 6760
    pfw, pnw = pk(), pk()
    name_b, web_b, img_b = b"BonkPlatform", b"https://b.example", b"img://x"
    fixed = 8 + 64 + 32 + 4 * 4 + len(name_b) + len(web_b) + len(img_b)
    pad_len = (8 + 32 * 2 + 8 * 4 + 8 * 64 + 8 * 256 * 3) - fixed
    bk_pc_body = (u64(702) + pkb(pfw) + pkb(pnw) + u64(31) + u64(32)
                  + u64(33) + u64(34)
                  + u32(len(name_b)) + name_b + u32(len(web_b)) + web_b
                  + u32(len(img_b)) + img_b + u32(pad_len)
                  + b"\x00" * pad_len)
    a14 = new_account(BONK_PROGRAM_ID, BK_PC_DISC + bk_pc_body)
    account_golden(a14, "Bonk", "AccountBonkPlatformConfig", {
        "epoch": 702, "platform_fee_wallet": pfw,
        "platform_nft_wallet": pnw, "platform_scale": 31,
        "creator_scale": 32, "burn_scale": 33, "fee_rate": 34,
        "platform_name": "BonkPlatform", "platform_web": "https://b.example",
        "platform_img": "img://x"})

    # --- Raydium CPMM amm config + pool state
    CP_AC_DISC = bytes([218, 244, 33, 104, 203, 203, 43, 111])
    CP_PS_DISC = bytes([247, 237, 227, 245, 215, 195, 222, 70])
    po, fo = pk(), pk()
    cp_ac_body = (u8(253) + u8(0) + u16(2) + u64(41) + u64(42) + u64(43)
                  + u64(44) + pkb(po) + pkb(fo) + b"\x00" * 128)
    a15 = new_account(RAYDIUM_CPMM_PROGRAM_ID, CP_AC_DISC + cp_ac_body)
    account_golden(a15, "RaydiumCpmm", "AccountRaydiumCpmmAmmConfig", {
        "bump": 253, "disable_create_pool": False, "index": 2,
        "trade_fee_rate": 41, "protocol_fee_rate": 42,
        "fund_fee_rate": 43, "create_pool_fee": 44,
        "protocol_owner": po, "fund_owner": fo})

    cp_pks = [pk() for _ in range(10)]
    cp_ps_body = (b"".join(pkb(p) for p in cp_pks)
                  + u8(251) + u8(1) + u8(9) + u8(6) + u8(8)
                  + b"".join(u64(v) for v in
                             [51, 52, 53, 54, 55, 56, 57]) + b"\x00" * 248)
    a16 = new_account(RAYDIUM_CPMM_PROGRAM_ID, CP_PS_DISC + cp_ps_body)
    account_golden(a16, "RaydiumCpmm", "AccountRaydiumCpmmPoolState", {
        "amm_config": cp_pks[0], "pool_creator": cp_pks[1],
        "token0_vault": cp_pks[2], "token1_vault": cp_pks[3],
        "lp_mint": cp_pks[4], "token0_mint": cp_pks[5],
        "token1_mint": cp_pks[6], "token0_program": cp_pks[7],
        "token1_program": cp_pks[8], "observation_key": cp_pks[9],
        "auth_bump": 251, "status": 1, "lp_mint_decimals": 9,
        "mint0_decimals": 6, "mint1_decimals": 8, "lp_supply": 51,
        "protocol_fees_token0": 52, "protocol_fees_token1": 53,
        "fund_fees_token0": 54, "fund_fees_token1": 55, "open_time": 56,
        "recent_epoch": 57})

    # --- Raydium CLMM amm config / pool state / tick array
    from decimal import Decimal as D
    CLMM_AC_DISC = bytes([218, 244, 33, 104, 203, 203, 43, 111])
    CLMM_PS_DISC = bytes([247, 237, 227, 245, 215, 195, 222, 70])
    CLMM_TA_DISC = bytes([192, 155, 85, 205, 49, 249, 129, 42])

    cfg_owner, fund_owner2 = pk(), pk()
    clmm_ac_body = (u8(250) + u16(11) + pkb(cfg_owner) + u32(61) + u32(62)
                    + u16(10) + u32(63) + u32(0) + pkb(fund_owner2)
                    + b"\x00" * 24)
    a17 = new_account(RAYDIUM_CLMM_PROGRAM_ID, CLMM_AC_DISC + clmm_ac_body)
    account_golden(a17, "RaydiumClmm", "AccountRaydiumClmmAmmConfig", {
        "bump": 250, "index": 11, "config_owner": cfg_owner,
        "protocol_fee_rate": 61, "trade_fee_rate": 62, "tick_spacing": 10,
        "fund_fee_rate": 63, "fund_owner": fund_owner2})

    # pool state (1536B body)
    clmm_pks = [pk() for _ in range(7)]
    LIQ2, SQRTP = 2**90 + 5, 2**80 + 9
    rewards = []
    reward_bytes = b""
    for k in range(3):
        ri = {"reward_state": k, "open_time": D(100 + k),
              "end_time": D(200 + k), "last_update_time": D(300 + k),
              "emissions_per_second_x64": D(2**70 + k),
              "reward_total_emissioned": D(400 + k),
              "reward_claimed": D(500 + k), "token_mint": pk(),
              "token_vault": pk(), "authority": pk(),
              "reward_growth_global_x64": D(2**71 + k)}
        rewards.append(ri)
        reward_bytes += (u8(k) + u64(100 + k) + u64(200 + k) + u64(300 + k)
                         + u128(2**70 + k) + u64(400 + k) + u64(500 + k)
                         + pkb(ri["token_mint"]) + pkb(ri["token_vault"])
                         + pkb(ri["authority"]) + u128(2**71 + k))
    bitmap = list(range(16))
    clmm_ps_body = (u8(249) + b"".join(pkb(p) for p in clmm_pks)
                    + u8(6) + u8(9) + u16(10) + u128(LIQ2) + u128(SQRTP)
                    + i32(-12345) + u16(0) + u16(0) + u128(71) + u128(72)
                    + u64(73) + u64(74) + u128(75) + u128(76) + u128(77)
                    + u128(78) + u8(1) + b"\x00" * 7 + reward_bytes
                    + b"".join(u64(b) for b in bitmap)
                    + u64(81) + u64(82) + u64(83) + u64(84) + u64(85)
                    + u64(86) + u64(87) + u64(88)
                    + b"\x00" * (8 * 24) + b"\x00" * (8 * 32))
    assert len(clmm_ps_body) == 1536, len(clmm_ps_body)
    a18 = new_account(RAYDIUM_CLMM_PROGRAM_ID, CLMM_PS_DISC + clmm_ps_body)
    account_golden(a18, "RaydiumClmm", "AccountRaydiumClmmPoolState", {
        "auth_bump": 249, "amm_config": clmm_pks[0],
        "config_owner": clmm_pks[1], "token_mint0": clmm_pks[2],
        "token_mint1": clmm_pks[3], "token_vault0": clmm_pks[4],
        "token_vault1": clmm_pks[5], "observation_key": clmm_pks[6],
        "mint0_decimals": 6, "mint1_decimals": 9, "tick_spacing": 10,
        "liquidity": LIQ2, "sqrt_price_x64": SQRTP, "tick_current": -12345,
        "fee_growth_global0_x64": 71, "fee_growth_global1_x64": 72,
        "protocol_fees_token0": 73, "protocol_fees_token1": 74,
        "swap_in_amount_token0": 75, "swap_out_amount_token1": 76,
        "swap_in_amount_token1": 77, "swap_out_amount_token0": 78,
        "status": 1, "reward_infos": rewards,
        "tick_array_bitmap": [D(b) for b in bitmap],
        "total_fees_token0": 81, "total_fees_claimed_token0": 82,
        "total_fees_token1": 83, "total_fees_claimed_token1": 84,
        "fund_fees_token0": 85, "fund_fees_token1": 86, "open_time": 87,
        "recent_epoch": 88})

    # tick array (10232B body, 60 ticks)
    pool_id = pk()
    ticks, tick_bytes = [], b""
    for k in range(60):
        t = {"tick": -300 + k * 10, "liquidity_net": D((-1) ** k * (k + 1)),
             "liquidity_gross": D(2**64 + k),
             "fee_growth_outside0_x64": D(k), "fee_growth_outside1_x64":
             D(k * 2), "reward_growths_outside_x64": [D(k), D(k + 1),
                                                      D(k + 2)]}
        ticks.append(t)
        tick_bytes += (i32(t["tick"])
                       + int((-1) ** k * (k + 1)).to_bytes(
                           16, "little", signed=True)
                       + u128(2**64 + k) + u128(k) + u128(k * 2)
                       + u128(k) + u128(k + 1) + u128(k + 2)
                       + b"\x00" * 52)
    clmm_ta_body = (pkb(pool_id) + i32(-3000) + tick_bytes + u8(7)
                    + u64(89) + b"\x00" * 107)
    assert len(clmm_ta_body) == 10232, len(clmm_ta_body)
    a19 = new_account(RAYDIUM_CLMM_PROGRAM_ID, CLMM_TA_DISC + clmm_ta_body)
    account_golden(a19, "RaydiumClmm", "AccountRaydiumClmmTickArrayState", {
        "pool_id": pool_id, "start_tick_index": -3000, "ticks": ticks,
        "initialized_tick_count": 7, "recent_epoch": 89})


def write_account_parquet():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from decimal import Decimal

    acct_schema = pa.schema([
        ("slot", pa.int64()), ("signature", pa.string()),
        ("pubkey", pa.string()), ("executable", pa.bool_()),
        ("lamports", pa.int64()), ("owner", pa.string()),
        ("rent_epoch", pa.int64()), ("data", pa.binary()),
        ("recv_us", pa.int64()),
    ])
    cols = {n: [a[n] for a in ACCOUNTS] for n in acct_schema.names}
    pq.write_table(pa.Table.from_pydict(cols, schema=acct_schema),
                   os.path.join(FIXTURES_DIR, "raw_accounts.parquet"))

    from solana_event_stream_spark.plans.account_pipeline import (
        ACCOUNT_EVENT_SCHEMA)
    from pyspark.sql.types import (ArrayType, BooleanType, DecimalType,
                                   IntegerType, LongType, StringType,
                                   StructType)

    def to_arrow(t):
        if isinstance(t, DecimalType):
            return pa.decimal128(t.precision, t.scale)
        if isinstance(t, LongType):
            return pa.int64()
        if isinstance(t, IntegerType):
            return pa.int32()
        if isinstance(t, BooleanType):
            return pa.bool_()
        if isinstance(t, ArrayType):
            return pa.list_(to_arrow(t.elementType))
        if isinstance(t, StructType):
            return pa.struct([(f.name, to_arrow(f.dataType))
                              for f in t.fields])
        if isinstance(t, StringType):
            return pa.string()
        raise TypeError(t)

    fields = [(f.name, to_arrow(f.dataType))
              for f in ACCOUNT_EVENT_SCHEMA.fields]
    dec_cols = {f.name for f in ACCOUNT_EVENT_SCHEMA.fields
                if isinstance(f.dataType, DecimalType)}
    ev_cols = {}
    for name, typ in fields:
        vals = []
        for row in ACCOUNTS_GOLDEN:
            v = row.get(name)
            if v is not None and name in dec_cols:
                v = Decimal(int(v))
            vals.append(v)
        ev_cols[name] = pa.array(vals, type=typ)
    pq.write_table(
        pa.Table.from_arrays([ev_cols[n] for n, _ in fields],
                             schema=pa.schema(fields)),
        os.path.join(FIXTURES_DIR, "accounts_golden.parquet"))


# ===========================================================================
# Parquet output
# ===========================================================================

def write_parquet():
    import pyarrow as pa
    import pyarrow.parquet as pq

    from solana_event_stream_spark.schemas import (EVENT_SCHEMA,
                                                   PAYLOAD_FIELDS)

    os.makedirs(FIXTURES_DIR, exist_ok=True)

    ix_t = pa.struct([("program_id_index", pa.int32()),
                      ("account_indices", pa.list_(pa.int32())),
                      ("data", pa.binary())])
    grp_t = pa.struct([("index", pa.int32()),
                       ("instructions", pa.list_(ix_t))])
    tx_schema = pa.schema([
        ("slot", pa.int64()), ("transaction_index", pa.int64()),
        ("block_time", pa.timestamp("us")), ("signature", pa.string()),
        ("is_vote", pa.bool_()), ("recv_us", pa.int64()),
        ("static_account_keys", pa.list_(pa.string())),
        ("loaded_writable_addresses", pa.list_(pa.string())),
        ("loaded_readonly_addresses", pa.list_(pa.string())),
        ("instructions", pa.list_(ix_t)),
        ("inner_instructions", pa.list_(grp_t)),
        ("source", pa.string()),
    ])
    cols = {name: [t[name] for t in TXS] for name in tx_schema.names}
    pq.write_table(
        pa.Table.from_pydict(cols, schema=tx_schema),
        os.path.join(FIXTURES_DIR, "raw_transactions.parquet"))

    # golden events: EVENT_SCHEMA + enrichment flags, arrow-typed
    kind_to_arrow = {
        "pk": pa.string(), "str": pa.string(),
        "u64": pa.decimal128(20, 0), "u128": pa.decimal128(38, 0),
        "i64": pa.int64(), "u32": pa.int64(), "u16": pa.int32(),
        "u8": pa.int32(), "i32": pa.int32(), "bool": pa.bool_(),
        "pk_list": pa.list_(pa.string()),
    }
    fields = [
        ("signature", pa.string()), ("slot", pa.int64()),
        ("transaction_index", pa.int64()),
        ("block_time", pa.timestamp("us")), ("block_time_ms", pa.int64()),
        ("recv_us", pa.int64()), ("protocol", pa.string()),
        ("event_type", pa.string()), ("program_id", pa.string()),
        ("outer_index", pa.int64()), ("inner_index", pa.int64()),
        ("swap_from_mint", pa.string()), ("swap_to_mint", pa.string()),
        ("swap_from_amount", pa.decimal128(20, 0)),
        ("swap_to_amount", pa.decimal128(20, 0)),
        ("swap_description", pa.string()),
    ] + [(n, kind_to_arrow[k]) for n, k in sorted(PAYLOAD_FIELDS.items())] \
      + [("is_dev_create_token_trade", pa.bool_()), ("is_bot", pa.bool_())]
    ev_schema = pa.schema(fields)
    from decimal import Decimal
    dec_cols = {n for n, k in PAYLOAD_FIELDS.items() if k in ("u64", "u128")}
    dec_cols |= {"swap_from_amount", "swap_to_amount"}
    ev_cols = {}
    for name, typ in zip(ev_schema.names, ev_schema.types):
        vals = []
        for row in GOLDEN:
            v = row.get(name)
            if v is not None and name in dec_cols:
                v = Decimal(int(v))
            vals.append(v)
        ev_cols[name] = pa.array(vals, type=typ)
    pq.write_table(pa.Table.from_arrays(
        [ev_cols[n] for n in ev_schema.names], schema=ev_schema),
        os.path.join(FIXTURES_DIR, "events_golden.parquet"))
    import json
    with open(os.path.join(FIXTURES_DIR, "meta.json"), "w") as f:
        json.dump({"bot_wallet": BOT_WALLET,
                   "seed": "per-scenario:fixture:<name>",
                   "n_transactions": len(TXS), "n_events": len(GOLDEN)}, f)
    print(f"wrote {len(TXS)} transactions, {len(GOLDEN)} golden events"
          f" -> {FIXTURES_DIR}")


def main():
    scenarios = [
        scenario_pumpfun_trades,
        scenario_pumpfun_create_and_dev_trade,
        scenario_pumpfun_migrate,
        scenario_bonk_trades,
        scenario_bonk_initialize_and_dev,
        scenario_bonk_migrations,
        scenario_pumpswap_trades,
        scenario_pumpswap_pool_ops,
        scenario_cpmm,
        scenario_clmm,
        scenario_ammv4,
        scenario_meteora_swaps,
        scenario_meteora_init_pools,
        scenario_inner_instruction_event,
        scenario_inner_swap_trailing_transfers,
        scenario_negatives,
        scenario_accounts,
    ]
    for fn in scenarios:
        # Independent per-scenario seed (name-derived, so insertion order
        # is irrelevant): adding/removing/reordering one scenario no
        # longer shifts the shared RNG stream and churns every other
        # scenario's golden rows.
        rng.seed(f"fixture:{fn.__name__}")
        fn()
    write_parquet()
    write_account_parquet()


if __name__ == "__main__":
    main()
