"""Fixture generator: golden-first corpus for the event pipeline.

Constructs event scenarios as dicts, hand-ENCODES them into transaction
byte layouts (independent of the package's decoders — the pipeline must
round-trip them back), and writes:

  /root/repo/fixtures/raw_transactions.parquet  (FIXTURES.md §1 schema)
  /root/repo/fixtures/events_golden.parquet     (FIXTURES.md §4, flattened)

Deterministic: seed 42. Run: python tests/gen_fixtures.py

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
        json.dump({"bot_wallet": BOT_WALLET, "seed": 42,
                   "n_transactions": len(TXS), "n_events": len(GOLDEN)}, f)
    print(f"wrote {len(TXS)} transactions, {len(GOLDEN)} golden events"
          f" -> {FIXTURES_DIR}")


def main():
    scenario_pumpfun_trades()
    scenario_pumpfun_create_and_dev_trade()
    scenario_pumpfun_migrate()
    scenario_bonk_trades()
    scenario_bonk_initialize_and_dev()
    scenario_bonk_migrations()
    scenario_negatives()
    write_parquet()


if __name__ == "__main__":
    main()
