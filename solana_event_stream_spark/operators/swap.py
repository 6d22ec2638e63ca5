"""J2 swap-data look-ahead (SURVEY §2.6): from an event's position, walk
subsequent inner instructions that are SPL-token / system transfers, match
(source, destination) against the event's user/vault token accounts, and
fill {from_mint, to_mint, from_amount, to_amount}.

Faithful port of common/types.rs:369-535 (and its grpc twin :539-705),
split across the JVM and Python for scale:

- The POSITIONAL half (scan starts at inner position current_index+1;
  stops at the first instruction whose program is not an SPL/system
  program, types.rs:461-465; transfer forms types.rs:475-489: tag 12
  (transferChecked, >=4 accts, amount LE u64 at [1..9], src=acc0
  dst=acc2), tag 3 (transfer, >=3 accts, amount at [1..9], src=acc0
  dst=acc1), tag 2 (system transfer, >=2 accts, amount at [4..12],
  src=acc0 dst=acc1)) runs as Catalyst array expressions in
  plans/pipeline.py (`transfer_candidates`), so the full inner-group
  payload never crosses the Arrow boundary.
- The STATEFUL half below (six account-pair match cases,
  types.rs:491-517, first-wins per field; early exit when both mints or
  both amounts are known, types.rs:518-523) folds over the pre-extracted
  (source, dest, amount) candidates — it depends on the decoded event
  payload, which only exists Python-side.
"""

from __future__ import annotations

from ..registry import SOL_MINT, ZERO_PUBKEY

# event_type -> (from_mint_f, to_mint_f, user_from_f, user_to_f,
#                from_vault_f, to_vault_f, description)
# Field names refer to decoded instruction-event payload keys.
# types.rs:392-451 match arms.
_KEYS = {
    "BonkTrade": ("base_token_mint", "quote_token_mint", "user_base_token",
                  "user_quote_token", "base_vault", "quote_vault", None),
    "RaydiumCpmmSwap": ("input_token_mint", "output_token_mint",
                        "input_token_account", "output_token_account",
                        "input_vault", "output_vault", None),
    "RaydiumClmmSwap": (None, None, "input_token_account",
                        "output_token_account", "input_vault", "output_vault",
                        "Unable to get from_mint and to_mint from RaydiumClmmSwapEvent"),
    "RaydiumClmmSwapV2": ("input_vault_mint", "output_vault_mint",
                          "input_token_account", "output_token_account",
                          "input_vault", "output_vault", None),
    "RaydiumAmmV4Swap": (None, None, "user_source_token_account",
                         "user_destination_token_account",
                         "pool_pc_token_account", "pool_coin_token_account",
                         "Unable to get from_mint and to_mint from RaydiumAmmV4SwapEvent"),
}

_EVENT_TYPE_TO_KEYS = {
    "BonkBuyExactIn": "BonkTrade", "BonkBuyExactOut": "BonkTrade",
    "BonkSellExactIn": "BonkTrade", "BonkSellExactOut": "BonkTrade",
    "RaydiumCpmmSwapBaseInput": "RaydiumCpmmSwap",
    "RaydiumCpmmSwapBaseOutput": "RaydiumCpmmSwap",
    "RaydiumClmmSwap": "RaydiumClmmSwap",
    "RaydiumClmmSwapV2": "RaydiumClmmSwapV2",
    "RaydiumAmmV4SwapBaseIn": "RaydiumAmmV4Swap",
    "RaydiumAmmV4SwapBaseOut": "RaydiumAmmV4Swap",
}


def scan_swap_data(event_type: str, payload: dict, candidates):
    """Return flattened swap_data dict or None.

    ``candidates``: ordered list of (source, dest, amount) tuples — the
    transfer-shaped inner instructions after the event's position, already
    truncated at the first non-system-program instruction by the JVM
    pre-scan (plans/pipeline.py).
    """
    swap = {"from_mint": ZERO_PUBKEY, "to_mint": ZERO_PUBKEY,
            "from_amount": 0, "to_amount": 0, "description": None}

    from_mint = to_mint = ZERO_PUBKEY
    user_from = user_to = from_vault = to_vault = ZERO_PUBKEY

    if event_type in ("PumpFunBuy", "PumpFunSell"):
        # types.rs:402-405
        is_buy = bool(payload.get("is_buy"))
        mint = payload.get("mint") or ZERO_PUBKEY
        swap["from_mint"] = SOL_MINT if is_buy else mint
        swap["to_mint"] = mint if is_buy else SOL_MINT
    elif event_type == "PumpSwapBuy":
        swap["from_mint"] = payload.get("quote_mint") or ZERO_PUBKEY
        swap["to_mint"] = payload.get("base_mint") or ZERO_PUBKEY
    elif event_type == "PumpSwapSell":
        swap["from_mint"] = payload.get("base_mint") or ZERO_PUBKEY
        swap["to_mint"] = payload.get("quote_mint") or ZERO_PUBKEY
    else:
        keys = _KEYS.get(_EVENT_TYPE_TO_KEYS.get(event_type, ""))
        if keys:
            fm, tm, uf, ut, fv, tv, desc = keys
            if desc:
                swap["description"] = desc
            from_mint = (payload.get(fm) if fm else None) or ZERO_PUBKEY
            to_mint = (payload.get(tm) if tm else None) or ZERO_PUBKEY
            user_from = payload.get(uf) or ZERO_PUBKEY
            user_to = payload.get(ut) or ZERO_PUBKEY
            from_vault = payload.get(fv) or ZERO_PUBKEY
            to_vault = payload.get(tv) or ZERO_PUBKEY

    for source, dest, amount in candidates:
        if source == user_to and dest == to_vault:
            swap["from_mint"], swap["from_amount"] = to_mint, amount
        elif source == from_vault and dest == user_from:
            swap["to_mint"], swap["to_amount"] = from_mint, amount
        elif source == user_from and dest == from_vault:
            swap["from_mint"], swap["from_amount"] = from_mint, amount
        elif source == to_vault and dest == user_to:
            swap["to_mint"], swap["to_amount"] = to_mint, amount
        elif source == user_from and dest == to_vault:
            swap["from_mint"], swap["from_amount"] = from_mint, amount
        elif source == from_vault and dest == user_to:
            swap["to_mint"], swap["to_amount"] = to_mint, amount

        if swap["from_mint"] != ZERO_PUBKEY and swap["to_mint"] != ZERO_PUBKEY:
            break
        if swap["from_amount"] != 0 and swap["to_amount"] != 0:
            break

    if swap["from_mint"] != ZERO_PUBKEY or swap["to_mint"] != ZERO_PUBKEY \
            or swap["from_amount"] != 0 or swap["to_amount"] != 0:
        return swap
    return None
