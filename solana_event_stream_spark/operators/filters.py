"""Client-side filter operators (SURVEY §2.3) not already embedded in the
pipeline DAG: F3 event-type keep-list and F4 transaction account filters.

F1/F2/F6/F7 live inside plans/pipeline.py (dispatch, prefilter, vote
exclusion, length guards); F8/F9/F10 inside the decode stage. The
server-side forms of F3-F5 are option pushdown in sources/yellowstone.py;
these are their client-side equivalents for batch/archive inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def filter_event_types(events: DataFrame, include: list[str]) -> DataFrame:
    """F3: post-parse keep-list (event_parser/common/filter.rs:6-24;
    applied post-parse as in core/account_event_parser.rs:94-101)."""
    return events.filter(F.col("event_type").isin(include))


def filter_transactions(raw_tx: DataFrame,
                        account_include: list[str] | None = None,
                        account_exclude: list[str] | None = None,
                        account_required: list[str] | None = None
                        ) -> DataFrame:
    """F4 client-side: the Geyser TransactionFilter semantics
    (yellowstone_grpc.rs:26-30) over archived transactions —
    include: tx mentions ANY listed account; exclude: tx mentions NONE;
    required: tx mentions ALL."""
    accounts = F.concat(
        F.coalesce(F.col("static_account_keys"), F.array()),
        F.coalesce(F.col("loaded_writable_addresses"), F.array()),
        F.coalesce(F.col("loaded_readonly_addresses"), F.array()))
    out = raw_tx
    if account_include:
        out = out.filter(F.arrays_overlap(
            accounts, F.array(*[F.lit(a) for a in account_include])))
    if account_exclude:
        out = out.filter(~F.arrays_overlap(
            accounts, F.array(*[F.lit(a) for a in account_exclude])))
    if account_required:
        for a in account_required:
            out = out.filter(F.array_contains(accounts, a))
    return out


def filter_accounts(raw_accounts: DataFrame,
                    owners: list[str] | None = None,
                    pubkeys: list[str] | None = None) -> DataFrame:
    """F5 client-side: AccountFilter {account, owner}
    (yellowstone_grpc.rs:34-38)."""
    out = raw_accounts
    if owners:
        out = out.filter(F.col("owner").isin(owners))
    if pubkeys:
        out = out.filter(F.col("pubkey").isin(pubkeys))
    return out
