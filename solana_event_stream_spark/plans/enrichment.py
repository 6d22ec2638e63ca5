"""Lake as-of enrichment: attach the latest decoded ACCOUNT STATE to
each trade event as-of its slot.

The temporal generalization of the reference's look-ahead enrichment
(/root/reference/src/common/types.rs:369-535 fills a trade's pool /
bonding-curve figures from account writes it sees in the SAME
transaction via core/account_event_parser.rs): with both the decoded
transaction lake and the decoded account lake slot-ordered on disk
(streaming/event_archive.py), every trade can carry the pool or
bonding-curve state as of ANY earlier slot — state the reference can
only see when the write happens to share the trade's transaction.

Shape (100 TB): one :func:`~..operators.temporal.asof_join` — both
lakes shuffle ONCE on the account key, then a keyed window fill; no
range explosion, no per-row probing. Hot accounts (a viral mint's
bonding curve taking a large corpus fraction of both trades and
writes) serialize a per-key window into one task, so ``skewed=True``
switches to :func:`~..operators.temporal.asof_join_skewed` — identical
semantics (differential-tested there and here), but the fill runs per
(account, slot-slice) with a boundary-carry frame, so one hot account
spans ``slot_span / slice_slots`` tasks.

Trades whose account column is NULL (protocols without a bonding
curve / pool field) bypass the join entirely and come back with NULL
state — both for correctness (NULL keys never match) and because a
window partition would otherwise collect every NULL-key row into one
task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.temporal import asof_join, asof_join_skewed

#: default state payload: the pump-style bonding-curve figures
#: (plans/account_pipeline.ACCOUNT_EVENT_SCHEMA) — the columns the
#: reference's within-transaction enrichment fills on trades.
DEFAULT_STATE_COLS = (
    "virtual_token_reserves", "virtual_sol_reserves",
    "real_token_reserves", "real_sol_reserves", "complete",
)

#: default slot-slice width for the skewed form: ~one day of slots at
#: ~400ms/slot (216k slots) — same magnitude as asof_join_skewed's
#: time default.
DEFAULT_SLICE_SLOTS = 216_000

#: the decoded trade/swap event types (registry D1 dispatch names) the
#: lake wiring enriches by default — every buy/sell/swap across the 7
#: builtin protocols.
TRADE_EVENT_TYPES = (
    "PumpFunBuy", "PumpFunSell",
    "PumpSwapBuy", "PumpSwapSell",
    "BonkBuyExactIn", "BonkSellExactIn", "BonkSellExactOut",
    "RaydiumAmmV4SwapBaseIn", "RaydiumAmmV4SwapBaseOut",
    "RaydiumCpmmSwapBaseInput", "RaydiumCpmmSwapBaseOutput",
    "RaydiumClmmSwap", "RaydiumClmmSwapV2",
    "MeteoraDammV2Swap", "MeteoraDammV2Swap2",
)


def enrich_trades_asof(trades: DataFrame, account_states: DataFrame,
                       trade_account: str = "bonding_curve",
                       state_cols: tuple[str, ...] = DEFAULT_STATE_COLS,
                       tiebreaker: str | None = "recv_us",
                       strict: bool = False,
                       slot_tolerance: int | None = None,
                       skewed: bool = False,
                       slice_slots: int = DEFAULT_SLICE_SLOTS
                       ) -> DataFrame:
    """All ``trades`` columns plus ``state_slot`` (the matched account
    write's slot, NULL when no state exists yet) and each requested
    state column as ``state_<name>``.

    - ``trade_account``: the trade column naming the account whose
      state to attach (``bonding_curve`` for pump-style trades,
      ``pool`` / ``amm_pool`` for AMM trades).
    - ``strict=False`` (default): a trade sees state written in its OWN
      slot (``account.slot <= trade.slot``) — within one slot Solana
      applies the account write with the transaction, which is exactly
      the state the reference's same-transaction enrichment reads;
      ``strict=True`` restricts to strictly-earlier slots.
    - ``tiebreaker`` picks ONE state per (account, slot)
      deterministically when a slot carries several writes (max
      ``recv_us`` = the last received, i.e. latest state).
    - ``slot_tolerance``: max slot age; older matched state expires to
      NULL (a pool untouched for N slots is treated as unknown).
    - ``skewed=True``: hot-account form (see module docstring).
    """
    rc = tuple(f"state_{c}" for c in state_cols)
    key = F.col(trade_account)
    # slots ride the tested timestamp-based operator via the monotone
    # slot -> timestamp_micros(slot) embedding (tolerance_us therefore
    # IS a slot count).
    keyed = (trades.filter(key.isNotNull())
             .withColumn("_acct", key)
             .withColumn("_slot_ts", F.timestamp_micros(F.col("slot"))))
    right = account_states.select(
        F.col("pubkey").alias("_acct"),
        F.timestamp_micros(F.col("slot")).alias("_slot_ts"),
        *([F.col(tiebreaker).alias("_state_tb")] if tiebreaker else []),
        *[F.col(c).alias(f"state_{c}") for c in state_cols])
    join_fn = asof_join_skewed if skewed else asof_join
    kwargs = dict(on=["_acct"], left_ts="_slot_ts", right_ts="_slot_ts",
                  right_cols=rc,
                  tiebreaker="_state_tb" if tiebreaker else None,
                  strict=strict, tolerance_us=slot_tolerance)
    if skewed:
        kwargs["slice_duration_us"] = slice_slots
    joined = join_fn(keyed, right, **kwargs)

    out_cols = [*trades.columns,
                F.unix_micros(F.col("matched_ts")).alias("state_slot"),
                *rc]
    enriched = joined.select(*out_cols)
    # keyless trades bypass the join — a pure filter branch, so they
    # never enter the key shuffle or a NULL window partition.
    keyless = trades.filter(key.isNull())
    rtypes = {c: right.schema[c].dataType for c in rc}
    null_side = keyless.select(
        *trades.columns, F.lit(None).cast("long").alias("state_slot"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rc])
    return enriched.unionByName(null_side)


def start_enriched_trade_stream(trade_stream: DataFrame,
                                account_archive_dir: str,
                                on_batch,
                                checkpoint_dir: str,
                                account_compacted_dir: str | None = None,
                                refresh_accounts: bool = True,
                                available_now: bool = False,
                                processing_time: str = "10 seconds",
                                **enrich_kwargs):
    """The STREAMING form of the enrichment — closest to what the
    reference does live, but with the full account history behind it:
    each micro-batch of decoded trades (any streaming DataFrame — a
    `build_events_core` stream, or `read_event_archive_stream` tailing
    the trade lake) is enriched against the account lake via
    :func:`enrich_trades_asof` inside ``foreachBatch``, then handed to
    ``on_batch(enriched_df, batch_id)``.

    Why foreachBatch: the as-of shape is a keyed WINDOW fill, which
    Structured Streaming cannot run on an unbounded stream — but a
    micro-batch is a bounded frame, so the exact batch operator (same
    semantics, same tests) applies per trigger. This is also the
    reference's observable behavior generalized: it enriches a trade
    with account state it has seen SO FAR; here "so far" is the whole
    account lake as of the trigger.

    ``refresh_accounts=True`` re-resolves the account lake through the
    manifest EVERY batch (new compactions/sink commits picked up at
    trigger granularity — the manifest read is O(1)); False pins the
    frame resolved at start. ``enrich_kwargs`` pass through
    (``trade_account``, ``state_cols``, ``skewed`` for hot mints, ...).
    Exactly-once is the caller's contract via ``on_batch`` + the
    checkpoint, same as every foreachBatch sink."""
    from ..streaming.event_archive import load_event_lake

    pinned: list[DataFrame | None] = [None]

    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if refresh_accounts or pinned[0] is None:
            pinned[0] = load_event_lake(s, account_archive_dir,
                                        account_compacted_dir)
        on_batch(enrich_trades_asof(batch_df, pinned[0],
                                    **enrich_kwargs), batch_id)

    writer = (trade_stream.writeStream.foreachBatch(_proc)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def enrich_trades_asof_from_lakes(spark: SparkSession,
                                  trade_archive_dir: str,
                                  account_archive_dir: str,
                                  trade_compacted_dir: str | None = None,
                                  account_compacted_dir: str | None = None,
                                  event_types: tuple[str, ...] =
                                  TRADE_EVENT_TYPES,
                                  **kwargs) -> DataFrame:
    """Convenience wiring: both sides read through the lake manifests
    (:func:`~..streaming.event_archive.load_event_lake` — compacted
    generations + committed sink tail), trades filtered to
    ``event_types`` (default: every builtin buy/sell/swap). ``kwargs``
    pass through to :func:`enrich_trades_asof`."""
    from ..streaming.event_archive import load_event_lake

    trades = (load_event_lake(spark, trade_archive_dir,
                              trade_compacted_dir)
              .filter(F.col("event_type").isin(*event_types)))
    accounts = load_event_lake(spark, account_archive_dir,
                               account_compacted_dir)
    return enrich_trades_asof(trades, accounts, **kwargs)
