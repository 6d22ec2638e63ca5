"""Cross-batch streaming deduplication for the event stream.

Why it exists: the engine's checkpointed foreachBatch delivery is
at-least-once (SURVEY §2.10 — stronger than the reference's
at-most-once-under-Drop backpressure), and the reference's live
transport can redeliver a transaction after a reconnect/subscription
refresh (`streaming/yellowstone_grpc.rs` reconnect path). A consumer
that needs effectively-once event delivery therefore wants a
cross-batch duplicate filter in front of the sink.

Spark-first design: `dropDuplicatesWithinWatermark` — keyed streaming
state holding one entry per event identity, EVICTED once the event-time
watermark passes, so state is bounded by (event rate x watermark
horizon) instead of growing forever. That is the same bounded-memory
guarantee the reference's GlobalState cap exists for, expressed with
the engine-native time bound (cf. `streaming/state.py` module
docstring). At 100 TB/cluster scale the state is hash-partitioned by
the dedup key across executors (signature is a 64-byte uniform hash —
no skew), and the per-batch work is a narrow keyed lookup, no extra
exchange beyond the state partitioning itself.

The event identity is (signature, event_type, outer_index,
inner_index): a redelivered transaction replays exactly those rows.
NULL inner_index is a legal key value (groupBy/dropDuplicates NULL-safe
equality matches it to itself).

Fork caveat (deliberate): the default identity omits ``slot``, so a
transaction that re-lands on a DIFFERENT slot after a fork within the
watermark horizon is collapsed into its first delivery — consumers see
one event, at the first-landed slot. That matches this operator's
purpose (transport-redelivery suppression: a replayed message is the
same payload, slot included) but differs from the reference transport,
which would deliver both landings. Consumers that need fork
re-landings delivered pass ``fork_aware=True`` (adds ``slot`` to the
key, at the cost of delivering genuine same-payload redeliveries
twice when a fork changed the slot between them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENT_IDENTITY = ("signature", "event_type", "outer_index", "inner_index")


def dedup_event_stream(events: DataFrame,
                       watermark: str = "10 minutes",
                       time_col: str | None = None,
                       key_cols: tuple[str, ...] = EVENT_IDENTITY,
                       fork_aware: bool = False
                       ) -> DataFrame:
    """Drop cross-batch duplicate deliveries of the same event.

    ``watermark`` bounds both lateness tolerance and state size: a
    duplicate arriving within the horizon is dropped; the key's state
    is evicted after it.

    The state horizon runs on RECEIVE time by default (``time_col=None``
    derives it from ``recv_us``, falling back to the batch timestamp),
    not ``block_time``, for two reasons: redelivery is a receive-time
    phenomenon (a reconnect replays what was just received, regardless
    of chain time), and ``block_time`` is NULL on the shred path before
    BlockMeta backfill — a NULL event time keys the row's state to
    epoch 0, so it would be evicted at the first real watermark advance
    and the redelivered row would sail through (observed empirically).
    Pass an explicit ``time_col`` to anchor the horizon elsewhere.

    Mixed-clock caveat for the NULL-``recv_us`` fallback: those rows
    take the driver's ``current_timestamp()`` (processing time) while
    the rest carry receive time. When processing time runs AHEAD of the
    feed's receive timestamps (e.g. replaying an old archive), a batch
    of mostly-NULL rows advances the watermark past the genuine
    receive times and expires their dedup state before the configured
    horizon. Live feeds are immune (recv_us ~= wall clock, and the
    transports always stamp recv_us); archive replays should either
    carry recv_us throughout or pass an explicit ``time_col``.

    ``fork_aware=True`` adds ``slot`` to the identity so a post-fork
    re-landing on a new slot is delivered instead of collapsed (module
    docstring).
    """
    keys = list(key_cols) + (["slot"] if fork_aware
                             and "slot" not in key_cols else [])
    if time_col is not None:
        return (events.withWatermark(time_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    with_ts = events.withColumn(
        "_dedup_recv_ts",
        F.coalesce(F.timestamp_micros(F.col("recv_us")),
                   F.current_timestamp()))
    return (with_ts
            .withWatermark("_dedup_recv_ts", watermark)
            .dropDuplicatesWithinWatermark(keys)
            .drop("_dedup_recv_ts"))
