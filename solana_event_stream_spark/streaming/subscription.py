"""S3 system-transfer subscription and S5 dynamic subscription update.

S3 (`yellowstone_sub_system.rs:34-113`): a thin composition — the Geyser
filter `account_required = [system program]` with optional
include/exclude, then the NewTransfer projection {slot, signature, tx}
WITHOUT decoding (`:105-112`). Client-side form below; the server-side
form is the same options pushed through sources/yellowstone.py.

S5 (`yellowstone_grpc.rs:293-343`): the reference swaps server-side
filters on a live stream through a control channel. Structured Streaming
fixes source options at query start, so the engine offers the two
documented equivalents:

1. ``start_dynamic_filtered_stream`` — CLIENT-side filter table re-read
   every micro-batch inside ``foreachBatch`` (a stream-static join does
   NOT work here: Spark pins the static side's file listing at plan
   time, so an overwritten spec file is never re-read; re-creating the
   spec DataFrame per batch is the supported refresh idiom). Overwriting
   the spec file changes which rows pass WITHOUT restarting the query —
   the reference's observable behavior (subsequent messages are filtered
   by the new spec; in-flight messages are not re-filtered).
2. ``restart_with_options`` — SERVER-side pushdown change: stop the
   query and rebuild it with new source options. Checkpointed offsets
   make the restart seamless for replayable sources; for the live gRPC
   source the reference itself keeps no offsets (at-most-once), so a
   restart loses exactly what a reconnect would.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from ..registry import SYSTEM_PROGRAM_ID

FILTER_SPEC_SCHEMA = "kind string, account string"


def subscribe_system(raw_tx: DataFrame,
                     account_include: list[str] | None = None,
                     account_exclude: list[str] | None = None) -> DataFrame:
    """S3: transactions touching the system program -> NewTransfer rows
    (`yellowstone_sub_system.rs:44-49` filter; `:105-112` projection).
    Works on batch and streaming raw-transaction DataFrames."""
    from ..operators.filters import filter_transactions

    filtered = filter_transactions(
        raw_tx, account_include=account_include,
        account_exclude=account_exclude,
        account_required=[SYSTEM_PROGRAM_ID])
    tx_cols = [c for c in raw_tx.columns
               if c not in ("slot", "signature")]
    return filtered.select(
        F.col("slot"), F.col("signature"),
        F.struct(*[F.col(c) for c in tx_cols]).alias("tx"))


def write_filter_spec(path: str, account_include=None, account_exclude=None,
                      account_required=None) -> None:
    """Materialize a filter spec the dynamic filter re-reads per batch.
    One JSON object per line: {"kind": include|exclude|required,
    "account": <pubkey>} — the F4 triple as data, not plan."""
    rows = []
    for kind, accounts in (("include", account_include),
                           ("exclude", account_exclude),
                           ("required", account_required)):
        for a in accounts or []:
            rows.append({"kind": kind, "account": a})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def apply_filter_spec(batch_df: DataFrame, spark, spec_path: str) -> DataFrame:
    """Read the spec table FRESH (new DataFrame -> new file listing) and
    apply the F4 triple to one micro-batch. Empty sets disable their
    clause (include=[] keeps everything), matching
    `grpc/subscription.rs:108-131` where absent filters are omitted from
    the request."""
    from ..operators.filters import filter_transactions

    spec_rows = (spark.read.schema(FILTER_SPEC_SCHEMA)
                 .json(spec_path).collect())
    sets: dict[str, list[str]] = {"include": [], "exclude": [],
                                  "required": []}
    for r in spec_rows:
        if r.kind in sets and r.account:
            sets[r.kind].append(r.account)
    return filter_transactions(
        batch_df,
        account_include=sets["include"] or None,
        account_exclude=sets["exclude"] or None,
        account_required=sets["required"] or None)


def start_dynamic_filtered_stream(raw_tx: DataFrame, spark, spec_path: str,
                                  batch_fn, checkpoint: str,
                                  trigger: dict | None = None):
    """S5 client-side: run the stream with a per-batch refreshed filter
    spec — the Spark equivalent of the reference's control-channel update
    (`yellowstone_grpc.rs:293-343`). `write_filter_spec(spec_path, ...)`
    mid-stream changes the rows delivered to ``batch_fn`` from the next
    micro-batch on.

    Scale note: the spec is collected on the driver (it is a filter
    list, bounded like the reference's SubscribeRequest) and folded into
    the batch plan as literals — executors never read the spec file.
    """
    def _fb(df, batch_id):
        batch_fn(apply_filter_spec(df, spark, spec_path), batch_id)

    writer = (raw_tx.writeStream.foreachBatch(_fb)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def restart_with_options(query, build_query, new_options: dict,
                         timeout_s: int = 60):
    """S5 server-side: stop the running query and rebuild it with new
    source options (the pushdown path). Returns the new StreamingQuery.

    ``build_query(options) -> StreamingQuery`` is the caller's factory —
    typically readStream with the merged options through the same
    checkpoint location. The reference's live update keeps the gRPC
    connection; Spark re-opens it, which for a source without offset
    persistence (reference parity) has the same delivery guarantee:
    messages between stop and resubscribe are lost (at-most-once).
    """
    query.stop()
    query.awaitTermination(timeout_s)
    return build_query(new_options)
