"""Streamed decoded-event archive: decode once, query many.

At 100 TB the expensive thing is not any single query — it is
re-running explode+dispatch+decode over the raw transaction archive
for EVERY query. This sink materializes the decode once, as a
columnar event lake with the same two-level pruning layout as the raw
archives (`sources/replay.py`): slot-range directory partitions
(planning-time PartitionFilters) over the wide event schema, written
exactly-once by Structured Streaming's file sink (the `_spark_metadata`
commit log means a concurrent batch reader only ever sees committed
files — Spark's batch parquet reader honors the log automatically when
pointed at the sink directory).

Enrichment (J3/J4/P11) is deliberately NOT baked into the archive:
the creates-pool join is computed per micro-batch on the live path,
but an archive reader can do strictly better by running
`plans.pipeline.enrich_events` over the whole archive (global pools —
the exact batch semantics). Store the core decode, enrich at read.

Row-group-level pruning (the (program_id, slot) sort the batch writer
applies) cannot be expressed in a streaming write — compaction
restores the large-file profile and tight row-group stats. Two forms:
`sources.replay.compact_archive` rewrites the sink dir in place
(stream must be stopped); `compact_event_archive_snapshot` below is
the 100 TB form — generational snapshots + an atomic manifest swap
that run WHILE the stream keeps appending (read via
`load_event_lake`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_SLOTS_PER_DIR = 10_000


def start_event_archive_stream(raw_stream: DataFrame,
                               archive_dir: str,
                               checkpoint_dir: str,
                               slots_per_dir: int = DEFAULT_SLOTS_PER_DIR,
                               protocols=None,
                               available_now: bool = False,
                               processing_time: str = "10 seconds",
                               max_records_per_file: int | None = None,
                               writer_options: dict | None = None,
                               dedup_redelivery: str | None = None,
                               state_partitions: int | None = None):
    """raw transaction stream -> decoded events -> partitioned parquet.

    Exactly-once: the file sink's commit log. Partitioning: slot-range
    directories (same key as `write_slot_range_archive`), so archived
    events get planning-time slot pruning from day one.

    ``max_records_per_file`` caps file sizes at high feed rates (the
    other half of the small-file problem: ONE giant file per partition
    per batch is as bad for parallel reads as thousands of tiny ones);
    ``writer_options`` passes any extra DataStreamWriter options
    through (e.g. parquet compression codec).

    ``dedup_redelivery``: a watermark duration (e.g. "10 minutes")
    inserts the cross-batch redelivery filter (`streaming/dedup.py`)
    before the write — an effectively-once LAKE even when the
    transport redelivers after reconnects, at the cost of the keyed
    state (same knob as `start_event_stream`).

    ``state_partitions``: state-store width for the dedup arm, applied
    to a NEW checkpoint before the first commit (the width freezes into
    the checkpoint). Default None = `state.DEFAULT_STATE_PARTITIONS`
    (the measured low-latency lever); pass an executor-sized value on a
    real cluster, or 0 to leave the session conf untouched.
    """
    from ..plans.pipeline import build_events_core

    events = build_events_core(raw_stream, protocols)
    if dedup_redelivery is not None:
        from .dedup import dedup_event_stream
        events = dedup_event_stream(events, watermark=dedup_redelivery)
    return _start_lake_writer(events, archive_dir, checkpoint_dir,
                              slots_per_dir, available_now,
                              processing_time, max_records_per_file,
                              writer_options, state_partitions,
                              stateful=dedup_redelivery is not None)


# An account update's redelivery identity: the same account state at
# the same slot from the same transaction (the tx-side analog is
# streaming/dedup.EVENT_IDENTITY).
ACCOUNT_IDENTITY = ("pubkey", "slot", "signature")


def start_account_archive_stream(raw_account_stream: DataFrame,
                                 archive_dir: str,
                                 checkpoint_dir: str,
                                 slots_per_dir: int =
                                 DEFAULT_SLOTS_PER_DIR,
                                 available_now: bool = False,
                                 processing_time: str = "10 seconds",
                                 max_records_per_file: int | None = None,
                                 writer_options: dict | None = None,
                                 dedup_redelivery: str | None = None,
                                 state_partitions: int | None = None):
    """Account-update analog: decoded account events (D3 dispatch,
    `plans/account_pipeline.py`) into the same slot-range lake layout.

    Same knobs as the tx-side sink — the small-file and redelivery
    physics are identical: ``max_records_per_file`` caps per-partition
    file sizes, ``writer_options`` passes writer options through, and
    ``dedup_redelivery`` (a watermark duration) inserts the cross-batch
    duplicate filter keyed on :data:`ACCOUNT_IDENTITY` before the
    write."""
    from ..plans.account_pipeline import build_account_events

    events = build_account_events(raw_account_stream)
    if dedup_redelivery is not None:
        from .dedup import dedup_event_stream
        events = dedup_event_stream(events, watermark=dedup_redelivery,
                                    key_cols=ACCOUNT_IDENTITY)
    return _start_lake_writer(events, archive_dir, checkpoint_dir,
                              slots_per_dir, available_now,
                              processing_time, max_records_per_file,
                              writer_options, state_partitions,
                              stateful=dedup_redelivery is not None)


def _start_lake_writer(events: DataFrame, archive_dir: str,
                       checkpoint_dir: str, slots_per_dir: int,
                       available_now: bool, processing_time: str,
                       max_records_per_file: int | None,
                       writer_options: dict | None,
                       state_partitions: int | None = None,
                       stateful: bool = False):
    from .state import resolve_state_width, pin_state_width

    out = events.withColumn(
        "slot_range", (F.col("slot") / slots_per_dir).cast("long"))
    writer = (out.writeStream.format("parquet")
              .partitionBy("slot_range")
              .option("path", archive_dir)
              .option("checkpointLocation", checkpoint_dir))
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile",
                               str(max_records_per_file))
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    restore = pin_state_width(
        events.sparkSession, checkpoint_dir,
        resolve_state_width(state_partitions, stateful))
    try:
        return writer.start()
    finally:
        restore()


# ---------------------------------------------------------------------------
# Live snapshot compaction (VERDICT r8 item 5)
#
# `sources.replay.compact_archive` rewrites the sink directory in place
# and therefore needs the stream stopped. At 100 TB the stream never
# stops, so the lake supports GENERATIONAL snapshot compaction instead:
#
#   * a snapshot absorbs the files the sink's commit log listed at one
#     point in time (committed files are immutable — the sink only ever
#     appends new files and new log entries, so the snapshot races with
#     nothing) plus the previous generation, rewritten large + sorted;
#   * a one-line JSON manifest records {gen, absorbed}; the swap is a
#     single os.replace, so a reader sees either (gen K, longer live
#     tail) or (gen K+1, shorter tail) — both complete, never a tear;
#   * `load_event_lake` = compacted generation UNION the committed sink
#     files the manifest does not absorb (explicit file list — bounded
#     by the compaction cadence, exact by construction).
#
# The streaming query is untouched throughout: it keeps appending to
# the sink directory and its own _spark_metadata log.
# ---------------------------------------------------------------------------

_LAKE_MANIFEST = "_LAKE_MANIFEST.json"


def _sink_committed_files(archive_dir: str) -> set[str]:
    """Sink-relative paths of data files the file-sink commit log lists
    (latest .compact as the base, later batch files applied on top;
    'delete' actions honored). Reading a log file the sink is writing
    concurrently is safe to skip: its files simply stay un-absorbed
    until the next snapshot."""
    import json as _json
    import os as _os
    from urllib.parse import unquote, urlparse

    log_dir = _os.path.join(archive_dir, "_spark_metadata")
    if not _os.path.isdir(log_dir):
        return set()
    batches: dict[int, str] = {}
    compacts: dict[int, str] = {}
    for name in _os.listdir(log_dir):
        if name.startswith("."):
            continue
        stem = name.split(".")[0]
        if not stem.isdigit():
            continue
        (compacts if name.endswith(".compact") else batches)[
            int(stem)] = _os.path.join(log_dir, name)
    base = max(compacts) if compacts else -1
    ordered = ([compacts[base]] if compacts else []) + [
        batches[i] for i in sorted(batches) if i > base]

    root = _os.path.abspath(archive_dir)
    out: set[str] = set()
    for path in ordered:
        try:
            with open(path) as fh:
                lines = fh.read().splitlines()
        except OSError:
            continue
        for line in lines:
            if not line.startswith("{"):
                continue
            try:
                entry = _json.loads(line)
            except ValueError:
                continue
            p = entry.get("path")
            if not p:
                continue
            rel = _os.path.relpath(
                _os.path.abspath(unquote(urlparse(p).path)), root)
            if entry.get("action") == "delete":
                out.discard(rel)
            else:
                out.add(rel)
    return out


def _read_lake_manifest(compacted_dir: str) -> dict | None:
    import json as _json
    try:
        with open(os.path.join(compacted_dir, _LAKE_MANIFEST)) as fh:
            return _json.load(fh)
    except OSError:
        return None


def compact_event_archive_snapshot(spark: SparkSession, archive_dir: str,
                                   compacted_dir: str,
                                   sort_within: tuple[str, ...] =
                                   ("program_id", "slot"),
                                   max_records_per_file: int | None = None
                                   ) -> dict:
    """Compact the lake WITHOUT stopping the stream: absorb the current
    committed sink files (+ the previous generation) into generation
    K+1 — one large sorted file per slot_range partition — and swap the
    manifest atomically. Returns {gen, absorbed_total, absorbed_new}.

    Old generations are left on disk for in-flight readers; prune them
    with :func:`prune_event_archive_generations` once drained."""
    import json as _json
    import tempfile as _tempfile

    prev = _read_lake_manifest(compacted_dir) or {"gen": 0, "absorbed": []}
    prev_absorbed = set(prev["absorbed"])
    new_files = sorted(_sink_committed_files(archive_dir) - prev_absorbed)

    parts = []
    if prev["gen"] > 0:
        parts.append(spark.read.option("mergeSchema", "true").parquet(
            os.path.join(compacted_dir, f"gen={prev['gen']}")))
    if new_files:
        parts.append(spark.read.option("mergeSchema", "true")
                     .option("basePath", archive_dir).parquet(
                         *[os.path.join(archive_dir, f)
                           for f in new_files]))
    if not parts:
        return {"gen": prev["gen"], "absorbed_total": len(prev_absorbed),
                "absorbed_new": 0}
    df = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: the sink schema may have EVOLVED between
        # the previous generation and the new tail (plug-in columns)
        df = df.unionByName(p, allowMissingColumns=True)
    df = (df.withColumn("slot_range", F.col("slot_range").cast("long"))
          .repartition("slot_range")
          .sortWithinPartitions("slot_range", *sort_within))

    gen = prev["gen"] + 1
    writer = df.write.mode("overwrite").partitionBy("slot_range")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile",
                               str(max_records_per_file))
    writer.parquet(os.path.join(compacted_dir, f"gen={gen}"))

    manifest = {"gen": gen,
                "absorbed": sorted(prev_absorbed | set(new_files))}
    fd, tmp = _tempfile.mkstemp(dir=compacted_dir, prefix=".manifest_")
    with os.fdopen(fd, "w") as fh:
        _json.dump(manifest, fh)
    os.replace(tmp, os.path.join(compacted_dir, _LAKE_MANIFEST))
    return {"gen": gen, "absorbed_total": len(manifest["absorbed"]),
            "absorbed_new": len(new_files)}


def prune_event_archive_generations(compacted_dir: str) -> list[str]:
    """Delete generations older than the manifest's current one (call
    after in-flight readers of the old generation have drained)."""
    import shutil as _shutil

    manifest = _read_lake_manifest(compacted_dir)
    if manifest is None:
        return []
    removed = []
    for name in os.listdir(compacted_dir):
        if name.startswith("gen=") and name != f"gen={manifest['gen']}":
            _shutil.rmtree(os.path.join(compacted_dir, name))
            removed.append(name)
    return removed


def load_event_lake(spark: SparkSession, archive_dir: str,
                    compacted_dir: str | None = None) -> DataFrame:
    """Read the lake through the compaction manifest: the compacted
    generation plus the committed-but-not-yet-absorbed sink tail. With
    no manifest (or no ``compacted_dir``) this is exactly
    :func:`load_event_archive`."""
    manifest = (_read_lake_manifest(compacted_dir)
                if compacted_dir is not None else None)
    if manifest is None:
        return load_event_archive(spark, archive_dir)
    gen_df = (spark.read.option("mergeSchema", "true").parquet(
        os.path.join(compacted_dir, f"gen={manifest['gen']}"))
        .withColumn("slot_range", F.col("slot_range").cast("long")))
    tail = sorted(_sink_committed_files(archive_dir)
                  - set(manifest["absorbed"]))
    if not tail:
        return gen_df
    tail_df = (spark.read.option("mergeSchema", "true")
               .option("basePath", archive_dir).parquet(
                   *[os.path.join(archive_dir, f) for f in tail])
               .withColumn("slot_range", F.col("slot_range").cast("long")))
    return gen_df.unionByName(tail_df, allowMissingColumns=True)


def read_event_archive_stream(spark: SparkSession, archive_dir: str,
                              max_files_per_trigger: int = 16,
                              merge_schema: bool = True) -> DataFrame:
    """STREAM the decoded-event lake: downstream jobs (analytics,
    training-data extraction) tail committed event files instead of
    re-decoding raw transactions. New files appear as micro-batches;
    `slot_range` rides along for windowed downstream filters.

    The stream's schema is pinned at query start from the committed
    files — with ``merge_schema=True`` (default) it is the UNION of
    every file's schema, so an archive whose schema evolved (plug-in
    columns added mid-stream) does not stay pinned to whichever file
    the single-file inference happened to sample. One footer sweep at
    query start; restart the reader to pick up later evolutions."""
    schema = (spark.read
              .option("mergeSchema", "true" if merge_schema else "false")
              .parquet(archive_dir).schema)
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(archive_dir))


def load_event_archive(spark: SparkSession, archive_dir: str,
                       merge_schema: bool = False) -> DataFrame:
    """Batch-read the streamed event archive (commit-log aware: only
    committed files are visible). `slot_range` is kept for pruning;
    use :func:`read_event_archive_slot_window` for windowed reads or
    drop it yourself.

    ``merge_schema=True`` unions the schemas of every committed file —
    required after the event schema EVOLVED mid-archive (a protocol
    plug-in registered between writes widens it; files written before
    lack the new columns, which read back NULL). Off by default: the
    footer sweep it costs is wasted on the common non-evolved archive.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(archive_dir)


def load_enriched_events(spark: SparkSession, archive_dir: str,
                         bot_wallet: str | None = None) -> DataFrame:
    """The documented enrich-at-read pattern as an API: archive core
    events + `enrich_events` with GLOBAL creates pools — equal to batch
    `build_events` over the original raws (tested in
    test_event_archive_stream_roundtrip_and_pruning)."""
    from ..plans.pipeline import enrich_events
    return enrich_events(
        load_event_archive(spark, archive_dir).drop("slot_range"),
        bot_wallet)


def read_event_archive_slot_window(spark: SparkSession, archive_dir: str,
                                   min_slot: int | None = None,
                                   max_slot: int | None = None,
                                   slots_per_dir: int =
                                   DEFAULT_SLOTS_PER_DIR) -> DataFrame:
    """Slot-window read with directory pruning — identical contract to
    `sources.replay.read_archive_slot_window`, over decoded events."""
    from ..sources.replay import read_archive_slot_window
    return read_archive_slot_window(spark, archive_dir, min_slot,
                                    max_slot, slots_per_dir)
