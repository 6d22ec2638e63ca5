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
applies) cannot be expressed in a streaming write — run
`sources.replay.compact_archive(..., sort_within=("program_id",
"slot"))` periodically (with the stream stopped or against a snapshot)
to restore both the large-file profile and tight row-group stats.
"""

from __future__ import annotations

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
                               dedup_redelivery: str | None = None):
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
    """
    from ..plans.pipeline import build_events_core
    from ..registry import ALL_PROTOCOLS

    events = build_events_core(raw_stream, protocols or ALL_PROTOCOLS)
    if dedup_redelivery is not None:
        from .dedup import dedup_event_stream
        events = dedup_event_stream(events, watermark=dedup_redelivery)
    return _start_lake_writer(events, archive_dir, checkpoint_dir,
                              slots_per_dir, available_now,
                              processing_time, max_records_per_file,
                              writer_options)


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
                                 dedup_redelivery: str | None = None):
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
                              writer_options)


def _start_lake_writer(events: DataFrame, archive_dir: str,
                       checkpoint_dir: str, slots_per_dir: int,
                       available_now: bool, processing_time: str,
                       max_records_per_file: int | None,
                       writer_options: dict | None):
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
    return writer.start()


def read_event_archive_stream(spark: SparkSession, archive_dir: str,
                              max_files_per_trigger: int = 16
                              ) -> DataFrame:
    """STREAM the decoded-event lake: downstream jobs (analytics,
    training-data extraction) tail committed event files instead of
    re-decoding raw transactions. Schema comes from the committed
    files; new files appear as micro-batches. `slot_range` rides along
    for windowed downstream filters."""
    schema = spark.read.parquet(archive_dir).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(archive_dir))


def load_event_archive(spark: SparkSession, archive_dir: str) -> DataFrame:
    """Batch-read the streamed event archive (commit-log aware: only
    committed files are visible). `slot_range` is kept for pruning;
    use :func:`read_event_archive_slot_window` for windowed reads or
    drop it yourself."""
    return spark.read.parquet(archive_dir)


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
