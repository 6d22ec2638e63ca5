"""Replay source: stream an archived transaction parquet directory as
micro-batches (S4 batch entry point made streaming; the
streaming==batch equivalence surface of SURVEY §5.4).

The archive layout is one parquet file per slot-bucket; with
``maxFilesPerTrigger=1`` each micro-batch replays one bucket in slot
order — mirroring how the live gRPC source delivers slot-ordered
transactions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_TRANSACTION_SCHEMA


def write_slot_bucketed_archive(raw_tx: DataFrame, path: str,
                                n_buckets: int = 4) -> None:
    """Batch archive writer: slot-bucketed layout so batch scans prune by
    slot range and the replay source micro-batches in slot order."""
    from pyspark.sql import functions as F
    (raw_tx
     .withColumn("slot_bucket", (F.col("slot") % n_buckets).cast("int"))
     .repartition("slot_bucket")
     .write.mode("overwrite").partitionBy("slot_bucket").parquet(path))


def _read_archive_stream(spark: SparkSession, archive_path: str, schema,
                         max_files_per_trigger: int) -> DataFrame:
    """Shared replay-stream recipe: explicit schema + per-trigger file
    cap; the `*` glob descends into partition dirs as plain data (no
    partition-column inference, matching the batch writers)."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(os.path.join(archive_path, "*")))


def read_transaction_stream(spark: SparkSession, archive_path: str,
                            max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming DataFrame of raw transactions from a replay archive."""
    return _read_archive_stream(spark, archive_path,
                                RAW_TRANSACTION_SCHEMA,
                                max_files_per_trigger)


def write_slot_range_archive(raw_tx: DataFrame, path: str,
                             slots_per_bucket: int = 10_000,
                             sort_within: tuple[str, ...] | None = None
                             ) -> None:
    """Archive layout for 100 TB scans: partition directories keyed by
    slot RANGE (slot // slots_per_bucket), so a slot-range predicate
    prunes whole directories at planning time (PartitionFilters), unlike
    the modulo layout of `write_slot_bucketed_archive` (whose buckets
    exist to give the replay source micro-batch boundaries, not pruning).

    At mainnet rates (~2.5 slots/s) the default bucket is ~1.1 hours of
    chain — large enough for parquet files in the 100 MB-1 GB sweet
    spot, small enough that a recent-window query touches few dirs.

    ``sort_within`` orders rows inside each partition directory before
    the write, which tightens the parquet row-group min/max statistics
    on those columns so equality/range predicates skip whole row groups
    at scan time (the second pruning level below directory pruning).
    For a decoded-event archive the right order is
    ``("program_id", "slot")``: the slot dimension is already handled
    by the directory key, so leading with program_id gives a
    program-filtered read contiguous runs — row groups that don't
    contain the program are skipped entirely (measured in
    tests/test_archive.py and PLANS.md §archive).
    """
    from pyspark.sql import functions as F
    df = raw_tx.withColumn(
        "slot_range", (F.col("slot") / slots_per_bucket).cast("long"))
    df = df.repartition("slot_range")
    if sort_within:
        df = df.sortWithinPartitions("slot_range", *sort_within)
    (df.write.mode("overwrite").partitionBy("slot_range").parquet(path))


def read_account_stream(spark: SparkSession, archive_path: str,
                        max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming DataFrame of raw account updates from a replay archive
    (the account analog of `read_transaction_stream`)."""
    from ..schemas import RAW_ACCOUNT_SCHEMA
    return _read_archive_stream(spark, archive_path, RAW_ACCOUNT_SCHEMA,
                                max_files_per_trigger)


def write_account_archive(raw_accounts: DataFrame, path: str,
                          slots_per_bucket: int = 10_000) -> None:
    """Account-update archive with the SAME two-level pruning layout as
    the transaction archive: slot-range directory partitions (planning-
    time pruning) + rows sorted by ("owner", "slot") inside each
    partition. The account pipeline's first predicate is owner-program
    membership (`plans/account_pipeline.py` dispatch, mirroring the
    reference's account-owner routing), so leading the sort with
    `owner` gives an owner-filtered scan contiguous runs — row groups
    without the program are skipped wholesale, the account analog of
    the transaction archive's measured 12.8x row reduction
    (tests/test_archive.py)."""
    write_slot_range_archive(raw_accounts, path, slots_per_bucket,
                             sort_within=("owner", "slot"))


def read_archive_slot_window(spark: SparkSession, path: str,
                             min_slot: int | None = None,
                             max_slot: int | None = None,
                             slots_per_bucket: int = 10_000) -> DataFrame:
    """Batch-read a slot window with DIRECTORY pruning: the slot
    predicate is restated on the partition column so Catalyst prunes at
    file-listing time (visible as PartitionFilters in the scan), then
    re-applied exactly on `slot` for row precision."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(path)
    if min_slot is not None:
        df = df.filter(
            (F.col("slot_range") >= min_slot // slots_per_bucket)
            & (F.col("slot") >= min_slot))
    if max_slot is not None:
        df = df.filter(
            (F.col("slot_range") <= max_slot // slots_per_bucket)
            & (F.col("slot") <= max_slot))
    return df.drop("slot_range")


def compact_archive(spark: SparkSession, path: str,
                    sort_within: tuple[str, ...] | None = None) -> None:
    """Compaction pass: rewrite each slot-range partition into one file
    (small-file pressure is the failure mode of streaming archive
    writers at scale; compaction restores the large-file scan profile).
    Rewrites into place via a staging dir + atomic renames so a reader
    never sees a half-written partition.

    ``sort_within`` additionally restores the row-group-stat ordering a
    streaming writer cannot express (e.g. ("program_id", "slot") for
    the decoded-event archive, `streaming/event_archive.py`). Run with
    the stream stopped (the rewrite drops the file-sink commit log)."""
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(dir=os.path.dirname(path.rstrip("/")),
                               prefix=".compact_")
    try:
        df = spark.read.parquet(path).repartition("slot_range")
        if sort_within:
            df = df.sortWithinPartitions("slot_range", *sort_within)
        (df.write.mode("overwrite").partitionBy("slot_range")
         .parquet(staging))
        backup = path.rstrip("/") + ".precompact"
        os.rename(path, backup)
        os.rename(staging, path)
        shutil.rmtree(backup)
    except BaseException:
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        raise
