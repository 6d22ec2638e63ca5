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


def read_transaction_stream(spark: SparkSession, archive_path: str,
                            max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming DataFrame of raw transactions from a replay archive."""
    return (spark.readStream
            .schema(RAW_TRANSACTION_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(os.path.join(archive_path, "*")))
