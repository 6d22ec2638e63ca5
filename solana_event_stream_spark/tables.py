"""Loaders for the driver-provided testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings -- one parquet each under the sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_nanos_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize the parquet-dependent physical type of ``ts`` to TIMESTAMP.

    Two historical encodings of events.parquet:
    - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong it
      arrives as LONG nanoseconds -> truncate to micros (same as DuckDB's
      TIMESTAMP_NS -> TIMESTAMP cast) and convert.
    - timestamp[us] without TZ annotation: arrives as TIMESTAMP_NTZ, which
      LTZ-only functions (unix_micros, ...) reject. Session TZ is pinned
      UTC (session.py), so casting to TIMESTAMP is semantically identical.
    """
    if col in df.columns:
        dt = df.schema[col].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_nanos_ts(df, "ts")
    return df


def spread_frame(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Conditionally spread a frame across all cores.

    For frames that feed expensive per-row expressions (embedding dot
    products, shingle hashing, gram tallies): a small-SF parquet scan
    arrives as 1-3 splits, which would serialize the narrow compute on
    one task. One round-robin shuffle of the raw rows costs
    microseconds here and lets every core work.

    Self-tuning: the shuffle only happens when the plan has fewer
    partitions than the cluster's parallelism. At real scale (100 TB)
    the scan already has thousands of splits, so this is a no-op there
    — no unconditional full shuffle of the corpus. Streaming frames
    pass through untouched (no .rdd on unbounded plans).
    """
    if df.isStreaming:
        return df
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + :func:`spread_frame` (see there for the scale
    story)."""
    return spread_frame(spark, load_table(spark, sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str,
             register_views: bool = False) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
            if register_views:
                out[name].createOrReplaceTempView(name)
    return out
