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


def _estimated_scan_partitions(spark: SparkSession, path: str) -> int | None:
    """Replicate FilePartition.getFilePartitions' split math from the
    parquet file sizes on local disk — the partition count
    ``df.rdd.getNumPartitions()`` would report for a fresh scan,
    WITHOUT the analyze/optimize/physical-plan pass that the ``.rdd``
    conversion pays on the driver (r18, guide §7.3: that conversion
    ran once per load_spread call — ~20 plan compilations per bench
    sweep spent only to read one integer). Returns None when the
    layout is not the simple local-files case (caller falls back to
    the exact ``.rdd`` probe)."""
    try:
        if os.path.isdir(path):
            entries = list(os.scandir(path))
            # A hive-partitioned layout (subdirectories) changes which
            # files the scan sees; don't guess — exact probe (r18 ADVICE).
            if any(e.is_dir() for e in entries):
                return None
            files = [e.path for e in entries if e.name.endswith(".parquet")]
        elif os.path.isfile(path):
            files = [path]
        else:
            return None
        sizes = sorted((os.path.getsize(f) for f in files), reverse=True)
        if not sizes:
            return None
        conf = spark.conf
        max_p = int(conf.get("spark.sql.files.maxPartitionBytes"))
        open_c = int(conf.get("spark.sql.files.openCostInBytes"))
        min_n = conf.get("spark.sql.files.minPartitionNum", None)
        if not min_n:
            # FilePartition math falls back to leafNodeDefaultParallelism
            # (the conf when set, else defaultParallelism) — honor the
            # conf so a deployment that sets it keeps the estimate exact.
            min_n = conf.get("spark.sql.leafNodeDefaultParallelism", None)
        min_n = int(min_n) if min_n else spark.sparkContext.defaultParallelism
        total = sum(s + open_c for s in sizes)
        bytes_per_core = total // max(1, min_n)
        max_split = min(max_p, max(open_c, bytes_per_core))
        # file -> chunks of max_split, then greedy size-desc packing
        # (chunk order is already size-descending: whole-file chunks of
        # the sorted files, each file's remainder chunk no larger)
        chunks = []
        for s in sizes:
            while s > 0:
                chunks.append(min(s, max_split))
                s -= max_split
        chunks.sort(reverse=True)
        parts, cur = 0, 0
        for c in chunks:
            if cur + c > max_split and cur > 0:
                parts += 1
                cur = 0
            cur += c + open_c
        return parts + (1 if cur > 0 else 0)
    except Exception:
        return None


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + :func:`spread_frame` (see there for the scale
    story). The splits-vs-cores gate reads the split count from the
    file sizes (:func:`_estimated_scan_partitions`) instead of
    compiling the scan plan twice; decision and resulting plan are
    identical (pinned by tests/test_plan_quality.py)."""
    df = load_table(spark, sf_dir, name)
    if df.isStreaming:
        return df
    est = _estimated_scan_partitions(
        spark, os.path.join(sf_dir, f"{name}.parquet"))
    if est is None:
        return spread_frame(spark, df)
    cores = spark.sparkContext.defaultParallelism
    return df if est >= cores else df.repartition(cores)


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
