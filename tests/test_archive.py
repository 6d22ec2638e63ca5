"""Slot-range archive layout: directory-level partition pruning for slot
windows, and the compaction pass (small-file repair)."""

from __future__ import annotations

import glob
import io
import os
import tempfile
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _make_raw(spark):
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    return load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))


def test_slot_window_prunes_partitions(spark):
    from solana_event_stream_spark.sources.replay import (
        read_archive_slot_window, write_slot_range_archive)

    raw = _make_raw(spark)
    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        # 10 slots per bucket -> fixture slots (1001..1046) span buckets
        write_slot_range_archive(raw, archive, slots_per_bucket=10)
        buckets = sorted(glob.glob(os.path.join(archive, "slot_range=*")))
        assert len(buckets) >= 3

        win = read_archive_slot_window(spark, archive, min_slot=1001,
                                       max_slot=1009, slots_per_bucket=10)
        plan = _plan(win)
        # the slot predicate reaches the DIRECTORY level, not just rows
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1][:200]
        assert "slot_range" in pf

        # correctness: window == plain filter on the source
        expected = raw.filter((F.col("slot") >= 1001)
                              & (F.col("slot") <= 1009)).count()
        assert win.count() == expected
        assert expected > 0
        # and the pruned scan reads fewer files than the full archive
        full = spark.read.parquet(archive)
        n_all = full.select(F.input_file_name()).distinct().count()
        n_win = (read_archive_slot_window(spark, archive, 1001, 1009, 10)
                 .select(F.input_file_name()).distinct().count())
        assert n_win < n_all


def test_compact_archive(spark):
    from solana_event_stream_spark.sources.replay import (
        compact_archive, write_slot_range_archive)

    raw = _make_raw(spark)
    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_range_archive(raw, archive, slots_per_bucket=10)
        # simulate streaming small-file pressure: append fragments
        for _ in range(3):
            (raw.limit(5)
             .withColumn("slot_range", (F.col("slot") / 10).cast("long"))
             .repartition(4)
             .write.mode("append").partitionBy("slot_range")
             .parquet(archive))
        before = spark.read.parquet(archive)
        n_rows = before.count()
        n_files_before = len(glob.glob(
            os.path.join(archive, "slot_range=*", "*.parquet")))

        compact_archive(spark, archive)

        after = spark.read.parquet(archive)
        assert after.count() == n_rows  # lossless
        buckets = glob.glob(os.path.join(archive, "slot_range=*"))
        n_files_after = len(glob.glob(
            os.path.join(archive, "slot_range=*", "*.parquet")))
        assert n_files_after == len(buckets)  # one file per bucket
        assert n_files_after < n_files_before
