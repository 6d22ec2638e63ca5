"""Archive-layout benchmark: directory pruning + compaction payoff.

Builds a slot-range archive from the committed fixture transactions
(replicated with shifted slots to ~368k rows across ~20 slot-range
directories), then measures:

- full-scan wall vs a 10%-slot-window scan (directory pruning), and the
  file counts each touches;
- the same window scan before vs after `compact_archive` on a
  fragmented archive (small-file pressure repair).

Prints ONE JSON line. Not part of the driver's bench.py battery (it
writes temp data); run manually:  python bench_archive.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from solana_event_stream_spark.session import get_spark
from solana_event_stream_spark.sources.replay import (
    compact_archive, read_archive_slot_window, write_slot_range_archive)

N_COPIES = 8000         # fixture is 46 tx over slots 1001..1046
SLOTS_PER_BUCKET = 20000
WINDOW_FRAC = 0.1


def _timed(fn, n: int = 3) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    spark = get_spark("bench-archive")
    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "raw_transactions.parquet")
    from solana_event_stream_spark.plans.pipeline import load_raw_transactions
    raw = load_raw_transactions(spark, fixtures)

    # Replicate with shifted slots: copy i lives at slot + i*50, giving a
    # contiguous ~400k-slot chain -> ~20 slot-range dirs.
    copies = spark.range(N_COPIES).select(
        (F.col("id") * 50).alias("slot_shift"))
    big = (raw.crossJoin(F.broadcast(copies))
           .withColumn("slot", F.col("slot") + F.col("slot_shift"))
           .drop("slot_shift"))

    with tempfile.TemporaryDirectory() as tmp:
        archive = os.path.join(tmp, "archive")
        write_slot_range_archive(big, archive,
                                 slots_per_bucket=SLOTS_PER_BUCKET)
        slot_max = big.agg(F.max("slot")).collect()[0][0]
        win_lo, win_hi = 1000, int(slot_max * WINDOW_FRAC)

        def files(df) -> int:
            return df.select(F.input_file_name()).distinct().count()

        full = spark.read.parquet(archive)
        pruned = read_archive_slot_window(
            spark, archive, win_lo, win_hi,
            slots_per_bucket=SLOTS_PER_BUCKET)
        t_full = _timed(lambda: spark.read.parquet(archive)
                        .agg(F.count(F.lit(1)), F.sum(F.size("instructions")),
                 F.sum(F.size("static_account_keys"))).collect())
        t_pruned = _timed(lambda: read_archive_slot_window(
            spark, archive, win_lo, win_hi,
            slots_per_bucket=SLOTS_PER_BUCKET)
            .agg(F.count(F.lit(1)), F.sum(F.size("instructions")),
                 F.sum(F.size("static_account_keys"))).collect())

        files_full, files_pruned = files(full), files(pruned)
        rows_full, rows_pruned = full.count(), pruned.count()

        # Fragment, then compact: window-scan wall before vs after.
        for _ in range(6):
            (big.sample(0.02, seed=1)
             .withColumn("slot_range",
                         (F.col("slot") / SLOTS_PER_BUCKET).cast("long"))
             .repartition(8)
             .write.mode("append").partitionBy("slot_range")
             .parquet(archive))
        n_files_frag = len(glob.glob(
            os.path.join(archive, "slot_range=*", "*.parquet")))
        t_frag = _timed(lambda: read_archive_slot_window(
            spark, archive, win_lo, win_hi,
            slots_per_bucket=SLOTS_PER_BUCKET)
            .agg(F.count(F.lit(1)), F.sum(F.size("instructions")),
                 F.sum(F.size("static_account_keys"))).collect())
        compact_archive(spark, archive)
        n_files_compact = len(glob.glob(
            os.path.join(archive, "slot_range=*", "*.parquet")))
        t_compacted = _timed(lambda: read_archive_slot_window(
            spark, archive, win_lo, win_hi,
            slots_per_bucket=SLOTS_PER_BUCKET)
            .agg(F.count(F.lit(1)), F.sum(F.size("instructions")),
                 F.sum(F.size("static_account_keys"))).collect())

    # --- decoded-event lake payoff (r8) --------------------------------
    # Same corpus, two ways to answer "events by type + SOL volume":
    # re-run the decode DAG over the raw archive per query, or read the
    # materialized lake's three relevant columns. The ratio is what
    # ingest-once buys every downstream query.
    from solana_event_stream_spark.plans.pipeline import build_events_core
    with tempfile.TemporaryDirectory() as tmp2:
        lake = os.path.join(tmp2, "lake")
        (build_events_core(big)
         .withColumn("slot_range",
                     (F.col("slot") / SLOTS_PER_BUCKET).cast("long"))
         .write.partitionBy("slot_range").parquet(lake))

        def _agg(df):
            return (df.groupBy("event_type")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum("sol_amount").alias("vol")).collect())

        # decode arm runs over the in-memory raw lineage spread across
        # the cores like a real raw-archive scan would be (the bare
        # crossJoin inherits the 46-row fixture's 1-2 splits and would
        # serialize the decode); no raw scan cost is charged —
        # CONSERVATIVE: the lake's real-world edge is larger
        spread = big.repartition(int(spark.conf.get(
            "spark.sql.shuffle.partitions", "32")))
        t_decode_query = _timed(lambda: _agg(build_events_core(spread)))
        t_lake_query = _timed(lambda: _agg(
            spark.read.parquet(lake)
            .select("event_type", "sol_amount")))

    print(json.dumps({
        "metric": "archive_layout",
        "unit": "sec",
        "rows_full": rows_full, "rows_window": rows_pruned,
        "files_full": files_full, "files_window": files_pruned,
        "full_scan_sec": t_full, "window_scan_sec": t_pruned,
        "fragmented_files": n_files_frag,
        "compacted_files": n_files_compact,
        "window_scan_fragmented_sec": t_frag,
        "window_scan_compacted_sec": t_compacted,
        "decode_query_sec": t_decode_query,
        "lake_query_sec": t_lake_query,
        "lake_speedup": round(t_decode_query / t_lake_query, 1)
        if t_lake_query > 0 else -1.0,
    }))


if __name__ == "__main__":
    main()
