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


def _scan_output_rows(df) -> int:
    """Rows the parquet reader actually produced (post row-group skip):
    the numOutputRows metric of the executed scan leaf."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(scan.metrics().apply("numOutputRows").value())


def test_sorted_within_partition_prunes_row_groups(spark):
    """The second pruning level below directories: sort_within=
    ("program_id", "slot") tightens row-group min/max stats so a
    program-filtered slot-window read pushes the predicate to the scan
    (PushedFilters) AND the reader skips row groups — strictly fewer
    rows off disk than the unsorted layout of the same data."""
    from solana_event_stream_spark.sources.replay import (
        read_archive_slot_window, write_slot_range_archive)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    golden = spark.read.parquet(
        os.path.join(fixtures, "events_golden.parquet"))
    # replicate to ~48k rows over ~12 slot-range dirs; small parquet
    # blocks force multiple row groups per file so skipping is visible
    big = (golden.select("slot", "program_id", "event_type", "signature")
           .crossJoin(spark.range(1200).select(
               (F.col("id") * 10).alias("shift")))
           .withColumn("slot", F.col("slot") + F.col("shift") * 10)
           .drop("shift"))
    n_big = big.count()
    prog = golden.groupBy("program_id").count().orderBy("count").first()[0]

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    try:
        _run_prune_case(spark, big, n_big, "program_id", prog,
                        ("program_id", "slot"))
    finally:
        # restore the shared session conf even when an assertion fails
        # (a leaked 1 GiB override would cascade into other tests)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)


def test_account_archive_sorted_layout_prunes(spark):
    """Archive parity for ACCOUNT updates: write_account_archive lays
    out slot-range dirs with rows sorted by (owner, slot), so the
    account pipeline's first predicate — owner-program membership —
    skips row groups exactly like the transaction archive's
    program_id sort does."""
    from solana_event_stream_spark.sources.replay import (
        write_account_archive)
    from solana_event_stream_spark.plans.account_pipeline import (
        load_raw_accounts)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    big = (raw.select("slot", "owner", "pubkey", "signature", "lamports")
           .crossJoin(spark.range(2500).select(
               (F.col("id") * 10).alias("shift")))
           .withColumn("slot", F.col("slot") + F.col("shift") * 10)
           .drop("shift"))
    n_big = big.count()
    owner = raw.groupBy("owner").count().orderBy("count").first()[0]

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    try:
        _run_prune_case(spark, big, n_big, "owner", owner,
                        ("owner", "slot"),
                        sorted_writer=write_account_archive)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)


def _run_prune_case(spark, big, n_big, filter_col, filter_val,
                    sort_within, sorted_writer=None):
    from solana_event_stream_spark.sources.replay import (
        read_archive_slot_window, write_slot_range_archive)

    with tempfile.TemporaryDirectory() as tmp:
        sorted_path = os.path.join(tmp, "sorted")
        unsorted_path = os.path.join(tmp, "unsorted")
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        old_block = hconf.get("parquet.block.size")
        hconf.set("parquet.block.size", str(32 * 1024))
        try:
            if sorted_writer is not None:
                sorted_writer(big, sorted_path, slots_per_bucket=10_000)
            else:
                write_slot_range_archive(big, sorted_path,
                                         slots_per_bucket=10_000,
                                         sort_within=sort_within)
            write_slot_range_archive(big, unsorted_path,
                                     slots_per_bucket=10_000)
        finally:
            if old_block is None:
                hconf.unset("parquet.block.size")
            else:
                hconf.set("parquet.block.size", old_block)

        lo, hi = 1000, 60_000

        def window_scan(path):
            return read_archive_slot_window(
                spark, path, lo, hi, slots_per_bucket=10_000).filter(
                F.col(filter_col) == filter_val)

        # the filter predicate reaches the scan
        plan = _plan(window_scan(sorted_path))
        assert "PushedFilters:" in plan
        assert filter_col in plan.split("PushedFilters:")[1].split(
            "\n")[0]

        n_match = window_scan(sorted_path).count()
        assert n_match == window_scan(unsorted_path).count()  # same data
        rows_sorted = _scan_output_rows(window_scan(sorted_path))
        rows_unsorted = _scan_output_rows(window_scan(unsorted_path))
        # unsorted layout reads (nearly) every row in the slot window;
        # sorted layout skips the row groups that lack the filter value
        assert rows_sorted < rows_unsorted / 2, (
            rows_sorted, rows_unsorted, n_match, n_big)
        assert rows_sorted >= n_match


def test_event_archive_stream_roundtrip_and_pruning(spark):
    """Streamed decoded-event archive (streaming/event_archive.py):
    (a) the streamed archive's content equals the batch decode exactly;
    (b) enrich-at-read over the archive equals the batch build_events
        output (global pools — the documented contract);
    (c) a slot-window read prunes slot_range directories at planning
        time (PartitionFilters);
    (d) compact_archive(sort_within=...) preserves content while
        restoring the single-file-per-partition layout."""
    from solana_event_stream_spark.plans.pipeline import (
        build_events, build_events_core, enrich_events)
    from solana_event_stream_spark.sources.replay import (
        compact_archive, read_transaction_stream,
        write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, read_event_archive_slot_window,
        start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    raw = _make_raw(spark)
    slots = [r.slot for r in raw.select("slot").distinct().collect()]
    expected_core = build_events_core(raw).toPandas()
    expected_full = build_events(raw).toPandas()

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_slot_bucketed_archive(raw, src, n_buckets=3)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=100,
            available_now=True)
        q.awaitTermination(180)

        # (a) content parity with the batch decode
        got_core = load_event_archive(spark, archive) \
            .drop("slot_range").toPandas()
        assert _norm_rows(got_core) == _norm_rows(expected_core)

        # (b) enrich-at-read == batch build_events (via the API wrapper)
        from solana_event_stream_spark.streaming.event_archive import (
            load_enriched_events)
        enriched = load_enriched_events(spark, archive).toPandas()
        exp = expected_full
        if "is_bot" in exp.columns:       # bot wallet not passed here
            enriched = enriched.drop(columns=["is_bot"])
            exp = exp.drop(columns=["is_bot"])
        assert _norm_rows(enriched) == _norm_rows(exp)

        # (c) directory pruning for a slot window
        lo, hi = min(slots), min(slots) + 50
        windowed = read_event_archive_slot_window(
            spark, archive, min_slot=lo, max_slot=hi, slots_per_dir=100)
        plan = _plan(windowed)
        assert "PartitionFilters" in plan
        assert "slot_range" in plan.split("PartitionFilters")[1][:300]

        # (d) compaction with row-group sort preserves content
        compact_archive(spark, archive,
                        sort_within=("program_id", "slot"))
        recompacted = load_event_archive(spark, archive) \
            .drop("slot_range").toPandas()
        assert _norm_rows(recompacted) == _norm_rows(expected_core)
        for d in glob.glob(os.path.join(archive, "slot_range=*")):
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1


def test_event_archive_column_pruning(spark):
    """A narrow projection over the 375-column event archive must reach
    the scan as a narrow ReadSchema (column pruning) — the point of
    materializing the decode as columnar events: a 3-column query reads
    3 columns, not the wide row."""
    from solana_event_stream_spark.plans.pipeline import (
        build_events_core)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive)

    raw = _make_raw(spark)
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        archive = os.path.join(tmp, "events")
        (build_events_core(raw)
         .withColumn("slot_range", (F.col("slot") / 100).cast("long"))
         .write.partitionBy("slot_range").parquet(archive))
        narrow = (load_event_archive(spark, archive)
                  .filter(F.col("event_type").isNotNull())
                  .select("signature", "event_type", "slot"))
        plan = _plan(narrow)
        read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
        # only the projected/filtered columns reach the scan
        for col in ("signature", "event_type", "slot"):
            assert col in read_schema
        for wide in ("accounts_padded", "inner_group", "sol_amount",
                     "transfer_candidates"):
            assert wide not in read_schema
        assert "PushedFilters" in plan


def test_account_archive_stream_matches_batch(spark):
    """Account-side lake sink: streamed decoded account events equal the
    batch account pipeline output."""
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)
    from solana_event_stream_spark.sources.replay import (
        read_account_stream, write_account_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_account_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    expected = build_account_events(raw).toPandas()

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_account_archive(raw, src, slots_per_bucket=100)
        q = start_account_archive_stream(
            read_account_stream(spark, src, max_files_per_trigger=4),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=100,
            available_now=True)
        q.awaitTermination(180)
        got = load_event_archive(spark, archive) \
            .drop("slot_range").toPandas()
        assert _norm_rows(got) == _norm_rows(expected)


def test_event_archive_streaming_readback(spark):
    """The lake is also a STREAM source: a downstream job tailing the
    archive sees every committed event exactly once (file-sink commit
    log honored by the file stream source)."""
    import time as _time

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        read_event_archive_stream, start_event_archive_stream)

    raw = _make_raw(spark)
    expected = build_events_core(raw).count()
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_slot_bucketed_archive(raw, src, n_buckets=2)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt_w"), slots_per_dir=100,
            available_now=True)
        q.awaitTermination(180)

        seen: list = []
        q2 = (read_event_archive_stream(spark, archive)
              .writeStream
              .foreachBatch(lambda df, bid: seen.append(df.count()))
              .option("checkpointLocation", os.path.join(tmp, "ckpt_r"))
              .trigger(availableNow=True).start())
        q2.awaitTermination(120)
        assert sum(seen) == expected


def test_event_archive_max_records_per_file(spark):
    """File-size control on the lake sink: max_records_per_file caps
    rows per written file (the other half of the small-file problem at
    high feed rates)."""
    import pyarrow.parquet as pq

    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_event_archive_stream)

    raw = _make_raw(spark)
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_slot_bucketed_archive(raw, src, n_buckets=1)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=1_000_000,
            available_now=True, max_records_per_file=10)
        q.awaitTermination(180)
        files = glob.glob(os.path.join(
            archive, "slot_range=*", "*.parquet"))
        assert len(files) > 1
        assert all(pq.ParquetFile(f).metadata.num_rows <= 10
                   for f in files)
        assert load_event_archive(spark, archive).count() == \
            sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def test_event_archive_dedup_redelivery(spark):
    """Effectively-once lake: with dedup_redelivery set, a replayed
    corpus file adds ZERO rows to the archive."""
    import time as _time

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_event_archive_stream)

    raw = _make_raw(spark)
    expected = build_events_core(raw).count()
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        raw.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
        raw.coalesce(1).write.mode("append").parquet(src)   # redelivery
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=100,
            available_now=True, dedup_redelivery="10 minutes")
        q.awaitTermination(240)
        assert load_event_archive(spark, archive).count() == expected


def test_lake_is_dropin_for_catalog_query(spark):
    """The catalog's dex_events_by_type aggregation computed over the
    LAKE (enrich-at-read) equals the catalog query's own result — the
    lake is a drop-in substrate for the engine's query surface."""
    import json as _json

    from solana_event_stream_spark.plans.pipeline_queries import (
        dex_events_by_type)
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream, write_slot_bucketed_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        load_enriched_events, start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    with open(os.path.join(fixtures, "meta.json")) as fh:
        bot = _json.load(fh)["bot_wallet"]
    expected = dex_events_by_type(spark, fixtures).toPandas()

    raw = _make_raw(spark)
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_slot_bucketed_archive(raw, src, n_buckets=2)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), available_now=True)
        q.awaitTermination(180)
        got = (load_enriched_events(spark, archive, bot_wallet=bot)
               .groupBy("protocol", "event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.countDistinct("signature").alias("n_txs"))
               ).toPandas()
    assert _norm_rows(got) == _norm_rows(expected)


def test_lake_sink_restart_no_duplicates(spark):
    """S6 for the lake: a sink restarted from the SAME checkpoint
    appends only data that arrived after the first run — the file-sink
    commit log guarantees an exactly-once archive across restarts."""
    import time as _time

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_event_archive_stream)

    raw = _make_raw(spark)
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    cut = slots[len(slots) // 2]
    first, second = raw.filter(raw.slot < cut), raw.filter(raw.slot >= cut)
    n_total = build_events_core(raw).count()
    n_first = build_events_core(first).count()
    assert 0 < n_first < n_total

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        ckpt = os.path.join(tmp, "ckpt")
        first.coalesce(1).write.mode("append").parquet(src)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src), archive, ckpt,
            available_now=True)
        q.awaitTermination(180)
        assert load_event_archive(spark, archive).count() == n_first

        _time.sleep(1.1)
        second.coalesce(1).write.mode("append").parquet(src)
        q = start_event_archive_stream(          # SAME checkpoint
            read_transaction_stream(spark, src), archive, ckpt,
            available_now=True)
        q.awaitTermination(180)
        assert load_event_archive(spark, archive).count() == n_total


def test_account_archive_max_records_per_file(spark):
    """Knob parity (VERDICT r8 item 3): the account-side lake sink has
    the same file-size control as the tx-side sink."""
    import pyarrow.parquet as pq

    from solana_event_stream_spark.plans.account_pipeline import (
        load_raw_accounts)
    from solana_event_stream_spark.sources.replay import (
        read_account_stream, write_account_archive)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_account_archive_stream)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        write_account_archive(raw, src, slots_per_bucket=1_000_000)
        q = start_account_archive_stream(
            read_account_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=1_000_000,
            available_now=True, max_records_per_file=5,
            writer_options={"compression": "zstd"})
        q.awaitTermination(180)
        files = glob.glob(os.path.join(
            archive, "slot_range=*", "*.parquet"))
        assert len(files) > 1
        assert all(pq.ParquetFile(f).metadata.num_rows <= 5
                   for f in files)
        # writer_options reached the parquet writer
        assert all(".zstd." in os.path.basename(f) or
                   pq.ParquetFile(f).metadata.row_group(0).column(0)
                   .compression.lower() == "zstd" for f in files)


def test_account_archive_dedup_redelivery(spark):
    """Knob parity: a replayed account corpus adds ZERO rows when
    dedup_redelivery is set (keyed on ACCOUNT_IDENTITY)."""
    import time as _time

    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)
    from solana_event_stream_spark.sources.replay import (
        read_account_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_account_archive_stream)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    raw = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    expected = build_account_events(raw).count()
    assert expected > 0
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        raw.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
        raw.coalesce(1).write.mode("append").parquet(src)   # redelivery
        q = start_account_archive_stream(
            read_account_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=100,
            available_now=True, dedup_redelivery="10 minutes")
        q.awaitTermination(240)
        assert load_event_archive(spark, archive).count() == expected


def test_lake_snapshot_compaction_while_streaming(spark):
    """Live compaction (VERDICT r8 item 5): snapshot-compact the lake
    TWICE while the sink stream keeps running, with row parity at every
    step, an atomic manifest swap, small-file absorption, and the live
    tail staying visible through the union view."""
    import time as _time

    import pyarrow.parquet as pq

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        compact_event_archive_snapshot, load_event_lake,
        prune_event_archive_generations, start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    raw = _make_raw(spark)
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    parts = [raw.filter((F.col("slot") >= lo) & (F.col("slot") < hi))
             for lo, hi in ((0, slots[15]), (slots[15], slots[30]),
                            (slots[30], 10**9))]
    counts = [build_events_core(p).count() for p in parts]
    assert all(c > 0 for c in counts)

    def _expect(k):
        df = parts[0]
        for p in parts[1:k]:
            df = df.unionByName(p)
        return _norm_rows(build_events_core(df).toPandas())

    def _got(archive, compacted):
        return _norm_rows(load_event_lake(spark, archive, compacted)
                          .drop("slot_range").toPandas())

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        compacted = os.path.join(tmp, "compacted")
        os.makedirs(compacted)

        def _feed_and_wait(part, want_rows):
            part.coalesce(1).write.mode("append").parquet(src)
            deadline = _time.time() + 120
            while _time.time() < deadline:
                if q.exception():
                    raise q.exception()
                try:
                    if (load_event_lake(spark, archive, compacted)
                            .count() >= want_rows):
                        return
                except Exception:
                    pass
                _time.sleep(0.5)
            raise AssertionError("sink did not commit in time")

        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, os.path.join(tmp, "ckpt"), slots_per_dir=10,
            processing_time="1 seconds", max_records_per_file=3)
        try:
            _feed_and_wait(parts[0], counts[0])

            # --- compaction #1, stream RUNNING -------------------------
            n_small = len(glob.glob(os.path.join(
                archive, "slot_range=*", "*.parquet")))
            stats = compact_event_archive_snapshot(
                spark, archive, compacted, sort_within=("program_id",
                                                        "slot"))
            assert stats["gen"] == 1 and stats["absorbed_new"] > 0
            assert q.isActive
            assert _got(archive, compacted) == _expect(1)
            gen1_files = glob.glob(os.path.join(
                compacted, "gen=1", "slot_range=*", "*.parquet"))
            assert 0 < len(gen1_files) < n_small      # absorbed small files
            # one sorted file per partition dir
            per_dir: dict = {}
            for f in gen1_files:
                per_dir.setdefault(os.path.dirname(f), []).append(f)
            assert all(len(v) == 1 for v in per_dir.values())

            # --- live tail stays visible through the union view --------
            _feed_and_wait(parts[1], counts[0] + counts[1])
            assert _got(archive, compacted) == _expect(2)

            # --- compaction #2 absorbs the tail, PARTITION-SCOPED ------
            # (VERDICT r9 item 2): untouched gen=1 partitions must carry
            # forward byte-identical — zero data copied for them.
            gen1_bytes = {
                f: open(f, "rb").read() for f in glob.glob(os.path.join(
                    compacted, "gen=1", "slot_range=*", "*.parquet"))}
            stats2 = compact_event_archive_snapshot(
                spark, archive, compacted)
            assert stats2["gen"] == 2 and stats2["absorbed_new"] > 0
            # the tail only touched parts[1] slot ranges; everything
            # else is manifest indirection, not a rewrite
            assert stats2["carried_partitions"] > 0
            from solana_event_stream_spark.streaming.event_archive import (
                _read_lake_manifest)
            man2 = _read_lake_manifest(compacted)
            untouched = [f for f in gen1_bytes if "/slot_range=" in f and
                         man2["partitions"].get(
                             f.split("slot_range=")[1].split("/")[0]) == 1]
            assert untouched, "every gen=1 partition rewritten?"
            for f in untouched:
                assert open(f, "rb").read() == gen1_bytes[f], f
            assert _got(archive, compacted) == _expect(2)

            # --- prune honors the reader grace TTL ---------------------
            # a reader planned against the pre-prune manifest:
            reader_df = load_event_lake(spark, archive, compacted)
            assert prune_event_archive_generations(compacted) == []
            # default grace: superseded copies survive; both the old
            # reader and a fresh one still see exact rows
            assert _norm_rows(reader_df.drop("slot_range").toPandas()) \
                == _expect(2)
            # grace elapsed (0 = reap immediately): only partitions the
            # tail superseded go; parity must hold after the reap
            removed = prune_event_archive_generations(
                compacted, grace_seconds=0)
            assert all(r.startswith("gen=1") for r in removed)
            assert set(untouched) == set(
                f for f in gen1_bytes if os.path.exists(f))
            assert _got(archive, compacted) == _expect(2)

            # --- stream still healthy: a third part flows through ------
            _feed_and_wait(parts[2], sum(counts))
            assert _got(archive, compacted) == _expect(3)
            assert q.isActive and q.exception() is None

            # --- minor #3 then MAJOR compaction collapse ----------------
            stats3 = compact_event_archive_snapshot(
                spark, archive, compacted)
            assert stats3["gen"] == 3 and stats3["absorbed_new"] > 0
            stats4 = compact_event_archive_snapshot(
                spark, archive, compacted, full_rewrite=True)
            assert stats4["gen"] == 4
            assert stats4["carried_partitions"] == 0   # all rewritten
            from solana_event_stream_spark.streaming.event_archive import (
                _read_lake_manifest)
            man = _read_lake_manifest(compacted)
            assert set(man["partitions"].values()) == {4}
            removed = prune_event_archive_generations(
                compacted, grace_seconds=0)
            assert removed
            left = {os.path.basename(d) for d in glob.glob(
                os.path.join(compacted, "gen=*"))}
            assert left == {"gen=4"}
            assert _got(archive, compacted) == _expect(3)
        finally:
            from tests.conftest import stop_streaming_query
            stop_streaming_query(q, spark)

        # no duplicates anywhere in the final view
        final = load_event_lake(spark, archive, compacted)
        assert final.count() == sum(counts)
        assert final.select("signature", "event_type", "outer_index",
                            "inner_index").distinct().count() == \
            sum(counts)


def test_lake_dedup_state_width_default(spark):
    """VERDICT r8 item 6: stateful lake sinks pin the measured
    low-latency state width (8) into a NEW checkpoint by default,
    restore the session conf immediately, honor an explicit width, and
    0 opts out entirely."""
    import json as _json

    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        start_event_archive_stream)

    raw = _make_raw(spark)

    def _ckpt_width(ckpt):
        with open(os.path.join(ckpt, "offsets", "0")) as fh:
            for line in fh.read().splitlines():
                if line.startswith("{") and "shuffle.partitions" in line:
                    return _json.loads(line)["conf"][
                        "spark.sql.shuffle.partitions"]
        raise AssertionError("no conf line in offsets/0")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    cases = {None: "8", 4: "4", 0: prev}
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        raw.coalesce(1).write.mode("append").parquet(src)
        for i, (width, want) in enumerate(cases.items()):
            q = start_event_archive_stream(
                read_transaction_stream(spark, src),
                os.path.join(tmp, f"events{i}"),
                os.path.join(tmp, f"ckpt{i}"),
                available_now=True, dedup_redelivery="10 minutes",
                state_partitions=width)
            # the pin is bracketed around .start(): session conf restored
            assert spark.conf.get("spark.sql.shuffle.partitions") == prev
            q.awaitTermination(180)
            assert _ckpt_width(os.path.join(tmp, f"ckpt{i}")) == want, \
                (width, want)

        # non-stateful sink: session width untouched in the checkpoint
        q = start_event_archive_stream(
            read_transaction_stream(spark, src),
            os.path.join(tmp, "events_ns"), os.path.join(tmp, "ckpt_ns"),
            available_now=True)
        q.awaitTermination(180)
        assert _ckpt_width(os.path.join(tmp, "ckpt_ns")) == prev


def test_lake_manifest_v1_upgrade(spark):
    """A pre-r10 (v1) manifest — full-generation layout + explicit
    absorbed-file list — upgrades in place on the next compaction: the
    tail is computed from the legacy list one last time, and the new
    manifest carries the O(1) high-water mark + partition map."""
    import json as _json
    import time as _time

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        _read_lake_manifest, compact_event_archive_snapshot,
        load_event_lake, start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    raw = _make_raw(spark)
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    first = raw.filter(F.col("slot") < slots[20])
    second = raw.filter(F.col("slot") >= slots[20])
    expect_all = _norm_rows(build_events_core(raw).toPandas())

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        compacted = os.path.join(tmp, "compacted")
        os.makedirs(compacted)

        def _feed(part):
            part.coalesce(1).write.mode("append").parquet(src)
            q = start_event_archive_stream(
                read_transaction_stream(spark, src), archive,
                os.path.join(tmp, "ckpt"), slots_per_dir=10,
                available_now=True)
            q.awaitTermination(180)

        _feed(first)
        stats = compact_event_archive_snapshot(spark, archive, compacted)
        assert stats["gen"] == 1

        # rewrite the manifest in the LEGACY v1 shape
        man = _read_lake_manifest(compacted)
        from solana_event_stream_spark.streaming.event_archive import (
            _sink_log_entries)
        entries, _ = _sink_log_entries(archive)
        assert man["absorbed_count"] == len(entries)
        v1 = {"gen": man["gen"], "absorbed": entries}
        with open(os.path.join(compacted, "_LAKE_MANIFEST.json"),
                  "w") as fh:
            _json.dump(v1, fh)

        # v1 manifest still reads exactly
        got1 = _norm_rows(load_event_lake(spark, archive, compacted)
                          .drop("slot_range").toPandas())
        assert got1 == _norm_rows(build_events_core(first).toPandas())

        # next compaction upgrades v1 -> v2 and absorbs the new tail
        _feed(second)
        stats2 = compact_event_archive_snapshot(spark, archive, compacted)
        assert stats2["gen"] == 2 and stats2["absorbed_new"] > 0
        man2 = _read_lake_manifest(compacted)
        assert man2["version"] == 2 and "absorbed" not in man2
        assert man2["absorbed_count"] > 0 and man2["absorbed_last"]
        assert man2["partitions"]
        got2 = _norm_rows(load_event_lake(spark, archive, compacted)
                          .drop("slot_range").toPandas())
        assert got2 == expect_all


def test_lake_compaction_over_hadoop_fs(spark):
    """ADVICE r9: the compactor's manifest/log bookkeeping must work on
    non-local filesystems. Driving the whole cycle through file:// URIs
    exercises the Hadoop FileSystem branch of every IO helper (listStatus,
    open/IOUtils, create + FileContext atomic rename, recursive delete)
    with local backing."""
    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        _read_lake_manifest, compact_event_archive_snapshot,
        load_event_lake, prune_event_archive_generations,
        start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    raw = _make_raw(spark)
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    first = raw.filter(F.col("slot") < slots[20])
    second = raw.filter(F.col("slot") >= slots[20])

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = "file://" + os.path.join(tmp, "events")
        compacted = "file://" + os.path.join(tmp, "compacted")
        os.makedirs(os.path.join(tmp, "compacted"))

        def _feed(part):
            part.coalesce(1).write.mode("append").parquet(src)
            q = start_event_archive_stream(
                read_transaction_stream(spark, src), archive,
                os.path.join(tmp, "ckpt"), slots_per_dir=10,
                available_now=True)
            q.awaitTermination(180)

        _feed(first)
        stats = compact_event_archive_snapshot(spark, archive, compacted)
        assert stats["gen"] == 1 and stats["absorbed_new"] > 0
        # manifest written through FileContext rename, readable back
        man = _read_lake_manifest(compacted)
        assert man["version"] == 2 and man["absorbed_count"] > 0

        _feed(second)
        stats2 = compact_event_archive_snapshot(spark, archive, compacted)
        assert stats2["gen"] == 2 and stats2["absorbed_new"] > 0

        got = _norm_rows(load_event_lake(spark, archive, compacted)
                         .drop("slot_range").toPandas())
        assert got == _norm_rows(build_events_core(raw).toPandas())

        removed = prune_event_archive_generations(compacted,
                                                  grace_seconds=0)
        assert all(r.startswith("gen=1") for r in removed)
        got2 = _norm_rows(load_event_lake(spark, archive, compacted)
                          .drop("slot_range").toPandas())
        assert got2 == got


def test_lake_slot_window_prunes_through_manifest(spark):
    """read_event_lake_slot_window must (a) equal the full lake read
    filtered by slot, and (b) actually prune: out-of-window partition
    dirs never enter the plan's file list — through BOTH the compacted
    generations and the live tail."""
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        compact_event_archive_snapshot, load_event_lake,
        read_event_lake_slot_window, start_event_archive_stream)
    from solana_event_stream_spark.testing import _norm_rows

    raw = _make_raw(spark)
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    first = raw.filter(F.col("slot") < slots[20])
    second = raw.filter(F.col("slot") >= slots[20])
    mid = slots[len(slots) // 2]

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        compacted = os.path.join(tmp, "compacted")
        os.makedirs(compacted)

        def _feed(part):
            part.coalesce(1).write.mode("append").parquet(src)
            q = start_event_archive_stream(
                read_transaction_stream(spark, src), archive,
                os.path.join(tmp, "ckpt"), slots_per_dir=10,
                available_now=True)
            q.awaitTermination(180)

        _feed(first)
        compact_event_archive_snapshot(spark, archive, compacted)
        _feed(second)          # second batch = live tail, not compacted

        full = load_event_lake(spark, archive, compacted)
        win = read_event_lake_slot_window(
            spark, archive, compacted, min_slot=mid, slots_per_dir=10)
        want = _norm_rows(full.filter(F.col("slot") >= mid)
                          .drop("slot_range").toPandas())
        got = _norm_rows(win.drop("slot_range").toPandas())
        assert got == want and len(got) > 0

        # pruning proof: the windowed plan reads strictly fewer files
        n_all = (full.select(F.input_file_name()).distinct().count())
        n_win = (win.select(F.input_file_name()).distinct().count())
        assert 0 < n_win < n_all

        # a window covering nothing returns an empty, schema-correct frame
        empty = read_event_lake_slot_window(
            spark, archive, compacted, min_slot=10**12, slots_per_dir=10)
        assert empty.count() == 0
        assert set(empty.columns) == set(full.columns)


# ---------------------------------------------------------------------------
# r11 (ADVICE medium): an unreadable sink-log file must never be
# silently skipped where the ordered absorption prefix matters.
# ---------------------------------------------------------------------------

def _fake_sink_log(tmp, n_batches=3, files_per_batch=2):
    """Fabricate a minimal file-sink commit log + matching layout."""
    import json as _json

    log_dir = os.path.join(tmp, "_spark_metadata")
    os.makedirs(log_dir)
    rel_paths = []
    for b in range(n_batches):
        lines = ["v1"]
        for f in range(files_per_batch):
            rel = f"slot_range=0/b{b}_f{f}.parquet"
            rel_paths.append(rel)
            lines.append(_json.dumps(
                {"path": os.path.join(tmp, rel), "action": "add"}))
        with open(os.path.join(log_dir, str(b)), "w") as fh:
            fh.write("\n".join(lines))
    return rel_paths


def test_sink_log_strict_raises_on_unreadable_batch(monkeypatch):
    """A permanently unreadable log file in the ordered range raises
    LakeLogIntegrityError instead of shifting later batches into the
    absorbed prefix (the pre-r11 'except OSError: continue' bug)."""
    import pytest as _pytest

    from solana_event_stream_spark.streaming import event_archive as ea

    with tempfile.TemporaryDirectory() as tmp:
        expect = _fake_sink_log(tmp)
        real = ea._fs_read_text

        def flaky(path):
            if path.endswith(os.path.join("_spark_metadata", "1")):
                raise OSError("transient unreadable")
            return real(path)

        monkeypatch.setattr(ea, "_fs_read_text", flaky)
        with _pytest.raises(ea.LakeLogIntegrityError, match="refusing"):
            ea._sink_log_entries(tmp)
        # legacy v1 set form tolerates the skip: other batches only
        got = ea._sink_committed_files(tmp)
        assert got == {p for p in expect if "/b1_" not in p.replace(
            os.sep, "/")}


def test_sink_log_retries_transient_read_failure(monkeypatch):
    from solana_event_stream_spark.streaming import event_archive as ea

    with tempfile.TemporaryDirectory() as tmp:
        expect = _fake_sink_log(tmp)
        real = ea._fs_read_text
        fails = {"n": 0}

        def once_flaky(path):
            if path.endswith(os.path.join("_spark_metadata", "1")) \
                    and fails["n"] == 0:
                fails["n"] += 1
                raise OSError("one-shot hiccup")
            return real(path)

        monkeypatch.setattr(ea, "_fs_read_text", once_flaky)
        entries, max_id = ea._sink_log_entries(tmp)
        assert entries == expect and max_id == 2 and fails["n"] == 1


def test_java_io_context_translates_to_oserror():
    import pytest as _pytest

    from solana_event_stream_spark.streaming.event_archive import (
        _java_io_as_oserror)

    class FakePy4JError(Exception):
        pass

    with _pytest.raises(OSError):
        with _java_io_as_oserror():
            raise FakePy4JError("java.io.FileNotFoundException: gone")
    # RuntimeError (no active session) passes through untranslated
    with _pytest.raises(RuntimeError):
        with _java_io_as_oserror():
            raise RuntimeError("no active SparkSession")
    # OSError stays OSError
    with _pytest.raises(OSError, match="keep"):
        with _java_io_as_oserror():
            raise OSError("keep me")


def test_java_io_translation_is_narrow():
    """ADVICE r11: only Py4J-surfaced / java.*-named failures become
    OSError; a Python-side bug propagates as itself (non-strict lake
    readers skip OSError as 'unreadable batch' — swallowing a real
    TypeError there would mask it)."""
    import pytest
    from py4j.protocol import Py4JError

    from solana_event_stream_spark.streaming.event_archive import (
        _java_io_as_oserror)

    with pytest.raises(OSError):
        with _java_io_as_oserror():
            raise Exception("java.io.FileNotFoundException: gone")
    with pytest.raises(OSError):
        with _java_io_as_oserror():
            raise Py4JError("gateway dropped")
    with pytest.raises(TypeError):
        with _java_io_as_oserror():
            raise TypeError("a Python bug, not an IO race")
    with pytest.raises(RuntimeError):
        with _java_io_as_oserror():
            raise RuntimeError("no active session")
