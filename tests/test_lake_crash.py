"""Crash-consistency proof for the decoded-event lake (VERDICT r8
item 2): hard-kill the sink's JVM between addBatch's task file writes
and the manifest commit, then assert

1. the orphaned partial files exist on disk but are INVISIBLE to the
   commit-log-aware batch reader (no torn batch);
2. a restart from the same checkpoint re-runs the killed batch and
   converges to the exactly-once archive: no loss, no duplicates,
   row-set parity with the batch pipeline;
3. the same holds with the dedup_redelivery state in the loop (its
   state checkpoint is torn by the same kill).

The kill itself runs in a subprocess (tests/lake_crash_child.py) so
the session-scoped test JVM survives."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

from tests.lake_crash_child import (SLOTS_PER_DIR, _committed_paths,
                                    _data_files, corpus)

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "lake_crash_child.py")


def _run_child(workdir: str, mode: str) -> None:
    for attempt in range(3):
        rc = subprocess.run(
            [sys.executable, CHILD, workdir, mode],
            timeout=600, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode
        if rc == 7:
            return
        assert rc == 3, f"child failed rc={rc}"   # commit won the race
        # wipe and retry with a fresh workdir state
        import shutil
        for sub in ("src", "events", "ckpt"):
            shutil.rmtree(os.path.join(workdir, sub), ignore_errors=True)
    pytest.fail("could not land the kill mid-batch in 3 attempts")


@pytest.mark.parametrize("mode", ["plain", "dedup"])
def test_lake_survives_hard_kill_mid_batch(spark, mode):
    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        load_event_archive, start_event_archive_stream)

    part1, part2 = corpus(spark)
    n_first = build_events_core(part1).count()
    n_total = n_first + build_events_core(part2).count()
    assert 0 < n_first < n_total

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        _run_child(tmp, mode)
        archive = os.path.join(tmp, "events")
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")

        # partiality evidence: orphan task files on disk ...
        orphans = _data_files(archive) - _committed_paths(archive)
        assert len(orphans) >= 2
        # ... hidden by the log-aware reader: exactly batch 0, no torn rows
        assert load_event_archive(spark, archive).count() == n_first

        # restart from the SAME checkpoint; batch 1 re-runs and commits
        q = start_event_archive_stream(
            read_transaction_stream(spark, src, max_files_per_trigger=1),
            archive, ckpt, slots_per_dir=SLOTS_PER_DIR,
            available_now=True,
            dedup_redelivery="10 minutes" if mode == "dedup" else None)
        q.awaitTermination(480)

        final = load_event_archive(spark, archive)
        assert final.count() == n_total                      # no loss
        assert final.select("signature", "event_type", "outer_index",
                            "inner_index").distinct().count() == n_total
        # the orphans are permanently invisible, not cleaned
        assert _data_files(archive) - _committed_paths(archive) >= orphans
        # row-set parity with the batch pipeline on a stable aggregate
        got = (final.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n")).toPandas()
               .sort_values("event_type").reset_index(drop=True))
        exp_df = build_events_core(part1).select("event_type").unionAll(
            build_events_core(part2).select("event_type")) \
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")) \
            .toPandas().sort_values("event_type").reset_index(drop=True)
        assert got.equals(exp_df)
