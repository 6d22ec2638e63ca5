"""Subprocess half of the lake crash-consistency proof (VERDICT r8
item 2): start the event-archive sink, let batch 0 commit, feed a
large second batch, and SIGKILL the driver JVM after the sink's tasks
have written parquet files for batch 1 but BEFORE the manifest commit
(_spark_metadata/1). Exits 7 on a successful mid-batch kill, 3 if the
commit won the race (parent retries).

Run: python tests/lake_crash_child.py <workdir> <plain|dedup>
The parent (tests/test_lake_crash.py) then proves the partial files
are invisible to log-aware readers and that a checkpoint restart
converges to the exactly-once archive.
"""

from __future__ import annotations

import glob
import os
import re
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = 300          # batch-1 corpus: 47 tx * 300, slots spread so the
SLOT_STRIDE = 1_000     # dynamic-partition write touches ~150 dirs and
SLOTS_PER_DIR = 2_000   # the task->commit window is seconds wide


def corpus(spark):
    """(part1, part2): first half of the fixture by slot, then the
    replicated remainder — deterministic, importable by the parent."""
    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.pipeline import (
        load_raw_transactions)
    raw = load_raw_transactions(
        spark, os.path.join(REPO, "fixtures", "raw_transactions.parquet"))
    slots = sorted(r.slot for r in raw.select("slot").distinct().collect())
    cut = slots[len(slots) // 2]
    part1 = raw.filter(F.col("slot") < cut)
    part2 = (raw.filter(F.col("slot") >= cut)
             .crossJoin(spark.range(REPLICAS)
                        .select(F.col("id").alias("rep")))
             .withColumn("signature",
                         F.concat_ws("_", "signature", "rep"))
             .withColumn("slot", F.col("slot") + F.col("rep") * SLOT_STRIDE)
             .drop("rep"))
    return part1, part2


def _committed_paths(archive: str) -> set[str]:
    out: set[str] = set()
    for f in glob.glob(os.path.join(archive, "_spark_metadata", "*")):
        if os.path.basename(f).startswith("."):
            continue
        with open(f) as fh:
            out.update(os.path.basename(m)
                       for m in re.findall(r'"path":"([^"]+)"', fh.read()))
    return out


def _data_files(archive: str) -> set[str]:
    return {os.path.basename(f) for f in glob.glob(
        os.path.join(archive, "slot_range=*", "*.parquet"))}


def main() -> int:
    workdir, mode = sys.argv[1], sys.argv[2]
    src = os.path.join(workdir, "src")
    archive = os.path.join(workdir, "events")
    ckpt = os.path.join(workdir, "ckpt")

    from solana_event_stream_spark.session import get_spark
    spark = get_spark("lake-crash-child")
    jvm_pid = spark.sparkContext._gateway.proc.pid

    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        start_event_archive_stream)

    part1, part2 = corpus(spark)
    part1.coalesce(1).write.mode("append").parquet(src)

    q = start_event_archive_stream(
        read_transaction_stream(spark, src, max_files_per_trigger=1),
        archive, ckpt, slots_per_dir=SLOTS_PER_DIR,
        processing_time="1 seconds",
        dedup_redelivery="10 minutes" if mode == "dedup" else None,
        # the dedup arm shuffles onto the state partitions and its sink
        # tasks run in parallel — at 32-wide the files land near-
        # simultaneously and the kill window closes. 2-wide serializes
        # the writes (the width is frozen into the checkpoint, so the
        # parent's restart reuses it automatically).
        state_partitions=2)

    # wait for batch 0's manifest commit
    deadline = time.time() + 180
    while time.time() < deadline:
        if os.path.exists(os.path.join(archive, "_spark_metadata", "0")):
            break
        time.sleep(0.1)
    else:
        return 4

    time.sleep(1.1)                      # distinct mtime for the source
    baseline = _committed_paths(archive)
    part2.coalesce(1).write.mode("append").parquet(src)

    # part2's batch: kill the JVM once >= 2 task-written files exist
    # that the manifest does not list (mid-batch: after addBatch started
    # writing, before the commit). Batch NUMBERS are no signal here —
    # stateful dedup runs no-data batches that commit empty manifest
    # entries — so "commit won the race" is detected by NEW committed
    # data files instead (rc 3, parent retries).
    deadline = time.time() + 300
    while time.time() < deadline:
        committed = _committed_paths(archive)
        if committed - baseline:
            return 3
        uncommitted = _data_files(archive) - committed
        if len(uncommitted) >= 2:
            os.kill(jvm_pid, signal.SIGKILL)
            os._exit(7)
        time.sleep(0.01)
    return 5


if __name__ == "__main__":
    sys.exit(main())
