"""Streaming metrics (SURVEY §2.8 A1-A6) on Structured Streaming
primitives: `observe()` named metrics + a StreamingQueryListener, instead
of the reference's atomic-counter singletons (common/metrics.rs).

- A1 per-kind counters      -> observe(count per event_type/protocol)
- A2 windowed counts        -> windowed_event_counts (event-time tumbling
                               window + watermark vs the reference's
                               processing-time 5 s window)
- A3 processing stats       -> QueryProgressEvent.durationMs via listener
- A4 dropped counter        -> source lag from progress (numInputRows vs
                               endOffset)
- A5 high-latency detector  -> high_latency_events filter (1000 ms warn
                               threshold + 500 ms block-time calibration,
                               common/constants.rs:15-18)
- A6 slow-processing        -> listener flags batches over budget
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# common/constants.rs:10-18
METRICS_WINDOW_SECS = 5
LATENCY_WARN_MS = 1000
BLOCK_TIME_CALIBRATION_MS = 500
SLOW_BATCH_BUDGET_MS = 3.0  # 3000 us per-event parse budget


def observed(events: DataFrame, name: str = "event_metrics") -> DataFrame:
    """Attach A1-style named metrics; read them from QueryProgress
    .observedMetrics[name] per micro-batch.

    Spark forbids DISTINCT aggregates in observed metrics
    (INVALID_OBSERVED_METRICS), so the per-batch transaction count is
    an HLL estimate (`transactions_approx`). For an exact counter use
    QueryProgress.numInputRows (recorded by the listener below): at the
    source one row is one transaction — the reference's per-message A1
    increment. numInputRows counts rows PER SOURCE SCAN of the physical
    plan; the event DAG is single-scan since the combined outer+inner
    explode (plans/pipeline.py), so the multiplier is currently 1.
    """
    return events.observe(
        name,
        F.count(F.lit(1)).alias("events_processed"),
        F.approx_count_distinct(F.col("signature"))
        .alias("transactions_approx"),
        F.max("slot").alias("max_slot"),
    )


def windowed_event_counts(events: DataFrame,
                          window: str = f"{METRICS_WINDOW_SECS} seconds",
                          watermark: str = "10 seconds") -> DataFrame:
    """A2: event-time tumbling window counts (needs non-null block_time)."""
    return (events
            .withWatermark("block_time", watermark)
            .groupBy(F.window("block_time", window).alias("w"),
                     "protocol", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "protocol",
                    "event_type", "n_events"))


def high_latency_events(events: DataFrame,
                        warn_ms: int = LATENCY_WARN_MS) -> DataFrame:
    """A5: recv_ms - (block_time_ms + 500 ms calibration) > warn_ms
    (common/metrics.rs:372-389). Rows with block_time 0 (shred path) are
    excluded, as the reference's check divides by nonzero block time."""
    recv_ms = (F.col("recv_us") / 1000).cast("long")
    lag = recv_ms - (F.col("block_time_ms") + BLOCK_TIME_CALIBRATION_MS)
    return (events.filter(F.col("block_time_ms") > 0)
            .withColumn("latency_lag_ms", lag)
            .filter(F.col("latency_lag_ms") > warn_ms))


def latency_summary(progress: list[dict],
                    warn_ms: int = LATENCY_WARN_MS,
                    skip_cold: int = 1) -> dict:
    """BASELINE bench plan (b): trigger-to-sink latency percentiles from
    listener progress rows (PipelineMetricsListener.progress).

    `triggerExecution` is Structured Streaming's wall time for one full
    micro-batch — offset resolution through sink commit — i.e. exactly
    the reference's receive-to-callback latency analog that its
    LATENCY_WARN_MS=1000 threshold guards
    (/root/reference/src/streaming/common/constants.rs:18). The first
    `skip_cold` batches are excluded (JVM/codegen warmup has no analog
    in the long-running reference process).
    """
    def _pct(xs: list[float], q: float) -> float:
        if not xs:
            return float("nan")
        xs = sorted(xs)
        idx = min(len(xs) - 1, max(0, round(q * (len(xs) - 1))))
        return float(xs[idx])

    rows = [p for p in progress if p.get("num_input_rows")]
    # unconditional: a run with <= skip_cold data batches reports
    # n_batches=0 / NaN percentiles rather than silently presenting the
    # warmup batch as steady-state latency
    warm = rows[skip_cold:]
    trig = [p["duration_ms"].get("triggerExecution", 0) for p in warm]
    add = [p["duration_ms"].get("addBatch", 0) for p in warm]
    return {
        "n_batches": len(warm),
        "rows_per_batch": (sum(p["num_input_rows"] for p in warm)
                           / max(1, len(warm))),
        "trigger_p50_ms": _pct(trig, 0.50),
        "trigger_p95_ms": _pct(trig, 0.95),
        "trigger_max_ms": max(trig) if trig else float("nan"),
        "add_batch_p50_ms": _pct(add, 0.50),
        "add_batch_p95_ms": _pct(add, 0.95),
        "warn_threshold_ms": warn_ms,
        "batches_over_warn": sum(1 for t in trig if t > warn_ms),
    }


class PipelineMetricsListener:
    """A3/A4/A6 via StreamingQueryListener events; collected per batch."""

    def __init__(self):
        self.progress: list[dict] = []
        self.slow_batches: list[dict] = []

    def make_listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                row = {
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "duration_ms": dict(p.durationMs or {}),
                    "observed": {k: v.asDict() if hasattr(v, "asDict") else v
                                 for k, v in
                                 (p.observedMetrics or {}).items()},
                    # stateful queries only: per-operator state-store
                    # footprint, the evidence for watermark-bounded state
                    # (latency_probe --state-growth)
                    "state_operators": [
                        {"operator": so.operatorName,
                         "rows_total": so.numRowsTotal,
                         "rows_updated": so.numRowsUpdated,
                         "rows_removed": so.numRowsRemoved,
                         "memory_bytes": so.memoryUsedBytes}
                        for so in (p.stateOperators or [])],
                }
                outer.progress.append(row)
                total = sum((p.durationMs or {}).values())
                if p.numInputRows and total / p.numInputRows \
                        > SLOW_BATCH_BUDGET_MS:
                    outer.slow_batches.append(row)  # A6 analog

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _L()
