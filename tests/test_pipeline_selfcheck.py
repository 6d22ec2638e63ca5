"""The dex_pipeline_throughput row is rows-only for the driver (no
DuckDB oracle for Borsh), so the query carries its own count+checksum
assertion against the golden fixture. These tests pin both directions:
a clean run passes, and a seeded golden drift raises at collect time."""

from __future__ import annotations

import os

import pytest

import solana_event_stream_spark.plans.pipeline_queries as pq

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_selfcheck_passes_clean(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIPE_SCALE", "2")
    rows = pq.dex_pipeline_throughput(spark, FIXTURES).collect()
    assert len(rows) > 0
    assert all(r.self_check for r in rows)


def test_selfcheck_raises_on_decode_count_drift(spark, monkeypatch,
                                                tmp_path):
    """Simulate a decode regression by pointing the golden comparison at
    a tampered copy (one event type's rows duplicated): the query must
    raise at collect, not return quietly."""
    import pyspark.sql.functions as F
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    golden = spark.read.parquet(pq.GOLDEN)
    some_type = golden.select("event_type").first().event_type
    tampered_path = str(tmp_path / "tampered_golden.parquet")
    (golden.unionAll(golden.filter(F.col("event_type") == some_type))
     .write.parquet(tampered_path))

    monkeypatch.setenv("SPARK_GRAFT_PIPE_SCALE", "2")
    monkeypatch.setattr(pq, "GOLDEN", tampered_path)
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="decode drift"):
        pq.dex_pipeline_throughput(spark, FIXTURES).collect()
