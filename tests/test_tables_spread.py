"""Focused test for the r18 load_spread optimization: the file-size
split estimate must reproduce the exact partition count Spark's scan
planning produces (so the spread/no-spread decision — and therefore
the plan shape — is unchanged from the .rdd-probe form)."""

import os

import pytest

from solana_event_stream_spark.tables import (_estimated_scan_partitions,
                                              load_spread, load_table)

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_estimate_matches_rdd_partition_count(spark, sf_dir):
    names = [n for n in ("region", "nation", "customer", "supplier",
                         "part", "orders", "lineitem", "events",
                         "documents", "embeddings")
             if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))]
    assert names, f"no tables under {sf_dir}"
    for name in names:
        df = load_table(spark, sf_dir, name)
        est = _estimated_scan_partitions(
            spark, os.path.join(sf_dir, f"{name}.parquet"))
        actual = df.rdd.getNumPartitions()
        assert est == actual, (name, sf_dir, est, actual)


def test_load_spread_decision_unchanged(spark):
    """The gate itself: below-cores tables spread, at/above-cores do
    not — same decision the .rdd probe made."""
    sf_dir = SF_DIRS[0]
    cores = spark.sparkContext.defaultParallelism
    for name in ("embeddings", "lineitem"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_spread(spark, sf_dir, name)
        n = df.rdd.getNumPartitions()
        est = _estimated_scan_partitions(spark, path)
        if est < cores:
            assert n == cores, (name, n, cores)
        else:
            assert n == est, (name, n, est)
