"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``solana_event_stream_spark.catalog`` — every implemented
operator/query registers there with its Spark implementation and (when
SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solana_event_stream_spark.catalog import load_catalog  # noqa: E402
from solana_event_stream_spark.session import tune  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the Q3-style shipping-priority join (customer ⋈ orders ⋈
    lineitem with broadcast dim, aggregation, deterministic top-k).
    """
    tune(spark)
    catalog = load_catalog()
    return catalog["q3_shipping_priority"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    catalog = load_catalog()

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return catalog[name].spark_fn(spark, sf_dir)
        run.__name__ = name
        return run

    return {name: make(name) for name in sorted(catalog)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    catalog = load_catalog()
    return {name: spec.oracle for name, spec in sorted(catalog.items())
            if spec.oracle is not None}
