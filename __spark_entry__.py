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
    """Flagship query; driver checks rows>0 with a stable schema.

    SURVEY §7 Phase-1 flagship: run the full Solana event pipeline
    (explode -> dispatch -> decode -> CPI merge -> enrich) over the
    fixture transaction corpus and aggregate SOL volume / trade counts
    per mint for PumpFun trades.
    """
    tune(spark)
    catalog = load_catalog()
    return catalog["dex_trade_volume_by_mint"].spark_fn(spark, SMOKE_SF_DIR)


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
