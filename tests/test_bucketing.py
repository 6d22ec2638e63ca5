"""Bucketed co-located join: both fact sides pre-bucketed on the join
key => SortMergeJoin with NO Exchange on either side."""

from __future__ import annotations

import io
import os
import tempfile
from contextlib import redirect_stdout

import pytest

from pyspark.sql import functions as F

from solana_event_stream_spark.plans.bucketing import (
    cohosted_join, write_bucketed)
from solana_event_stream_spark.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        try:
            write_bucketed(orders, "orders_b",
                           os.path.join(tmp, "orders"), "o_orderkey")
            write_bucketed(lineitem, "lineitem_b",
                           os.path.join(tmp, "lineitem"), "l_orderkey")
            joined = cohosted_join(spark, "orders_b", "lineitem_b",
                                   "o_orderkey", "l_orderkey")
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle at all
            # correctness: same result as the plain (shuffled) join
            expected = (orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
                .count())
            assert joined.count() == expected
            assert expected > 0

            # and an aggregation keyed on the bucket column reuses the
            # bucketing too: no Exchange before the partial agg's final
            agg = (spark.table("lineitem_b")
                   .groupBy("l_orderkey")
                   .agg(F.sum("l_quantity").alias("q")))
            assert "Exchange" not in _plan(agg)
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS lineitem_b")
