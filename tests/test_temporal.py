"""Semantics tests for operators/temporal.py (as-of join, bucketed
range join) and the events_time_rollup cascade — planted-case checks
the oracle-parity gate can't express (it proves Spark == DuckDB; these
prove both compute the RIGHT thing)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solana_event_stream_spark.operators.temporal import (
    BANDS, BUCKET_W, asof_join, band_grid,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _frames(spark):
    views = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0),
         (1, _ts(11), 101, 2.0),
         (1, _ts(11), 102, 2.5),     # same-ts twin: max event_id wins
         (2, _ts(9), 103, 3.0)],
        "user_id long, ts timestamp, event_id long, view_value double")
    purchases = spark.createDataFrame(
        [(1, _ts(11), 10.0),          # strict: sees 10:00, NOT 11:00
         (1, _ts(12), 20.0),          # sees the 11:00 twin (id 102)
         (2, _ts(8), 30.0),           # before any view -> no match
         (3, _ts(8), 40.0)],          # keyless user -> no match
        "user_id long, ts timestamp, amt double")
    return purchases, views


def test_asof_strict_matches_latest_prior_and_tiebreaks(spark):
    purchases, views = _frames(spark)
    out = {(r.user_id, r.ts): (r.matched_ts, r.view_value)
           for r in asof_join(purchases, views, on=["user_id"],
                              right_cols=("view_value",),
                              tiebreaker="event_id",
                              strict=True).collect()}
    assert out[(1, _ts(11))] == (_ts(10), 1.0)      # same-ts view excluded
    assert out[(1, _ts(12))] == (_ts(11), 2.5)      # max-event_id twin
    assert out[(2, _ts(8))] == (None, None)
    assert out[(3, _ts(8))] == (None, None)


def test_asof_non_strict_includes_same_ts(spark):
    purchases, views = _frames(spark)
    out = {(r.user_id, r.ts): r.matched_ts
           for r in asof_join(purchases, views, on=["user_id"],
                              right_cols=("view_value",),
                              tiebreaker="event_id",
                              strict=False).collect()}
    assert out[(1, _ts(11))] == _ts(11)


def test_asof_tolerance_expires_stale_matches(spark):
    purchases, views = _frames(spark)
    out = {(r.user_id, r.ts): (r.matched_ts, r.view_value)
           for r in asof_join(purchases, views, on=["user_id"],
                              right_cols=("view_value",),
                              tiebreaker="event_id", strict=True,
                              tolerance_us=30 * 60 * 1_000_000).collect()}
    # purchase 11:00 <- view 10:00 is 60 min old: expired under 30 min
    assert out[(1, _ts(11))] == (None, None)


def test_asof_rejects_colliding_right_cols(spark):
    purchases, views = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(purchases, views.withColumnRenamed("view_value", "amt"),
                  on=["user_id"], right_cols=("amt",))


def test_band_grid_covers_each_value_exactly_once(spark):
    grid = band_grid(spark).collect()
    # every grid row's interval intersects its bucket
    for r in grid:
        assert r.lo < (r.bucket + 1) * BUCKET_W and r.hi > r.bucket * BUCKET_W
    # boundary probes land in exactly one band via the full join path
    probes = [0.0, 0.99, 1.0, 24.999, 25.0, 99.99, 100.0, 249.9, 250.0,
              999.99]
    facts = spark.createDataFrame(
        [(v, int(v // BUCKET_W)) for v in probes], "value double, bucket int")
    j = (facts.join(F.broadcast(band_grid(spark)), "bucket")
         .filter((F.col("value") >= F.col("lo"))
                 & (F.col("value") < F.col("hi"))))
    rows = j.collect()
    assert len(rows) == len(probes)          # one band each, none dropped
    expect = {0.0: "b0_1", 0.99: "b0_1", 1.0: "b1_5", 24.999: "b5_25",
              25.0: "b25_100", 99.99: "b25_100", 100.0: "b100_250",
              249.9: "b100_250", 250.0: "b250_1000", 999.99: "b250_1000"}
    assert {r.value: r.band for r in rows} == expect
    # out-of-range value joins nothing
    out = spark.createDataFrame([(1000.0, int(1000.0 // BUCKET_W))],
                                "value double, bucket int")
    assert (out.join(F.broadcast(band_grid(spark)), "bucket")
            .filter((F.col("value") >= F.col("lo"))
                    & (F.col("value") < F.col("hi"))).count()) == 0


def test_bands_are_disjoint_and_contiguous():
    for (lo1, hi1, _), (lo2, hi2, _) in zip(BANDS, BANDS[1:]):
        assert hi1 == lo2 and lo1 < hi1 and lo2 < hi2


def test_time_rollup_hourly_equals_direct_scan(spark, sf_dir):
    """The cascaded hourly branch (re-aggregated 5-min partials) must be
    bit-identical to the direct base-table hourly aggregate — the
    property that makes the hypertable cascade FREE."""
    from solana_event_stream_spark.catalog import load_catalog
    from solana_event_stream_spark.plans.events_analytics import (
        events_hourly_stats,
    )
    battery = load_catalog()["events_time_rollup"].spark_fn(spark, sf_dir)
    cascaded = {(r.bucket_ts, r.event_type):
                (r.n_events, r.sum_value, r.avg_value, r.min_value,
                 r.max_value)
                for r in battery.filter("part = 'hourly'").collect()}
    direct = {(r.hour, r.event_type):
              (r.n_events, r.sum_value, r.avg_value, r.min_value,
               r.max_value)
              for r in events_hourly_stats(spark, sf_dir).collect()}
    assert cascaded == direct
