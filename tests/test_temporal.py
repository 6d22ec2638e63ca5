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


# ---------------------------------------------------------------------------
# asof_join_skewed differential — the hot-key form must be semantically
# IDENTICAL to the plain per-key form on any corpus, and its window
# fill must actually partition on (key, slice), not just key.
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _random_asof_corpus(spark, seed, n_keys=5, n_left=120, n_right=90,
                        hot_key=None, hot_share=0.0):
    """Seeded corpus spanning ~4 days with microsecond timestamps.

    Deliberately includes every boundary shape the slice carry has to
    get right: rows exactly AT slice starts (ts pinned to whole hours /
    whole days), duplicate right timestamps per key (tiebreaker path),
    rights many empty slices before their left, and keys with rights
    but no lefts / lefts but no rights."""
    import random

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1)
    span_us = 4 * _DAY_US

    def _key(i):
        if hot_key is not None and rng.random() < hot_share:
            return hot_key
        return rng.randrange(n_keys)

    def _ts():
        r = rng.random()
        if r < 0.15:    # exactly at an hour boundary (slice start @1h)
            return t0 + dt.timedelta(hours=rng.randrange(4 * 24))
        if r < 0.25:    # exactly at a day boundary (slice start @1d)
            return t0 + dt.timedelta(days=rng.randrange(4))
        return t0 + dt.timedelta(microseconds=rng.randrange(span_us))

    lefts = [(_key(i), _ts(), float(i)) for i in range(n_left)]
    rights = [(_key(i), _ts(), i, rng.random() * 100) for i in range(n_right)]
    # duplicate-right-ts twins exercising the tiebreaker
    for j in range(8):
        k, ts, eid, v = rights[rng.randrange(len(rights))]
        rights.append((k, ts, n_right + j, v + 1.0))
    # a key whose only right sits days before its lefts (multi-slice carry)
    lefts.append((n_keys + 1, t0 + dt.timedelta(days=3, seconds=5), -1.0))
    rights.append((n_keys + 1, t0 + dt.timedelta(seconds=1),
                   n_right + 100, 777.0))
    # a key with rights only (must not appear in output at all)
    rights.append((n_keys + 2, t0 + dt.timedelta(days=1),
                   n_right + 101, 888.0))
    left = spark.createDataFrame(
        lefts, "user_id long, ts timestamp, amt double")
    right = spark.createDataFrame(
        rights, "user_id long, ts timestamp, event_id long, val double")
    return left, right


def _asof_rows(df):
    return sorted((r.user_id, r.ts, r.amt, r.matched_ts, r.val)
                  for r in df.collect())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("slice_us", [_HOUR_US, _DAY_US])
def test_asof_skewed_differential_random(spark, seed, strict, slice_us):
    """asof_join_skewed(corpus) == asof_join(corpus) row-for-row across
    seeds x strictness x slice widths (including a slice width small
    enough that the 4-day corpus spans ~96 slices, so the boundary
    carry fires constantly)."""
    from solana_event_stream_spark.operators.temporal import asof_join_skewed

    left, right = _random_asof_corpus(spark, seed)
    plain = asof_join(left, right, on=["user_id"], right_cols=("val",),
                      tiebreaker="event_id", strict=strict)
    skewed = asof_join_skewed(left, right, on=["user_id"],
                              right_cols=("val",), tiebreaker="event_id",
                              strict=strict, slice_duration_us=slice_us)
    assert _asof_rows(skewed) == _asof_rows(plain)


def test_asof_skewed_differential_hot_key(spark):
    """The corpus the skewed form exists for: ~80% of both sides on one
    key. Semantics must still match the plain form exactly."""
    from solana_event_stream_spark.operators.temporal import asof_join_skewed

    left, right = _random_asof_corpus(spark, seed=7, hot_key=0,
                                      hot_share=0.8, n_left=300, n_right=200)
    plain = asof_join(left, right, on=["user_id"], right_cols=("val",),
                      tiebreaker="event_id", strict=True)
    skewed = asof_join_skewed(left, right, on=["user_id"],
                              right_cols=("val",), tiebreaker="event_id",
                              strict=True, slice_duration_us=_HOUR_US)
    assert _asof_rows(skewed) == _asof_rows(plain)


def test_asof_skewed_window_partitions_on_slice(spark):
    """The scale claim itself: the skewed form's window fill must
    partition on (key, slice) — if the slice ever falls out of the
    partition spec the operator silently degrades to the plain form's
    one-task-per-hot-key behavior."""
    from solana_event_stream_spark.operators.temporal import asof_join_skewed

    left, right = _random_asof_corpus(spark, seed=3)
    out = asof_join_skewed(left, right, on=["user_id"],
                           right_cols=("val",), tiebreaker="event_id")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = [ln for ln in plan.splitlines()
             if "windowspecdefinition" in ln and "user_id" in ln]
    assert specs, "skewed as-of lost its window operator"
    assert any("_slice" in ln for ln in specs), (
        "window fill no longer partitions on (key, _slice):\n" + plan)
    # and the plain form, by contrast, partitions on the key alone
    plain = asof_join(left, right, on=["user_id"], right_cols=("val",),
                      tiebreaker="event_id")
    pplan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert all("_slice" not in ln for ln in pplan.splitlines()
               if "windowspecdefinition" in ln)


def test_asof_skewed_no_rights_and_empty_left(spark):
    from solana_event_stream_spark.operators.temporal import asof_join_skewed

    left, right = _random_asof_corpus(spark, seed=4)
    no_rights = right.filter(F.lit(False))
    out = asof_join_skewed(left, no_rights, on=["user_id"],
                           right_cols=("val",), tiebreaker="event_id")
    rows = out.collect()
    assert len(rows) == left.count()
    assert all(r.matched_ts is None and r.val is None for r in rows)
    empty_left = asof_join_skewed(left.filter(F.lit(False)), right,
                                  on=["user_id"], right_cols=("val",),
                                  tiebreaker="event_id")
    assert empty_left.count() == 0


# ---------------------------------------------------------------------------
# events_dau_hll_cascade — the documented DAU scale form.
# ---------------------------------------------------------------------------

def test_dau_hll_cascade_identity_and_error(spark, sf_dir):
    """Two properties: (a) the hourly->daily sketch cascade is IDENTICAL
    (not just close) to a direct daily sketch — register-max merge is
    associative/commutative, so unioning hourly sketches reconstructs
    the very registers a daily scan would build; (b) both estimates sit
    within the lg_k=14 sketch's error envelope of the exact DAU."""
    from solana_event_stream_spark.plans.events_analytics import (
        events_dau_hll_cascade,
    )
    from solana_event_stream_spark.tables import load_table

    out = {r.bucket_ts: (r.dau_cascaded, r.dau_direct)
           for r in events_dau_hll_cascade(spark, sf_dir).collect()}
    assert out, "no days in corpus?"
    exact = {r.bucket_ts: r.dau for r in
             load_table(spark, sf_dir, "events")
             .groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_ts"))
             .agg(F.countDistinct("user_id").alias("dau")).collect()}
    assert set(out) == set(exact)
    for day, (casc, direct) in out.items():
        assert casc == direct, f"{day}: cascade {casc} != direct {direct}"
        # lg_k=14 -> relative standard error ~1.04/sqrt(2^14) ~ 0.8%;
        # 5% is > 6 sigma
        assert abs(casc - exact[day]) <= max(0.05 * exact[day], 2.0), (
            day, casc, exact[day])


@pytest.mark.parametrize("tol_hours", [1, 26])
def test_asof_skewed_tolerance_differential(spark, tol_hours):
    """tolerance_us (r11 parity knob) must expire the same matches as
    the plain form — including matches carried across slice boundaries,
    where the lag can exceed any tolerance."""
    from solana_event_stream_spark.operators.temporal import asof_join_skewed

    left, right = _random_asof_corpus(spark, seed=5)
    tol = tol_hours * _HOUR_US
    plain = asof_join(left, right, on=["user_id"], right_cols=("val",),
                      tiebreaker="event_id", strict=True, tolerance_us=tol)
    skewed = asof_join_skewed(left, right, on=["user_id"],
                              right_cols=("val",), tiebreaker="event_id",
                              strict=True, tolerance_us=tol,
                              slice_duration_us=_HOUR_US)
    p, s = _asof_rows(plain), _asof_rows(skewed)
    assert s == p
    # the tolerance actually bit: some matches expired vs the no-tol run
    no_tol = _asof_rows(asof_join(left, right, on=["user_id"],
                                  right_cols=("val",),
                                  tiebreaker="event_id", strict=True))
    assert sum(r[3] is None for r in p) > sum(r[3] is None for r in no_tol)
