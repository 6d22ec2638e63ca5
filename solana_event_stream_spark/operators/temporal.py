"""Temporal join operators: distributed as-of join and bucketed range
join.

Beyond-reference operators (no analog in /root/reference) — the two
join shapes Spark lacks natively that an event-stream analytics user
reaches for first: "attach the most recent prior state to each event"
(as-of) and "map a measure onto irregular intervals" (range).

Scale design (100 TB):

- **as-of join** (:func:`asof_join`): the union + keyed window-fill
  form. Both sides shuffle ONCE on the join key; rights and lefts
  interleave in event-time order within each key; ``last(right_col,
  ignorenulls=True)`` over an unbounded-preceding frame carries each
  right row forward onto every later left row. No range explosion, no
  per-row probing, no second shuffle — the cost is exactly one
  sort-within-key, which Spark's window operator spills to disk. The
  one caveat is hot-key skew (a window needs the whole key in one task);
  for skewed keys the per-(key, time-slice) ``applyInPandas`` +
  ``pandas.merge_asof`` variant applies — not needed for uniform keys
  like user ids. Right rows are first reduced to ONE row per (key, ts)
  via ``max(struct(tiebreaker, payload...))`` — a row-consistent,
  deterministic pick (both engines agree), since "which of two
  same-timestamp rights wins" is otherwise engine-dependent.

- **range join** (:func:`band_grid` + a bucket equi-join): joining a
  fact to a literal interval table on ``lo <= x < hi`` naively forces a
  broadcast NESTED-LOOP join (every row probes every interval).
  Decomposing each interval onto a fixed bucket grid — one dim row per
  (covered bucket, interval) — turns it into a broadcast HASH equi-join
  on ``bucket = floor(x / W)`` plus a residual range filter: the
  standard range-join optimization. The fact side stays narrow and
  unshuffled; the exploded dim stays tiny (intervals x covered buckets).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..catalog import register
from ..tables import load_table
from ..plans.analytics import SQL_DSUM, dsum

# --- events_asof_join catalog entry ----------------------------------------

#: strict as-of (right.ts < left.ts): a purchase matches the most recent
#: view strictly before it — same convention as the funnel query.
ASOF_STRICT = True

# --- events_value_band_join catalog entry -----------------------------------

#: irregular value bands (lo inclusive, hi exclusive, name). Irregular on
#: purpose: regular bands would degenerate to a pure equi-join and prove
#: nothing about the range decomposition.
BANDS = [
    (0.0, 1.0, "b0_1"),
    (1.0, 5.0, "b1_5"),
    (5.0, 25.0, "b5_25"),
    (25.0, 100.0, "b25_100"),
    (100.0, 250.0, "b100_250"),
    (250.0, 1000.0, "b250_1000"),
]
BUCKET_W = 25.0  # bucket-grid width for the equi-join decomposition


def _dedupe_right(right: DataFrame, on: list[str], right_ts: str,
                  rc: list[str], tiebreaker: str | None) -> DataFrame:
    """ONE right row per (key, ts), picked deterministically (max
    tiebreaker, payload carried row-consistently via max-of-struct);
    renames the timestamp to ``_r_ts``."""
    if tiebreaker is None:
        return right.select(*on, F.col(right_ts).alias("_r_ts"), *rc)
    packed = right.groupBy(*on, right_ts).agg(
        F.max(F.struct(F.col(tiebreaker).alias("_tb"),
                       *[F.col(c).alias(c) for c in rc])).alias("_r"))
    return packed.select(*on, F.col(right_ts).alias("_r_ts"),
                         *[F.col(f"_r.{c}").alias(c) for c in rc])


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: tuple[str, ...] = (),
              tiebreaker: str | None = None,
              strict: bool = True,
              tolerance_us: int | None = None) -> DataFrame:
    """For each left row, attach the most recent right row per key:
    ``right.ts < left.ts`` when ``strict`` (else ``<=``), optionally
    within ``tolerance_us`` microseconds. Returns all left columns plus
    ``matched_ts`` (the matched right timestamp, NULL when no match)
    and ``right_cols`` (NULL when no match / expired).

    ``right_cols`` must not collide with left column names — rename on
    the right side first. ``tiebreaker`` picks ONE right row per
    (key, right_ts) deterministically (the row with the max tiebreaker,
    payload carried row-consistently via max-of-struct); without it the
    caller must guarantee (key, right_ts) is unique.
    """
    on = list(on)
    rc = list(right_cols)
    bad = set(rc) & set(left.columns)
    if bad:
        raise ValueError(f"right_cols collide with left columns: {bad}")
    right_one = _dedupe_right(right, on, right_ts, rc, tiebreaker)

    # Sort order at equal timestamps decides the boundary semantics:
    # strict  -> left first (a left row never sees a same-ts right)
    # non-strict -> right first (a left row does)
    left_side, right_side = (0, 1) if strict else (1, 0)

    lcols = left.columns
    rtypes = {c: right_one.schema[c].dataType for c in rc}
    u_l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"), F.lit(left_side).alias("_side"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rc])
    u_r = right_one.select(
        *[(F.col(c) if c in on
           else F.lit(None).cast(left.schema[c].dataType).alias(c))
          for c in lcols],
        F.col("_r_ts").alias("_ts"), F.lit(right_side).alias("_side"),
        "_r_ts", *rc)

    w = (Window.partitionBy(*on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u_l.unionByName(u_r).select(
        *lcols, "_ts", "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias("matched_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rc])
    out = filled.filter(F.col("_side") == left_side)

    if tolerance_us is not None:
        expired = (F.unix_micros(F.col("_ts"))
                   - F.unix_micros(F.col("matched_ts"))) > tolerance_us
        out = out.select(
            *lcols,
            F.when(expired, F.lit(None).cast("timestamp"))
             .otherwise(F.col("matched_ts")).alias("matched_ts"),
            *[F.when(expired, F.lit(None).cast(rtypes[c]))
               .otherwise(F.col(c)).alias(c) for c in rc])
    else:
        out = out.select(*lcols, "matched_ts", *rc)
    return out


_SQL_ASOF = f"""
    WITH v1 AS (
      SELECT user_id, ts, value AS view_value
      FROM (SELECT user_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rk
            FROM events WHERE event_type = 'view')
      WHERE rk = 1),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    j AS (SELECT p.user_id, p.ts, v.ts AS matched_ts, v.view_value
          FROM p ASOF LEFT JOIN v1 v
            ON p.user_id = v.user_id AND p.ts > v.ts)
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n_purchases,
           COUNT(matched_ts) AS n_matched,
           CAST(SUM(epoch_us(ts) - epoch_us(matched_ts)) AS BIGINT)
             AS sum_lag_us,
           {SQL_DSUM('view_value', 'sum_view_value')}
    FROM j GROUP BY 1
"""


@register(
    "events_asof_join",
    oracle=_SQL_ASOF,
    tags=("events", "join", "asof", "temporal"),
    doc="Distributed as-of join (union + keyed window fill, ONE shuffle "
        "on the key, no range explosion): each purchase attaches the "
        "most recent strictly-prior view per user, deterministically "
        "tie-broken on duplicate view timestamps; daily rollup of match "
        "rate, exact summed lag, and DECIMAL-exact matched view value. "
        "Oracle is DuckDB's native ASOF JOIN.",
)
def events_asof_join(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id",
        F.col("value").alias("view_value"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts")
    j = asof_join(purchases, views, on=["user_id"],
                  right_cols=("view_value",), tiebreaker="event_id",
                  strict=ASOF_STRICT)
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
    return (j.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.count("matched_ts").alias("n_matched"),
                 F.sum(lag_us).alias("sum_lag_us"),
                 dsum(F.col("view_value"), "sum_view_value")))


def band_grid(spark, bands=None, width: float = BUCKET_W) -> DataFrame:
    """The bucket-grid decomposition of an interval table: one row per
    (covered bucket, interval) so the range join becomes an equi-join on
    ``bucket = floor(x / width)`` + a residual ``lo <= x < hi`` filter.
    Tiny by construction (intervals x covered buckets) — broadcast it."""
    rows = []
    for lo, hi, name in (bands or BANDS):
        first = int(lo // width)
        last = int(math.ceil(hi / width - 1e-12)) - 1
        for b in range(first, last + 1):
            rows.append((b, float(lo), float(hi), name))
    return spark.createDataFrame(
        rows, "bucket int, lo double, hi double, band string")


_SQL_BANDS_VALUES = ", ".join(
    f"({lo!r}, {hi!r}, '{name}')" for lo, hi, name in BANDS)

_SQL_BAND_JOIN = f"""
    WITH bands(lo, hi, band) AS (VALUES {_SQL_BANDS_VALUES})
    SELECT b.band, e.event_type, COUNT(*) AS n_events,
           {SQL_DSUM('e.value', 'sum_value')}
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1, 2
"""


@register(
    "events_value_band_join",
    oracle=_SQL_BAND_JOIN,
    tags=("events", "join", "range", "temporal"),
    doc="Bucketed range join: irregular value intervals decompose onto "
        "a fixed bucket grid so the fact side takes a broadcast HASH "
        "equi-join on floor(value/W) + residual range filter instead of "
        "a broadcast nested-loop probe (the standard range-join "
        "optimization); per-(band, type) counts and DECIMAL-exact sums.",
)
def events_value_band_join(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grid = band_grid(spark)
    facts = ev.select(
        "event_type", "value",
        F.floor(F.col("value") / BUCKET_W).cast("int").alias("bucket"))
    return (facts.join(F.broadcast(grid), "bucket")
            .filter((F.col("value") >= F.col("lo"))
                    & (F.col("value") < F.col("hi")))
            .groupBy("band", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum(F.col("value"), "sum_value")))


def asof_join_skewed(left: DataFrame, right: DataFrame, on: list[str],
                     left_ts: str = "ts", right_ts: str = "ts",
                     right_cols: tuple[str, ...] = (),
                     tiebreaker: str | None = None,
                     strict: bool = True,
                     tolerance_us: int | None = None,
                     slice_duration_us: int = 86_400_000_000) -> DataFrame:
    """Hot-key form of :func:`asof_join` — identical semantics
    (differential-tested: tests/test_temporal.py
    test_asof_skewed_differential_* run seeds x strictness x slice
    widths plus an 80%-one-key corpus against the plain form, and a
    plan gate proves the window fill partitions on (key, slice)),
    different partitioning: the window fill runs
    per (key, time-slice) instead of per key, so one hot key splits
    across ``corpus_span / slice_duration_us`` tasks instead of
    serializing into one.

    The trick is the boundary carry: a left row early in a slice may
    need a right row from an arbitrarily earlier slice. Rights first
    reduce to one row per (key, slice) — a skew-free hash aggregate —
    and that SMALL frame (keys x active slices) goes through the plain
    per-key :func:`asof_join` against the distinct left (key, slice)
    starts to produce each slice's carried-in right row. The carried
    row joins the in-slice union with its true timestamp (< slice
    start, so it sorts first). Per-key state the plain form holds in
    one task is therefore bounded by one slice's rows + 1.
    """
    on = list(on)
    rc = list(right_cols)
    bad = set(rc) & set(left.columns)
    if bad:
        raise ValueError(f"right_cols collide with left columns: {bad}")
    right_one = _dedupe_right(right, on, right_ts, rc, tiebreaker)

    def _slice(ts_col):
        return F.floor(F.unix_micros(ts_col) / slice_duration_us)

    # --- boundary carry: latest right strictly before each slice start.
    # per-(key, slice) last right — skew-free: the groupBy key includes
    # the slice, and hash aggregation combines map-side.
    r_slice_last = (right_one
                    .groupBy(*on, _slice(F.col("_r_ts")).alias("_slice"))
                    .agg(F.max(F.struct(
                        F.col("_r_ts").alias("_r_ts"),
                        *[F.col(c).alias(c) for c in rc])).alias("_r"))
                    .select(*on, F.col("_r._r_ts").alias("_r_ts"),
                            *[F.col(f"_r.{c}").alias(c) for c in rc]))
    l_slices = (left
                .select(*on, _slice(F.col(left_ts)).alias("_slice"))
                .distinct()
                .withColumn(
                    "_slice_start",
                    F.timestamp_micros(
                        (F.col("_slice") * slice_duration_us)
                        .cast("long"))))
    boundary = asof_join(
        l_slices, r_slice_last, on=on,
        left_ts="_slice_start", right_ts="_r_ts",
        right_cols=tuple(rc), strict=True,  # at-start right is in-slice
    ).filter(F.col("matched_ts").isNotNull())

    # --- sliced union + window fill (same fill as asof_join, but the
    # partition key is (key, slice)).
    left_side, right_side = (0, 1) if strict else (1, 0)
    lcols = left.columns
    rtypes = {c: right_one.schema[c].dataType for c in rc}

    def _null_lcols():
        return [F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c not in on else F.col(c) for c in lcols]

    u_l = left.select(
        *lcols, _slice(F.col(left_ts)).alias("_slice"),
        F.col(left_ts).alias("_ts"), F.lit(left_side).alias("_side"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rc])
    u_r = right_one.select(
        *_null_lcols(), _slice(F.col("_r_ts")).alias("_slice"),
        F.col("_r_ts").alias("_ts"), F.lit(right_side).alias("_side"),
        "_r_ts", *rc)
    u_b = boundary.select(
        *_null_lcols(), F.col("_slice"),
        F.col("matched_ts").alias("_ts"), F.lit(right_side).alias("_side"),
        F.col("matched_ts").alias("_r_ts"), *rc)

    w = (Window.partitionBy(*on, "_slice").orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u_l.unionByName(u_r).unionByName(u_b).select(
        *lcols, "_ts", "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias("matched_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rc])
    out = filled.filter(F.col("_side") == left_side)

    if tolerance_us is not None:      # same expiry as the plain form
        expired = (F.unix_micros(F.col("_ts"))
                   - F.unix_micros(F.col("matched_ts"))) > tolerance_us
        return out.select(
            *lcols,
            F.when(expired, F.lit(None).cast("timestamp"))
             .otherwise(F.col("matched_ts")).alias("matched_ts"),
            *[F.when(expired, F.lit(None).cast(rtypes[c]))
               .otherwise(F.col(c)).alias(c) for c in rc])
    return out.select(*lcols, "matched_ts", *rc)
