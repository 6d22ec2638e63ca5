"""Event-stream analytics over the driver's `events` table.

Batch analogs of the reference's metrics/aggregation surface
(SURVEY.md §2.8, `/root/reference/src/streaming/common/metrics.rs`):

- A1 per-type counters            -> events_counts_by_type
- A2 tumbling window counts       -> events_tumbling_5min
- A3 processing-time stats        -> events_hourly_stats
- A5 high-latency detector        -> events_high_value_outliers

plus the stateful/windowed patterns the streaming layer reuses
(sessionization ~ J3-style keyed state, running aggregates).

The same DataFrame code runs unchanged on a streaming DataFrame with
``window()`` + watermark (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..catalog import register
from ..tables import load_table
from .analytics import SQL_DAVG, SQL_DSUM, davg, dsum

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min session gap, microseconds


# events_counts_by_type / events_counts_salted register as ONE catalog
# entry (events_counts_battery, defined after the salted form) for the
# driver 50-row-cap reason.

_SQL_EVENTS_COUNTS = """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(ts) AS first_ts, MAX(ts) AS max_ts
    FROM events GROUP BY event_type
"""


def events_counts_by_type(spark, sf_dir: str) -> DataFrame:
    """A1 analog: per-type counters (metrics.rs:36-102)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("max_ts"),
    )


# events_tumbling_5min / events_hourly_stats / events_daily_active_users
# register as ONE catalog entry (events_time_rollup, defined after all
# three) — round 10 freed two slots for the temporal-join operators
# (operators/temporal.py) AND upgraded the union into a hypertable-style
# rollup cascade: the hourly branch re-aggregates the 5-minute PARTIALS
# (exact, because sums ride as DECIMAL(24,6)) instead of rescanning the
# base table — the TimescaleDB continuous-aggregate pattern.

_SQL_EVENTS_5MIN = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_ts,
           event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
"""


def events_tumbling_5min(spark, sf_dir: str) -> DataFrame:
    """A2 analog: tumbling event-time window counts (metrics.rs:270-283;
    5s processing-time window in the reference, event-time here)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events")
    )


_SQL_EVENTS_HOURLY = f"""
    SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value', 'sum_value')},
           {SQL_DAVG('value', 'avg_value')},
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2
"""


def events_hourly_stats(spark, sf_dir: str) -> DataFrame:
    """A3 analog: rolling stats (last/avg processing time -> hourly
    value stats)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                   F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum(F.col("value"), "sum_value"),
             davg(F.col("value"), "avg_value"),
             F.min("value").alias("min_value"),
             F.max("value").alias("max_value"))
    )


_SQL_EVENTS_DAU = """
    SELECT date_trunc('day', ts) AS bucket_ts,
           COUNT(DISTINCT user_id) AS dau,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
"""


def events_daily_active_users(spark, sf_dir: str) -> DataFrame:
    """Daily active users (exact distinct; the 100 TB form swaps in
    approx_count_distinct/HLL partials — distinct is the one aggregate
    that cannot cascade exactly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"),
             F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "events_sessionization",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS new_sess
      FROM lagged),
    sess AS (
      SELECT *, CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           {SQL_DSUM('value', 'sum_value')}
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("events", "window", "stateful"),
    doc="Gap-based sessionization (keyed-state pattern; 30 min gap). "
        "Streaming form: session_window()/applyInPandasWithState.",
)
def events_sessionization(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
               > SESSION_GAP_US),
            F.lit(1)).otherwise(F.lit(0)))
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             dsum(F.col("value"), "sum_value"))
    )


@register(
    "events_user_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(24,6)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum_dec,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS seq
    FROM events
    """,
    tags=("events", "window"),
    doc="Per-user cumulative aggregate (exact decimal accumulation).",
)
def events_user_running_sum(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", "ts",
        F.sum(F.col("value").cast("decimal(24,6)")).over(w)
         .cast("double").alias("run_sum_dec"),
        F.row_number().over(wseq).alias("seq"),
    )


# events_props_json / events_value_percentiles / events_funnel_conversion
# register as ONE catalog entry (events_profile_battery, defined after
# all three) for the driver 50-row-cap reason: round 10 freed two
# catalog slots for the corpus-curation operators (operators/curation.py)
# by consolidating these three thin per-event_type/global aggregates —
# each keeps its full plan; the battery only re-tags the outputs.

_SQL_EVENTS_PROPS = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
"""


def events_props_json(spark, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON prop extraction + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
    )


_SQL_EVENTS_PERCENTILES = """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.9), 6)  AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
"""


def events_value_percentiles(spark, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (A3/A5 threshold
    analysis)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "events_high_value_outliers",
    oracle="""
    WITH thresholds AS (
      SELECT event_type, quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.user_id, e.value, ROUND(t.p99, 6) AS p99
    FROM events e JOIN thresholds t ON e.event_type = t.event_type
    WHERE e.value > t.p99
    """,
    tags=("events", "metrics", "join"),
    doc="A5 analog: high-latency detector as threshold-join filter "
        "(metrics.rs:372-389).",
)
def events_high_value_outliers(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    thresholds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.99)").alias("p99_raw"))
    return (
        ev.join(F.broadcast(thresholds), "event_type")
        .filter(F.col("value") > F.col("p99_raw"))
        .select("event_id", "event_type", "user_id", "value",
                F.round(F.col("p99_raw"), 6).alias("p99"))
    )


@register(
    "events_type_share_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
    tags=("events", "pivot"),
    doc="Pivot-style conditional counts per user (single shuffle).",
)
def events_type_share_pivot(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return ev.groupBy("user_id").agg(*aggs)


_SQL_EVENTS_FUNNEL = """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(first_view) AS n_viewers,
           COUNT(CASE WHEN first_purchase > first_view
                 THEN 1 END) AS n_converted
    FROM firsts
"""


def events_funnel_conversion(spark, sf_dir: str) -> DataFrame:
    """View->purchase funnel via conditional min timestamps."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
         .alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
         .alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewers"),
        F.count(F.when(F.col("first_purchase") > F.col("first_view"), 1))
         .alias("n_converted"),
    )


_SQL_EVENTS_COUNTS_SALTED = """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_value,
           MIN(ts) AS first_ts, MAX(ts) AS max_ts
    FROM events GROUP BY event_type
"""


def events_counts_salted(spark, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via two-phase salting (operators/skew.py):
    event_type has a handful of values over the whole fact table, so a
    direct groupBy funnels each type through one reducer at scale. The
    salted form aggregates (event_type, salt16) first (map-side
    combined, 16-way parallel per hot key), then merges the
    sub-aggregates. Result is identical to the direct groupBy (the
    oracle IS the direct form)."""
    from ..operators.skew import salted_aggregate
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev, ["event_type"], "user_id",
        [(F.count(F.lit(1)), F.sum, "n_events"),
         (F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0)),
          F.sum, "n_high_value"),
         (F.min("ts"), F.min, "first_ts"),
         (F.max("ts"), F.max, "max_ts")])


@register(
    "events_counts_battery",
    oracle=f"""
    SELECT 'direct' AS part, event_type, n_events, n_users,
           CAST(NULL AS BIGINT) AS n_high_value, first_ts, max_ts
    FROM ({_SQL_EVENTS_COUNTS}) direct
    UNION ALL
    SELECT 'salted' AS part, event_type, n_events,
           CAST(NULL AS BIGINT) AS n_users, n_high_value,
           first_ts, max_ts
    FROM ({_SQL_EVENTS_COUNTS_SALTED}) salted
    """,
    tags=("events", "metrics", "agg", "skew"),
    doc="A1 per-type counters, twice (driver 50-row-cap consolidation): "
        "the direct groupBy and the two-phase salted form from "
        "operators/skew.py — the driver row verifies the salted plan "
        "produces bit-identical aggregates to the direct one.",
)
def events_counts_battery(spark, sf_dir: str) -> DataFrame:
    null_l = F.lit(None).cast("long")
    direct = events_counts_by_type(spark, sf_dir).select(
        F.lit("direct").alias("part"), "event_type", "n_events", "n_users",
        null_l.alias("n_high_value"), "first_ts", "max_ts")
    salted = events_counts_salted(spark, sf_dir).select(
        F.lit("salted").alias("part"), "event_type", "n_events",
        null_l.alias("n_users"), "n_high_value", "first_ts", "max_ts")
    return direct.unionByName(salted)


@register(
    "events_profile_battery",
    oracle=f"""
    SELECT 'props' AS part, event_type AS k, n_events AS n1, sum_k AS n2,
           CAST(NULL AS BIGINT) AS n3, CAST(NULL AS DOUBLE) AS v1,
           CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3
    FROM ({_SQL_EVENTS_PROPS}) props
    UNION ALL
    SELECT 'pct' AS part, event_type AS k, CAST(NULL AS BIGINT) AS n1,
           CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
           p50 AS v1, p90 AS v2, p99 AS v3
    FROM ({_SQL_EVENTS_PERCENTILES}) pct
    UNION ALL
    SELECT 'funnel' AS part, 'all' AS k, n_users AS n1, n_viewers AS n2,
           n_converted AS n3, CAST(NULL AS DOUBLE) AS v1,
           CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3
    FROM ({_SQL_EVENTS_FUNNEL}) funnel
    """,
    tags=("events", "json", "percentile", "funnel"),
    doc="JSON-prop aggregation, exact value percentiles, and the "
        "view->purchase funnel as one tagged union (driver 50-row-cap "
        "consolidation, round 10 — freed two slots for the curation "
        "operators). Each branch keeps its original full plan.",
)
def events_profile_battery(spark, sf_dir: str) -> DataFrame:
    """Fused form (r13 scan audit): props and pct group by the SAME
    key (event_type), so they ride ONE scan and ONE groupBy whose
    combined aggregate list covers both parts, melted post-agg through
    one explode of two part structs (~5 aggregated rows). The funnel
    keeps its own pass — its pre-aggregation is user-keyed (distinct
    first-view/first-purchase timestamps), a different shuffle key by
    nature. Corpus scans: 3 -> 2; values bit-identical (same aggregate
    expressions), oracle unchanged."""
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    ev = load_table(spark, sf_dir, "events")
    typed = (ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint"))
        .alias("sum_k"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99")))
    props_pct = (typed.select(F.col("event_type").alias("k"), F.explode(
        F.array(
            F.struct(F.lit("props").alias("part"),
                     F.col("n_events").alias("n1"),
                     F.col("sum_k").alias("n2"), null_l.alias("n3"),
                     null_d.alias("v1"), null_d.alias("v2"),
                     null_d.alias("v3")),
            F.struct(F.lit("pct").alias("part"), null_l.alias("n1"),
                     null_l.alias("n2"), null_l.alias("n3"),
                     F.col("p50").alias("v1"), F.col("p90").alias("v2"),
                     F.col("p99").alias("v3")))).alias("m"))
        .select(F.col("m.part").alias("part"), "k",
                F.col("m.n1").alias("n1"), F.col("m.n2").alias("n2"),
                F.col("m.n3").alias("n3"), F.col("m.v1").alias("v1"),
                F.col("m.v2").alias("v2"), F.col("m.v3").alias("v3")))
    funnel = events_funnel_conversion(spark, sf_dir).select(
        F.lit("funnel").alias("part"), F.lit("all").alias("k"),
        F.col("n_users").alias("n1"), F.col("n_viewers").alias("n2"),
        F.col("n_converted").alias("n3"), null_d.alias("v1"),
        null_d.alias("v2"), null_d.alias("v3"))
    return props_pct.unionByName(funnel)


@register(
    "events_time_rollup",
    oracle=f"""
    SELECT '5min' AS part, bucket_ts, event_type, n_events,
           CAST(NULL AS DOUBLE) AS sum_value,
           CAST(NULL AS DOUBLE) AS avg_value,
           CAST(NULL AS DOUBLE) AS min_value,
           CAST(NULL AS DOUBLE) AS max_value,
           CAST(NULL AS BIGINT) AS dau
    FROM ({_SQL_EVENTS_5MIN}) five
    UNION ALL
    SELECT 'hourly' AS part, bucket_ts, event_type, n_events,
           sum_value, avg_value, min_value, max_value,
           CAST(NULL AS BIGINT) AS dau
    FROM ({_SQL_EVENTS_HOURLY}) hourly
    UNION ALL
    SELECT 'daily' AS part, bucket_ts, CAST(NULL AS VARCHAR) AS event_type,
           n_events, CAST(NULL AS DOUBLE) AS sum_value,
           CAST(NULL AS DOUBLE) AS avg_value,
           CAST(NULL AS DOUBLE) AS min_value,
           CAST(NULL AS DOUBLE) AS max_value, dau
    FROM ({_SQL_EVENTS_DAU}) daily
    """,
    tags=("events", "metrics", "window", "rollup", "hypertable"),
    doc="Hypertable-style time-rollup cascade (A2+A3 analogs + DAU as "
        "one tagged union, round 10 — freed two slots for the temporal "
        "joins): the 5-minute level aggregates the base table ONCE with "
        "decomposable partials (count + DECIMAL(24,6) sum + min/max); "
        "the hourly level re-aggregates those partials — never the base "
        "table — and is bit-identical to a direct hourly scan because "
        "decimal sums are exact and order-independent (the TimescaleDB "
        "continuous-aggregate pattern; at 100 TB each coarser level "
        "reads the finer rollup, ~288x smaller than raw for 5min->day). "
        "The DAU branch stays a direct scan: exact distinct is the one "
        "non-decomposable aggregate (the scale form is HLL partials, "
        "which DO cascade).",
)
def events_time_rollup(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Finest level: one base-table scan, decomposable partials only.
    # The sum rides as decimal (NOT cast to double) so coarser levels
    # re-aggregate exactly.
    fine = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(24,6)")).alias("sum_dec"),
             F.min("value").alias("min_value"),
             F.max("value").alias("max_value"))
        .select(F.col("w.start").alias("bucket_ts"), "event_type",
                "n_events", "sum_dec", "min_value", "max_value"))
    # enrolled for release when the next catalog query starts
    from ..catalog import track_persist
    fine = track_persist(fine)

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    five = fine.select(
        F.lit("5min").alias("part"), "bucket_ts", "event_type", "n_events",
        null_d.alias("sum_value"), null_d.alias("avg_value"),
        null_d.alias("min_value"), null_d.alias("max_value"),
        null_l.alias("dau"))

    hourly = (
        fine.groupBy(F.date_trunc("hour", F.col("bucket_ts"))
                     .alias("bucket_ts"), "event_type")
        .agg(F.sum("n_events").alias("n_events"),
             F.sum("sum_dec").alias("sum_dec"),
             F.min("min_value").alias("min_value"),
             F.max("max_value").alias("max_value"))
        .select(F.lit("hourly").alias("part"), "bucket_ts", "event_type",
                "n_events",
                F.col("sum_dec").cast("double").alias("sum_value"),
                (F.col("sum_dec").cast("double") / F.col("n_events"))
                .alias("avg_value"),
                "min_value", "max_value", null_l.alias("dau")))

    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_ts"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("dau"))
        .select(F.lit("daily").alias("part"), "bucket_ts",
                F.lit(None).cast("string").alias("event_type"), "n_events",
                null_d.alias("sum_value"), null_d.alias("avg_value"),
                null_d.alias("min_value"), null_d.alias("max_value"),
                "dau"))

    return five.unionByName(hourly).unionByName(daily)


def events_dau_hll_cascade(spark, sf_dir: str, lg_k: int = 14) -> DataFrame:
    """The 100 TB form of the rollup's DAU branch: HLL sketches DO
    cascade. Hourly sketches (``hll_sketch_agg``) union up to daily
    (``hll_union_agg``) without rescanning the base table — register-max
    merge is associative, commutative, and order-independent, so the
    cascaded estimate is IDENTICAL (not just close) to a direct daily
    sketch over the raw rows; tests/test_temporal.py
    test_dau_hll_cascade_identity_and_error asserts both that
    identity and <5% error vs exact distinct. Not a catalog entry: DuckDB
    has no register-compatible HLL, so there is no cross-engine oracle —
    the identity property is the correctness check instead.

    Returns (bucket_ts, dau_cascaded, dau_direct) per day.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")))
    cascaded = (hourly.groupBy(F.date_trunc("day", F.col("hour"))
                       .alias("bucket_ts"))
                .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                     .alias("dau_cascaded")))
    direct = (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_ts"))
              .agg(F.hll_sketch_estimate(
                       F.hll_sketch_agg("user_id", F.lit(lg_k)))
                   .alias("dau_direct")))
    return cascaded.join(direct, "bucket_ts")
