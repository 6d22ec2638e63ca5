"""Relational analytics battery over the driver's TPC-H-ish star schema.

These exercise the generic SQL surface the engine inherits from Catalyst
(SURVEY.md §2.8 note): joins (broadcast + shuffle), aggregations, window
ranking, rollup, set ops, semi/anti joins, top-k. Each query has a DuckDB
oracle; the determinism contract is documented in ``catalog.py``.

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst plans it — small dims (region/nation/customer/supplier/part at
TPC-H ratios) broadcast under the 64 MiB threshold; the lineitem-side
aggregations are partial (map-side combine) before the shuffle; AQE
coalesces post-shuffle partitions and splits skewed joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..catalog import register
from ..tables import load_table


def dsum(col: Column, alias: str) -> Column:
    """Exact, order-independent sum of a double expression.

    Casting each per-row double (itself bitwise deterministic) to
    DECIMAL(24,6) makes the aggregation exact integer arithmetic, so the
    result is identical regardless of partitioning/summation order — and
    identical to DuckDB's. Cast back to double for a plain schema.

    Scale 6, not more: the source columns are exact 2-decimal doubles, so
    products of up to three factors have <= 6 true decimal digits, and at
    scale 6 the per-row cast is far inside double's ~15.9 significant
    digits — Spark's shortest-repr-based conversion and DuckDB's
    binary-expansion-based one agree exactly. (At scale 10 with 1e4-sized
    values the 10th decimal is the ~15th significant digit, where the two
    conversion strategies disagree by one ulp-digit — observed as 1e-10
    per-row drift at sf0.01.)
    """
    return F.sum(col.cast("decimal(24,6)")).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Exact-sum-based average (deterministic double)."""
    return (F.sum(col.cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1))).alias(alias)


# SQL-side equivalents of dsum/davg for the DuckDB oracle.
def SQL_DSUM(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(24,6))) AS DOUBLE) AS {alias}"


def SQL_DAVG(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS DECIMAL(24,6))) AS DOUBLE)"
            f" / COUNT(*) AS {alias}")


# ---------------------------------------------------------------------------
# Q1 — pricing summary (pure aggregation; TPC-H Q1 shape)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {SQL_DSUM('l_extendedprice', 'sum_base_price')},
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {SQL_DAVG('l_quantity', 'avg_qty')},
           {SQL_DAVG('l_extendedprice', 'avg_price')},
           {SQL_DAVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
    doc="Aggregate pricing summary with map-side partial aggregation.",
)
def q1_pricing_summary(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (customer ⋈ orders ⋈ lineitem, top-k)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk"),
    doc="3-way join + top-k; customer dim broadcasts.",
)
def q3_shipping_priority(spark, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (semi join / EXISTS)
# ---------------------------------------------------------------------------

# Q4/Q6/Q14 register as ONE catalog entry (q4614_selective_aggregates
# below q14) for the same 50-query driver-cap reason as q578.

_SQL_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
"""


def q4_order_priority(spark, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join with a non-equi residual condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join)
# ---------------------------------------------------------------------------

# Q5/Q7/Q8 register as ONE catalog entry (q578_nation_trade_flows below):
# the driver's CORRECTNESS harness records at most 50 queries, so the
# overlapping multi-join shapes share a tagged-union entry while each
# retains its full join tree and oracle.

_SQL_Q5 = f"""
    SELECT n_name, {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
"""


def q5_local_supplier_volume(spark, sf_dir: str) -> DataFrame:
    """6-way join; all dims broadcast, single shuffle on the fact agg."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — revenue change forecast (filter + scalar agg; pushdown showcase)
# ---------------------------------------------------------------------------

_SQL_Q6 = f"""
    SELECT {SQL_DSUM('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def q6_revenue_delta(spark, sf_dir: str) -> DataFrame:
    """All predicates push to the parquet scan; 2-column ReadSchema."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (conditional aggregation over a join)
# ---------------------------------------------------------------------------

_SQL_Q14 = f"""
    SELECT
      CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END AS DECIMAL(24,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(24,6))) AS DOUBLE) AS promo_share,
      {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'total_revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
"""


def q14_promo_share(spark, sf_dir: str) -> DataFrame:
    """Broadcast dim join + conditional aggregate ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(promo_rev.cast("decimal(24,6)")).cast("double")
             / F.sum(rev.cast("decimal(24,6)")).cast("double")
             ).alias("promo_share"),
            dsum(rev, "total_revenue"),
        )
    )


@register(
    "q4614_selective_aggregates",
    oracle=f"""
    SELECT 'q4' AS part, o_orderpriority AS k1,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2,
           order_count AS n1
    FROM ({_SQL_Q4}) q4
    UNION ALL
    SELECT 'q6' AS part, CAST(NULL AS VARCHAR) AS k1, revenue AS v1,
           CAST(NULL AS DOUBLE) AS v2, n_rows AS n1
    FROM ({_SQL_Q6}) q6
    UNION ALL
    SELECT 'q14' AS part, CAST(NULL AS VARCHAR) AS k1, promo_share AS v1,
           total_revenue AS v2, CAST(NULL AS BIGINT) AS n1
    FROM ({_SQL_Q14}) q14
    """,
    tags=("relational", "semijoin", "filter", "pushdown", "agg"),
    doc="TPC-H Q4 + Q6 + Q14 shapes as one tagged union (driver "
        "50-row-cap consolidation, same pattern as q578): semi-join "
        "EXISTS with non-equi residual, full-pushdown scalar aggregate, "
        "and broadcast-join conditional ratio. Each branch keeps its "
        "full plan; the union is a zero-shuffle concatenation.",
)
def q4614_selective_aggregates(spark, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    q4 = q4_order_priority(spark, sf_dir).select(
        F.lit("q4").alias("part"), F.col("o_orderpriority").alias("k1"),
        null_d.alias("v1"), null_d.alias("v2"),
        F.col("order_count").alias("n1"))
    q6 = q6_revenue_delta(spark, sf_dir).select(
        F.lit("q6").alias("part"), null_s.alias("k1"),
        F.col("revenue").alias("v1"), null_d.alias("v2"),
        F.col("n_rows").alias("n1"))
    q14 = q14_promo_share(spark, sf_dir).select(
        F.lit("q14").alias("part"), null_s.alias("k1"),
        F.col("promo_share").alias("v1"),
        F.col("total_revenue").alias("v2"), null_l.alias("n1"))
    return q4.unionByName(q6).unionByName(q14)


# ---------------------------------------------------------------------------
# Top-k brand revenue (join + group + deterministic top-k)
# ---------------------------------------------------------------------------

# topk_brand_revenue / segment_customer_rank register as ONE catalog
# entry (rank_topk_battery below) for the driver 50-row-cap reason.

_SQL_TOPK_BRAND = f"""
    SELECT p_brand, {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 10
"""


def topk_brand_revenue(spark, sf_dir: str) -> DataFrame:
    """Join + group + deterministic top-k (total-order tie-break)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Window ranking — top customers per market segment
# ---------------------------------------------------------------------------

_SQL_SEGMENT_RANK = """
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rk FROM (
      SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer) t
    WHERE rk <= 5
"""


def segment_customer_rank(spark, sf_dir: str) -> DataFrame:
    """RANK() window with total-order tie-break; one shuffle on segment."""
    from pyspark.sql.window import Window
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rk")
    )


@register(
    "rank_topk_battery",
    oracle=f"""
    SELECT 'topk' AS part, p_brand AS k1, CAST(NULL AS VARCHAR) AS k2,
           CAST(NULL AS VARCHAR) AS k3, revenue AS v, n_items AS n
    FROM ({_SQL_TOPK_BRAND}) topk
    UNION ALL
    SELECT 'segment' AS part, c_mktsegment AS k1,
           CAST(c_custkey AS VARCHAR) AS k2, c_name AS k3,
           c_acctbal AS v, rk AS n
    FROM ({_SQL_SEGMENT_RANK}) seg
    """,
    tags=("relational", "window", "topk"),
    doc="Deterministic top-k (group + order + limit) and RANK() window "
        "ranking as one tagged union (driver 50-row-cap consolidation). "
        "Each branch keeps its full plan and total-order tie-breaks.",
)
def rank_topk_battery(spark, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    topk = topk_brand_revenue(spark, sf_dir).select(
        F.lit("topk").alias("part"), F.col("p_brand").alias("k1"),
        null_s.alias("k2"), null_s.alias("k3"),
        F.col("revenue").alias("v"), F.col("n_items").alias("n"))
    seg = segment_customer_rank(spark, sf_dir).select(
        F.lit("segment").alias("part"), F.col("c_mktsegment").alias("k1"),
        F.col("c_custkey").cast("string").alias("k2"),
        F.col("c_name").alias("k3"), F.col("c_acctbal").alias("v"),
        F.col("rk").cast("long").alias("n"))
    return topk.unionByName(seg)


# ---------------------------------------------------------------------------
# Rollup — nation/brand revenue with subtotals
# ---------------------------------------------------------------------------

# nation_brand_rollup / nation_coverage_distinct register as ONE catalog
# entry (nation_rollup_coverage below) for the driver 50-row-cap reason.

_SQL_NATION_ROLLUP = f"""
    SELECT n_name, p_brand,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE n_regionkey = 0
    GROUP BY ROLLUP (n_name, p_brand)
"""


def nation_brand_rollup(spark, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (reference has none; Catalyst builtin)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .rollup("n_name", "p_brand")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# Set operation — customers active early but not late (EXCEPT)
# ---------------------------------------------------------------------------

# churned_customers_except / customers_without_orders register as ONE
# catalog entry (customer_set_ops below) for the driver 50-row-cap reason.

_SQL_CHURNED = """
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


def churned_customers_except(spark, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) between two filtered scans."""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return early.subtract(late)  # EXCEPT (distinct semantics), same as oracle


# ---------------------------------------------------------------------------
# Anti join — customers with no orders at all
# ---------------------------------------------------------------------------

_SQL_NO_ORDERS = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def customers_without_orders(spark, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "customer_set_ops",
    oracle=f"""
    SELECT 'churned' AS part, custkey,
           CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM ({_SQL_CHURNED}) churned
    UNION ALL
    SELECT 'no_orders' AS part, c_custkey AS custkey, c_name, c_mktsegment
    FROM ({_SQL_NO_ORDERS}) no_orders
    """,
    tags=("relational", "setop", "antijoin"),
    doc="EXCEPT set-difference and NOT-EXISTS anti join as one tagged "
        "union (driver 50-row-cap consolidation). Each branch keeps its "
        "full plan.",
)
def customer_set_ops(spark, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    churned = churned_customers_except(spark, sf_dir).select(
        F.lit("churned").alias("part"), F.col("custkey"),
        null_s.alias("c_name"), null_s.alias("c_mktsegment"))
    no_orders = customers_without_orders(spark, sf_dir).select(
        F.lit("no_orders").alias("part"),
        F.col("c_custkey").alias("custkey"), F.col("c_name"),
        F.col("c_mktsegment"))
    return churned.unionByName(no_orders)


# ---------------------------------------------------------------------------
# Distinct aggregation — supplier/part coverage per nation
# ---------------------------------------------------------------------------

_SQL_NATION_COVERAGE = """
    SELECT n_name,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
"""


def nation_coverage_distinct(spark, sf_dir: str) -> DataFrame:
    """Multi-column COUNT(DISTINCT) with broadcast dim joins."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "nation_rollup_coverage",
    oracle=f"""
    SELECT 'rollup' AS part, n_name, p_brand, revenue AS v,
           n_items AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS BIGINT) AS n3
    FROM ({_SQL_NATION_ROLLUP}) r
    UNION ALL
    SELECT 'coverage' AS part, n_name, CAST(NULL AS VARCHAR) AS p_brand,
           CAST(NULL AS DOUBLE) AS v, n_lineitems AS n1, n_parts AS n2,
           n_suppliers AS n3
    FROM ({_SQL_NATION_COVERAGE}) c
    """,
    tags=("relational", "rollup", "distinct"),
    doc="ROLLUP grouping sets and multi-column COUNT(DISTINCT) as one "
        "tagged union (driver 50-row-cap consolidation). Each branch "
        "keeps its full plan.",
)
def nation_rollup_coverage(spark, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    roll = nation_brand_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("part"), F.col("n_name"), F.col("p_brand"),
        F.col("revenue").alias("v"), F.col("n_items").alias("n1"),
        null_l.alias("n2"), null_l.alias("n3"))
    cov = nation_coverage_distinct(spark, sf_dir).select(
        F.lit("coverage").alias("part"), F.col("n_name"),
        null_s.alias("p_brand"), null_d.alias("v"),
        F.col("n_lineitems").alias("n1"), F.col("n_parts").alias("n2"),
        F.col("n_suppliers").alias("n3"))
    return roll.unionByName(cov)


# ---------------------------------------------------------------------------
# Q7 — volume shipping (nation-pair flows; TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_SQL_Q7 = f"""
    SELECT supp_nation, cust_nation, l_year,
           {SQL_DSUM('volume', 'revenue')}
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


def q7_volume_shipping(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume per ship
    year. Two broadcast nation joins against the fact; one shuffle for
    the 3-key aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    ns = nat.select(F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"))
    nc = nat.select(F.col("n_nationkey").alias("c_nkey"),
                    F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share (conditional share of a join; TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_SQL_Q8 = """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN CAST(volume AS DECIMAL(24,6))
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region   ON nc.n_regionkey = r_regionkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
"""


def q8_market_share(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    market per order year — conditional decimal-exact sums divided as
    doubles (deterministic both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA")
    nc = nat.select(F.col("n_nationkey").alias("c_nkey"),
                    F.col("n_regionkey").alias("c_rkey"))
    ns = nat.select(F.col("n_nationkey").alias("s_nkey"),
                    F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = vol.cast("decimal(24,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg((F.sum(F.when(F.col("supp_nation") == "NATION_3", dec)
                    .otherwise(F.lit(0).cast("decimal(24,6)")))
              .cast("double")
              / F.sum(dec).cast("double")).alias("mkt_share"))
    )


@register(
    "q578_nation_trade_flows",
    oracle=f"""
    SELECT 'q5' AS part, n_name AS k1, NULL AS k2, revenue AS v
    FROM ({_SQL_Q5}) q5
    UNION ALL
    SELECT 'q7' AS part, supp_nation || '->' || cust_nation AS k1,
           CAST(l_year AS VARCHAR) AS k2, revenue AS v
    FROM ({_SQL_Q7}) q7
    UNION ALL
    SELECT 'q8' AS part, CAST(o_year AS VARCHAR) AS k1, NULL AS k2,
           mkt_share AS v
    FROM ({_SQL_Q8}) q8
    """,
    tags=("relational", "join", "share"),
    doc="TPC-H Q5 + Q7 + Q8 shapes as one tagged union: local-supplier "
        "volume (6-way join), bidirectional nation-pair trade flows, and "
        "one nation's PROMO market share. Each branch keeps its full "
        "join tree (all dims broadcast, one fact-side aggregation "
        "shuffle each); the union is a zero-shuffle concatenation.",
)
def q578_nation_trade_flows(spark, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    q5 = q5_local_supplier_volume(spark, sf_dir).select(
        F.lit("q5").alias("part"), F.col("n_name").alias("k1"),
        null_s.alias("k2"), F.col("revenue").alias("v"))
    q7 = q7_volume_shipping(spark, sf_dir).select(
        F.lit("q7").alias("part"),
        F.concat_ws("->", "supp_nation", "cust_nation").alias("k1"),
        F.col("l_year").cast("string").alias("k2"),
        F.col("revenue").alias("v"))
    q8 = q8_market_share(spark, sf_dir).select(
        F.lit("q8").alias("part"), F.col("o_year").cast("string").alias("k1"),
        null_s.alias("k2"), F.col("mkt_share").alias("v"))
    return q5.unionByName(q7).unionByName(q8)


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated per-part average; Q17 shape)
# ---------------------------------------------------------------------------

# Q17/Q19 register as ONE catalog entry (q1719_bracket_predicates, defined
# after q19 further down) for the same 50-query driver-cap reason as q578.

_SQL_Q17 = f"""
    WITH part_avg AS (
      SELECT l_partkey AS a_partkey,
             {SQL_DAVG('l_quantity', 'avg_qty')}
      FROM lineitem GROUP BY l_partkey)
    SELECT {SQL_DSUM('l_extendedprice', 'total_revenue')},
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg ON l_partkey = a_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < 0.5 * avg_qty
"""


def q17_small_quantity_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems under half their part's average
    quantity, one brand — the correlated scalar subquery expressed as an
    aggregate-then-rejoin (Catalyst's decorrelation target shape). The
    per-part average re-joins the fact on its own grouping key, so AQE
    can plan it as a broadcast after the agg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1")
    part_avg = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
                .agg(davg(F.col("l_quantity"), "avg_qty")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == part_avg.a_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(dsum(F.col("l_extendedprice"), "total_revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (4-way join, revenue top-k per customer)
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
    doc="TPC-H Q10 shape: revenue lost to returned items per customer "
        "over one quarter. The quarter+returnflag filters reach the "
        "scans; customer/nation broadcast against the filtered fact.",
)
def q10_returned_items(spark, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregate)
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "outer-join", "agg"),
    doc="TPC-H Q13 shape: order-count histogram over ALL customers — "
        "the left outer join keeps order-less customers as c_count=0 "
        "(COUNT of a NULL key), then a second aggregate histograms the "
        "counts. Both aggregates are map-side combined.",
)
def q13_customer_distribution(spark, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey")
    c_orders = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (c_orders.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING-filtered agg joined back to facts)
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS b_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum_qty
    FROM big
    JOIN orders   ON o_orderkey = b_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("relational", "agg", "semi"),
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 250. The "
        "HAVING aggregate runs first (map-side combined on the fact), "
        "and only the tiny surviving set joins orders/customer — the "
        "aggregate IS the semi-join filter.",
)
def q18_large_volume_customers(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > 250))
    return (
        F.broadcast(big)
        .join(orders, F.col("b_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive bracket predicates (OR-of-ANDs join filter)
# ---------------------------------------------------------------------------

_SQL_Q19 = f"""
    SELECT {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


def q19_disjunctive_brackets(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd (brand, size, quantity) brackets
    across the join. Catalyst pushes the derivable single-side residuals
    (quantity range union to lineitem, brand/size union to part) below
    the join; the exact disjunction evaluates as the join residual.
    Registered via the q1719_bracket_predicates tagged union below."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (j.filter(bracket)
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      "revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@register(
    "q1719_bracket_predicates",
    oracle=f"""
    SELECT 'q17' AS part, total_revenue AS revenue, n_rows
    FROM ({_SQL_Q17}) q17
    UNION ALL
    SELECT 'q19' AS part, revenue, n_items AS n_rows
    FROM ({_SQL_Q19}) q19
    """,
    tags=("relational", "join", "pushdown", "decorrelate"),
    doc="TPC-H Q17 + Q19 shapes as one tagged union (driver 50-row-cap "
        "consolidation, same pattern as q578): Q17's correlated per-part "
        "average (aggregate-then-rejoin decorrelation shape) and Q19's "
        "OR-of-ANDs bracket predicates. Each branch keeps its full plan; "
        "the union is a zero-shuffle concatenation.",
)
def q1719_bracket_predicates(spark, sf_dir: str) -> DataFrame:
    q17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17").alias("part"),
        F.col("total_revenue").alias("revenue"),
        F.col("n_rows"))
    q19 = q19_disjunctive_brackets(spark, sf_dir).select(
        F.lit("q19").alias("part"), F.col("revenue"),
        F.col("n_items").alias("n_rows"))
    return q17.unionByName(q19)


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE)
               / COUNT(*) AS threshold
      FROM customer WHERE c_acctbal > 0.0)
    SELECT n_name, COUNT(*) AS numcust,
           {SQL_DSUM('c_acctbal', 'totacctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > threshold
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-03-01 00:00:00')
    GROUP BY n_name
    """,
    tags=("relational", "anti", "scalar-subquery"),
    doc="TPC-H Q22 shape (phone prefix -> nation): above-average-balance "
        "customers with no recent orders. The positive-balance average "
        "is a 1-row broadcast scalar; the recency check is a broadcast "
        "anti join against date-filtered orders.",
)
def q22_dormant_customers(spark, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-03-01").cast("timestamp"))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(davg(F.col("c_acctbal"), "threshold")))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum(F.col("c_acctbal"), "totacctbal"))
    )


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part (correlated min via rank)
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT p_partkey, p_brand, s_name, unit_price,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
                ORDER BY unit_price, s_name) AS rk
      FROM offers
      JOIN part     ON p_partkey = l_partkey AND p_size = 15
      JOIN supplier ON s_suppkey = l_suppkey)
    SELECT p_partkey, p_brand, s_name, unit_price
    FROM ranked WHERE rk = 1
    ORDER BY p_partkey LIMIT 20
    """,
    tags=("relational", "window", "correlated"),
    doc="TPC-H Q2 shape on the reduced schema (no partsupp): each "
        "supplier's best observed unit price per part stands in for "
        "ps_supplycost; the correlated MIN becomes a rank-1 window over "
        "the per-(part,supplier) aggregate — Catalyst's decorrelation "
        "target shape, one shuffle on l_partkey shared by the aggregate "
        "and the window.",
)
def q2_min_cost_supplier(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    offers = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_price")))
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("unit_price"), F.asc("s_name"))
    return (
        offers.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "unit_price")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "p_brand", "s_name", "unit_price")
        .orderBy(F.asc("p_partkey"))
        .limit(20)
    )
