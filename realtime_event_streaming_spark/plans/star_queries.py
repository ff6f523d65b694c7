"""Star-schema join/aggregate queries over the driver's TPC-H-ish tables.

The reference itself contains **no joins** (SURVEY.md §2.8) — it gets
them from ClickHouse. A user switching engines still needs the full
relational surface, so these queries exercise it: multi-way joins,
semi-joins (EXISTS), scalar subqueries, top-k, grouped aggregates over
derived measures.

Scale posture (100 TB):
- ``region``/``nation`` are O(10) rows forever -> explicit
  ``broadcast()`` hints, no shuffle for those joins.
- ``supplier``/``part``/``customer`` grow with SF -> left to AQE, which
  broadcast-switches at runtime when a side is small and shuffle-hash/
  sort-merge joins otherwise; skew-join splitting is enabled.
- Fact-fact (orders x lineitem) joins shuffle on the order key — the
  natural co-partitioning key; with bucketed tables these become
  shuffle-free (io layer can bucket by l_orderkey).
- Top-k is ``orderBy().limit()`` -> Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge), never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


NTZ = "timestamp_ntz"


# ---------------------------------------------------------------------------
# T1 — pricing summary report (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_T1_DUCK = """
WITH q AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_discount,
         cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS eq,
         cast(floor(l_discount * 100 + 0.5) AS BIGINT) AS dq,
         cast(floor(l_tax * 100 + 0.5) AS BIGINT) AS tq
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       cast(sum(eq) AS DOUBLE) / 100 AS sum_base_price,
       cast(sum(eq * (100 - dq)) AS DOUBLE) / 10000 AS sum_disc_price,
       cast(sum(eq * (100 - dq) * (100 + tq)) AS DOUBLE) / 1000000 AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM q
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _T1_DUCK, headline=True, tags=("star",))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: single scan, derived measures,
    low-cardinality group-by. Whole-stage-codegen'd partial agg makes
    the shuffle ~6 rows regardless of input size.

    Determinism form (round-8 rework of the round-7 hardening, which
    the r6->r7 driver bench showed cost +121% on this full-scan
    query): price/discount/tax are 2-decimal quantities, so they
    quantize ONCE to integer cents / basis points — cast(floor(x*100
    + 0.5)) is a codegen intrinsic, unlike round()-on-double which
    routes through per-row BigDecimal — and every derived measure is
    an exact integer product of those quanta: eq*(100-dq) IS
    round(price*(1-disc)*1e4) bit-for-bit on 2dp data (the float
    chain sits within a few ulps of the same integer), so the output
    is unchanged while the per-row cost drops from three BigDecimal
    rounds on long multiply chains to three cheap floors. Measured
    at sf0.1: 0.79s -> ~0.45s median. Sum magnitudes are unchanged
    from the round-7 form (charge quanta <= ~1.2e11/row; BIGINT-safe
    to ~7.7e7 rows per group, then re-scale the quantum)."""
    li = _t(spark, sf_dir, "lineitem")
    pre = li.where(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast(NTZ)
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.expr("cast(floor(l_extendedprice * 100 + 0.5D) AS BIGINT)").alias("eq"),
        F.expr("cast(floor(l_discount * 100 + 0.5D) AS BIGINT)").alias("dq"),
        F.expr("cast(floor(l_tax * 100 + 0.5D) AS BIGINT)").alias("tq"),
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.sum("eq").cast("double") / 100).alias("sum_base_price"),
            F.expr(
                "cast(sum(eq * (100 - dq)) AS DOUBLE) / 10000"
            ).alias("sum_disc_price"),
            F.expr(
                "cast(sum(eq * (100 - dq) * (100 + tq)) AS DOUBLE) / 1000000"
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# T2 — segment shipping priority (TPC-H Q3 shape): 3-way join + top-k
# ---------------------------------------------------------------------------

_T2_DUCK = """
SELECT l_orderkey,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("segment_top_orders", _T2_DUCK, headline=True, tags=("star",))
def segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered customer ⋈ orders ⋈ lineitem, revenue
    per order, top-10. Filters push to the parquet scans; the
    customer⋈orders join broadcast-switches under AQE when the filtered
    customer side is small."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast(NTZ)
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast(NTZ)
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# T3 — regional local-supplier volume (TPC-H Q5 shape): 6-way join
# ---------------------------------------------------------------------------

_T3_DUCK = """
SELECT n_name AS nation,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


@register("regional_supplier_volume", _T3_DUCK, headline=True, tags=("star",))
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the local-supplier equi-condition
    (s_nationkey = c_nationkey). region/nation are broadcast explicitly
    (O(10) rows at any scale); supplier is broadcast under AQE."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast(NTZ))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast(NTZ))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# T4 — top customers by lifetime spend: join + top-k
# ---------------------------------------------------------------------------

_T4_DUCK = """
SELECT c_custkey, c_name,
       cast(sum(cast(round(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS total_spend,
       count(*) AS order_cnt
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
"""


@register("top_customers", _T4_DUCK, tags=("star",))
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by summed order value. Aggregate *before* the
    join would be ideal at scale — Catalyst cannot reorder that; we do
    it by hand: orders pre-aggregated per custkey, then joined, so the
    shuffle carries one row per customer instead of one per order."""
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 10000) AS BIGINT))"
            ).alias("spend"),
            F.count("*").alias("order_cnt"),
        )
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("spend").cast("double") / 10000).alias("total_spend"),
            "order_cnt",
        )
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# T5 — order priority check (TPC-H Q4 shape): EXISTS semi-join
# ---------------------------------------------------------------------------

_T5_DUCK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("order_priority_count", _T5_DUCK, tags=("star",))
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — planned as a left semi-join
    on the order key (no row duplication, no distinct needed)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast(NTZ))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast(NTZ))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# T6 — promo revenue share (TPC-H Q14 shape): join + conditional agg
# ---------------------------------------------------------------------------

_T6_DUCK = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS economy_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
"""


@register("promo_revenue_share", _T6_DUCK, tags=("star",))
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dim join with conditional aggregate ratio.
    part is keyed+narrow -> AQE broadcasts it at test scale; at 100 TB
    it becomes a shuffle-hash join on l_partkey."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast(NTZ))
        & (F.col("l_shipdate") < F.lit("1998-07-01 00:00:00").cast(NTZ))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("economy_revenue_pct")
        )
    )
