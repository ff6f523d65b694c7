"""Second wave of star-schema queries: TPC-H Q7/Q8/Q10/Q15/Q16/Q18
shapes adapted to the driver's column set (no partsupp table, no
l_shipmode/receiptdate — substitutions documented per query).

Like ``star_queries``, these exist because the reference
(YongzhQi/realtime-event-streaming) delegates its relational surface to
ClickHouse (`sql/metrics_queries.sql`); a user switching engines needs
the same reach. Each shape exercises a distinct optimizer pattern:

- Q7: self-joined dimension (nation as n1 AND n2) with an OR-pair
  predicate — both sides broadcast, fact scan filtered by date only.
- Q8: conditional share-of-total aggregate (CASE inside sum / sum).
- Q10: top-k over a grouped 4-way join keyed by a fact-side filter
  (l_returnflag = 'R') that pushes to the parquet scan.
- Q15: window-max over a grouped subquery (TPC-H's CREATE VIEW +
  scalar-subquery form re-expressed as one plan — no view, no rescan:
  Spark computes revenue once and the max via a single-partition
  window over the *grouped* (small) result, not the fact table).
- Q16: count(DISTINCT supplier) per part attribute with a NOT-IN-style
  anti-predicate (lineitem stands in for partsupp).
- Q18: group-HAVING semi-join (large-volume orders) feeding a top-k.

Scale posture: all dimension joins either explicit-broadcast (nation,
region) or AQE-switched; fact-fact joins shuffle on the order key; all
top-k are TakeOrderedAndProject. The only single-partition window is
Q15's, over an O(|suppliers|) aggregate — bounded, never the fact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


NTZ = "timestamp_ntz"


# ---------------------------------------------------------------------------
# Q7 shape — bilateral nation trade volume
# ---------------------------------------------------------------------------

_Q7_DUCK = """
SELECT supp_nation, cust_nation, l_year,
       cast(sum(cast(round(volume * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("nation_trade_volume", _Q7_DUCK, tags=("star",))
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape. nation joins twice under two aliases — both
    broadcast (O(25) rows forever), so the OR-pair nation predicate
    evaluates map-side after two broadcast probes; only the
    l_shipdate range reaches the lineitem scan as a pushed filter."""
    nation = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(NTZ))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast(NTZ))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share within a region
# ---------------------------------------------------------------------------

_Q8_DUCK = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("market_share_by_year", _Q8_DUCK, tags=("star",))
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join, share-of-total via a conditional sum
    over the same grouped rows — ONE aggregation, no self-join against
    a totals subquery. p_type='ECONOMY' substitutes for the spec's
    3-token type (driver part table has single-token types)."""
    nation = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    ))
    reg = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast(NTZ))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast(NTZ))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        part.join(_t(spark, sf_dir, "lineitem"),
                  F.col("p_partkey") == F.col("l_partkey"))
        .join(_t(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(reg, F.col("c_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-item revenue ranking
# ---------------------------------------------------------------------------

_Q10_DUCK = """
SELECT c_custkey, c_name,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name AS nation
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
"""


@register("returned_item_ranking", _Q10_DUCK, tags=("star",))
def returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Both fact filters (o_orderdate range, l_returnflag='R') push to
    their parquet scans; nation broadcasts; top-20 is
    TakeOrderedAndProject."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast(NTZ))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast(NTZ))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier(s) by quarter revenue
# ---------------------------------------------------------------------------

_Q15_DUCK = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("top_supplier_revenue", _Q15_DUCK, tags=("star",))
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape. The spec's CREATE VIEW + scalar subquery would
    scan lineitem twice; here the grouped revenue is computed ONCE and
    the max comes from an unpartitioned window over that O(|supplier|)
    aggregate — bounded rows, so the single-partition window is safe at
    any SF (the fact table never passes through it). Rounding to 2dp
    happens BEFORE the max-equality test in both engines, keeping the
    tie set identical under float summation-order drift."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast(NTZ))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast(NTZ))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(
            "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
            " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
        ).alias("total_revenue")
    )
    w = Window.partitionBy()
    best = revenue.withColumn(
        "_mx", F.max("total_revenue").over(w)
    ).where(F.col("total_revenue") == F.col("_mx"))
    return (
        _t(spark, sf_dir, "supplier")
        .join(best, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier variety per part attribute
# ---------------------------------------------------------------------------

_Q16_DUCK = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


@register("part_supplier_variety", _Q16_DUCK, tags=("star",))
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape with lineitem's (l_partkey, l_suppkey) standing
    in for the absent partsupp table. All three part predicates
    (<>, <>, IN-list) push to the part scan; the part side then
    broadcast-joins under AQE. count(DISTINCT) plans as the standard
    two-phase expand/aggregate — partial distinct map-side first."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    )
    return (
        part.join(
            _t(spark, sf_dir, "lineitem"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# Q18 shape — large-volume customers
# ---------------------------------------------------------------------------

_Q18_DUCK = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 180
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 50
"""


@register("large_volume_customers", _Q18_DUCK, tags=("star",))
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (group-HAVING), semi-joined back as the order filter, then the
    customer detail re-aggregated. The HAVING side is a partial-agg
    group-by on the natural shuffle key (l_orderkey), and Spark plans
    the IN as a left-semi join — at 100 TB both sides already shuffle
    on orderkey, so AQE coalesces them into one exchange reuse.
    Threshold 180 ≈ the spec's 300 scaled to this generator's ~7-line
    orders at qty≤50."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .where(F.col("_sq") > 180)
        .select(F.col("l_orderkey").alias("_bk"))
    )
    return (
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big, F.col("o_orderkey") == F.col("_bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(50)
    )
