"""Third wave of star-schema queries: TPC-H Q2/Q11/Q13/Q19 shapes
adapted to the driver's column set (no partsupp table — lineitem's
(l_partkey, l_suppkey) derives the supply relation; no ps_supplycost —
unit cost is revenue/quantity; no comment/phone columns — priority and
nation substitute; substitutions documented per query).

Like ``star_queries``/``star_queries2``, these exist because the
reference (YongzhQi/realtime-event-streaming) delegates relational
reach to ClickHouse (`sql/metrics_queries.sql`); a user switching
engines keeps it. Each shape exercises a distinct optimizer pattern
not yet pinned by the first twelve:

- Q2: per-group MIN with tie-keeping re-join (the decorrelated form of
  the spec's correlated scalar subquery) over a derived supply table.
- Q11: group aggregate HAVING a share-of-global-scalar threshold — the
  scalar total broadcast, never recomputed per group.
- Q13: LEFT OUTER join preserving zero-order customers, then a second
  aggregation over the first's results (count-of-counts histogram).
- Q19: OR-of-conjunctive-brackets predicate spanning both join sides —
  the part-side conjuncts must still push to the part scan.

Scale posture: dimensions broadcast; the supply/derived tables group on
their natural fact shuffle keys; per-part windows partition on
p_partkey (bounded by suppliers-per-part); the only global scalar is a
1-row broadcast. All rounding happens BEFORE min-equality/threshold
comparisons in both engines so tie sets are identical under float
summation-order drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q2 shape — cheapest supplier per part within a region
# ---------------------------------------------------------------------------

_Q2_DUCK = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         round(sum(l_extendedprice) / sum(l_quantity), 2) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eligible AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         supply.l_partkey, supply.unit_cost
  FROM supply
  JOIN supplier s ON supply.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT *, min(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM eligible
)
SELECT round(b.s_acctbal, 2) AS acctbal, b.s_name, b.n_name AS nation,
       p.p_partkey, p.p_name, b.unit_cost
FROM best b
JOIN part p ON b.l_partkey = p.p_partkey
WHERE b.unit_cost = b.min_cost
  AND p.p_type = 'STANDARD' AND p.p_size <= 10
ORDER BY acctbal DESC, b.s_name, p.p_partkey
LIMIT 20
"""


@register("min_cost_supplier", _Q2_DUCK, tags=("star",))
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the spec's correlated MIN(ps_supplycost)
    subquery, decorrelated the way Catalyst would — compute the supply
    table once, take the per-part MIN via a window partitioned by
    p_partkey (bounded by suppliers-per-part, never global), keep
    ties, join part attributes last. Unit cost is rounded to 2dp
    BEFORE the min-equality test so both engines keep identical tie
    sets. lineitem's (l_partkey, l_suppkey) aggregate stands in for
    the absent partsupp; revenue/quantity for ps_supplycost."""
    supply = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum("l_extendedprice") / F.sum("l_quantity"), 2
            ).alias("unit_cost")
        )
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    eligible = (
        supply.join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).where(F.col("unit_cost") == F.col("min_cost"))
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "unit_cost",
        )
        .orderBy(F.desc("acctbal"), "s_name", "p_partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 shape — parts carrying an outsized share of a nation's volume
# ---------------------------------------------------------------------------

#: share threshold as an exact integer divisor of the 1e-4-unit total
#: (0.001 of total volume): both sides of the compare are BIGINT, so
#: no float threshold exists to drift (the round-5 boundary-flip
#: class, now removed rather than mitigated).
_Q11_THOUSANDTHS_DIV = 1000

_Q11_DUCK = f"""
WITH natparts AS (
  SELECT l_partkey,
         cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS part_value_u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
),
total AS (SELECT cast(sum(part_value_u) AS BIGINT) AS tv_u FROM natparts)
SELECT l_partkey AS p_partkey,
       cast(part_value_u AS DOUBLE) / 10000 AS part_value
FROM natparts, total
WHERE part_value_u > tv_u // {_Q11_THOUSANDTHS_DIV}
ORDER BY part_value DESC, p_partkey
LIMIT 30
"""


@register("important_parts_by_value", _Q11_DUCK, tags=("star",))
def important_parts_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation's suppliers,
    kept only when it exceeds a fraction of the nation's TOTAL value.
    The total comes from an unpartitioned window over the
    already-GROUPED part-value table (the Q15 pattern) — a scalar
    crossJoin would re-derive the aggregate subplan and scan lineitem
    twice (verified in the first cut of this query); the window keeps
    one fact scan, and its single partition only ever holds the
    O(|part|-per-nation) aggregate, a bounded catalog dimension, never
    fact rows. Supplier-side value substitutes for
    ps_supplycost*ps_availqty."""
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    )
    natparts = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.expr(
                "sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT))"
            ).alias("part_value_u")
        )
    )
    tv = F.sum("part_value_u").over(Window.partitionBy())
    return (
        natparts.withColumn("tv_u", tv)
        # Both sides of the share test are exact BIGINTs in 1e-4
        # units — the float threshold the round-5 ADVICE had us round
        # no longer exists at all.
        .where(
            F.col("part_value_u")
            > F.expr(f"tv_u div {_Q11_THOUSANDTHS_DIV}")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("part_value_u").cast("double") / 10000).alias(
                "part_value"
            ),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Q13 shape — distribution of order counts per customer
# ---------------------------------------------------------------------------

_Q13_DUCK = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, cast(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_distribution", _Q13_DUCK, tags=("star",))
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts histogram. The LEFT OUTER join
    keeps zero-order customers (the histogram's 0 bucket — an inner
    join would silently drop them); the priority exclusion lives in
    the JOIN CONDITION, not a WHERE (a post-join WHERE on the orders
    side would turn the outer join back into an inner one). Two
    aggregations: per-customer count on the natural c_custkey shuffle,
    then the tiny count-distribution rollup."""
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive bracketed predicate revenue
# ---------------------------------------------------------------------------

_Q19_DUCK = """
SELECT p_brand,
       cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
ORDER BY p_brand
"""


@register("brackets_revenue", _Q19_DUCK, tags=("star",))
def brackets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three conjunctive brackets mixing
    part-side and lineitem-side predicates. The part-only disjunction
    (brand IN + the widest size range) is derivable and pushes to the
    part scan; the mixed residual evaluates post-join. Spark's
    optimizer extracts exactly that common disjunct — asserted in
    test_plan_properties — so the join probes a pre-filtered build
    side instead of all of part."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(bracket)
        .groupBy("p_brand")
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1 - l_discount)"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("revenue")
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers solely responsible for returns
# ---------------------------------------------------------------------------

_Q21_DUCK = """
WITH fl AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem WHERE l_returnflag = 'R'
),
multi AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2
)
SELECT s_name, cast(count(*) AS BIGINT) AS numwait
FROM fl
JOIN supplier ON fl.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM multi m WHERE m.l_orderkey = fl.l_orderkey)
  AND NOT EXISTS (
    SELECT 1 FROM fl o
    WHERE o.l_orderkey = fl.l_orderkey AND o.l_suppkey <> fl.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("sole_return_suppliers", _Q21_DUCK, tags=("star",))
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the SAME
    derived fact — the supplier is blamed when its lines were returned
    in a multi-supplier order and NO other supplier's lines were. The
    spec's l_receiptdate > l_commitdate lateness predicate maps to
    l_returnflag = 'R' (this schema has no receipt/commit dates).

    Expressed as Spark's decorrelation would: the EXISTS is a
    left-SEMI join against the multi-supplier order list, the NOT
    EXISTS a left-ANTI join against other-supplier flagged lines of
    the same order (equi on l_orderkey + the <> residual — stays a
    hash-joinable shape, asserted in test_plan_properties). Both sides
    shuffle on the natural l_orderkey key; supplier broadcasts under
    AQE; top-20 is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    fl = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select(F.col("l_orderkey").alias("m_ok"))
    )
    others = fl.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    blamed = (
        fl.join(multi, F.col("l_orderkey") == F.col("m_ok"), "left_semi")
        .join(
            others,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_anti",
        )
    )
    return (
        blamed.join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
