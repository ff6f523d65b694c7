"""Fourth wave of star-schema queries: the remaining classic TPC-H
shapes (Q6/Q9/Q12/Q17/Q20/Q22) adapted to the driver's column set —
with the waves 1-3 this closes the full 22-shape family. Substitutions
(documented per query, same policy as ``star_queries3``): no
ps_supplycost -> cost is a fixed fraction of p_retailprice x quantity;
no l_shipmode/l_receiptdate -> order->ship latency buckets; no c_phone
country code -> nationkey cohort; p_name filters -> p_type/p_brand.

Reference counterpart: the reference delegates relational reach to
ClickHouse (sql/metrics_queries.sql); a user switching engines keeps
the full SQL surface. Optimizer patterns pinned here, each distinct
from waves 1-3:

- Q6: ALL predicates (range + band + threshold) land in the parquet
  scan's PushedFilters — the pure pushdown query, no join at all.
- Q9: 5-table star join with a computed profit expression, grouped on
  (nation, year) — dimension broadcasts around one fact scan.
- Q12: CASE-sum pivot over a derived latency bucket spanning both join
  sides.
- Q17: correlated per-part average decorrelated into a group-by +
  re-join (the window-free form: the cap table is a fact-key
  aggregate, not a per-row window).
- Q20: two-level aggregate (per (part,supp) then per part) feeding a
  share-of-total threshold — sums of integer-valued doubles, so the
  0.5x comparison is drift-free by construction.
- Q22: scalar-average threshold + ANTI join (customers with no
  orders), cohort rollup.

Determinism: thresholds are rounded (or exactly representable — 0.5x,
integer sums) before comparison on both sides; counts cast to BIGINT;
ties ordered on keys (oracle-determinism rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q6 shape — revenue uplift from a discount band (pure pushdown)
# ---------------------------------------------------------------------------

_Q6_DUCK = """
SELECT cast(sum(cast(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS uplift,
       cast(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("discount_uplift", _Q6_DUCK, tags=("star",))
def discount_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue uplift of dropping a
    discount band — one scan, zero joins, and every predicate (ship
    date range, discount band, quantity cap) must reach the parquet
    reader's PushedFilters (plan-asserted in
    test_plan_properties.py). The agg is a 1-row map-side reduce; at
    100 TB this query is pure scan bandwidth, which is the point of
    pinning its pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "cast(sum(cast(round(l_extendedprice * l_discount"
                " * 10000) AS BIGINT)) AS DOUBLE) / 10000"
            ).alias("uplift"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape — profit by supplier nation and order year
# ---------------------------------------------------------------------------

#: ps_supplycost substitute: cost a supplier pays per line is a fixed
#: fraction of the part's retail price times quantity.
_COST_FRAC = 0.6

#: Per-line profit is EXACT at 4 decimal places (2dp price x 2dp
#: discount factor; 1dp cost fraction x 2dp retail x integer qty), so
#: each line quantizes to an exact BIGINT count of 1e-4 currency units
#: via one deterministic per-row round() — identical input doubles,
#: identical product, never near a .5 (the true value IS an integer in
#: these units, and double spacing at this magnitude is ~1e-7). The
#: GROUP SUM is then pure integer — immune to the summation-order
#: drift that flipped the 2dp round() at sf1 (sweep catch, PERF.md) —
#: and the output divides the exact integer by 1e4 once, with no
#: rounding step at all.
_Q9_DUCK = f"""
SELECT n.n_name AS nation,
       cast(year(o.o_orderdate) AS BIGINT) AS yr,
       cast(sum(cast(round((l.l_extendedprice * (1 - l.l_discount)
                 - {_COST_FRAC} * p.p_retailprice * l.l_quantity)
                 * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_type = 'ECONOMY'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, yr
"""


@register("profit_by_nation_year", _Q9_DUCK, tags=("star",))
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    )
    sup = F.broadcast(_t(spark, sf_dir, "supplier"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    orders = _t(spark, sf_dir, "orders")
    # exact 1e-4-unit integer per line (see the oracle comment): the
    # group sum is integer, so reduction order cannot move the value.
    profit_u = F.expr(
        "cast(round((l_extendedprice * (1 - l_discount) "
        f"- {_COST_FRAC} * p_retailprice * l_quantity) * 10000) AS BIGINT)"
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            (F.sum(profit_u).cast("double") / 10000).alias("profit")
        )
        .orderBy("nation", "yr")
    )
profit_by_nation_year.__doc__ = """TPC-H Q9 shape: per (supplier nation, order year) profit on one
    product line — revenue minus a cost substitute of
    {_COST_FRAC} x p_retailprice x quantity (no partsupp table; the
    spec's p_name LIKE filter becomes p_type = 'ECONOMY'). Five-table
    star: part/supplier/nation broadcast, orders joins on the fact's
    natural l_orderkey, one lineitem scan feeds the whole computed
    expression — the classic profit-rollup plan a warehouse runs at
    any scale.""".format(_COST_FRAC=_COST_FRAC)


# ---------------------------------------------------------------------------
# Q12 shape — priority mix by fulfillment-latency bucket
# ---------------------------------------------------------------------------

_Q12_LATENCY_DAYS = 60

_Q12_DUCK = f"""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
              > {_Q12_LATENCY_DAYS}
            THEN 'slow' ELSE 'fast' END AS bucket,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
       cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY bucket
"""


@register("priority_by_latency", _Q12_DUCK, tags=("star",))
def priority_by_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff("l_shipdate", "o_orderdate") > _Q12_LATENCY_DAYS, "slow"
    ).otherwise("fast")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_priority"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_priority"),
        )
        .orderBy("bucket")
    )
priority_by_latency.__doc__ = """TPC-H Q12 shape: how many high- vs low-priority orders landed
    in each fulfillment-latency bucket (the driver set has no
    l_shipmode/l_receiptdate; order->ship latency over
    {_Q12_LATENCY_DAYS} days substitutes for the spec's ship-mode
    split — same CASE-sum pivot spanning both join sides). One
    fact-keyed join, ship-date range pushed to the lineitem scan,
    2-row output.""".format(_Q12_LATENCY_DAYS=_Q12_LATENCY_DAYS)


# ---------------------------------------------------------------------------
# Q17 shape — revenue locked in small-quantity orders
# ---------------------------------------------------------------------------

_Q17_QCAP_FRAC = 0.2

_Q17_DUCK = f"""
WITH pa AS (
  SELECT l_partkey, round({_Q17_QCAP_FRAC} * avg(l_quantity), 2) AS qcap
  FROM lineitem GROUP BY l_partkey
)
SELECT round(cast(sum(cast(round(l.l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 / 7.0, 2) AS avg_yearly,
       cast(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN pa     ON l.l_partkey = pa.l_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size <= 5
  AND l.l_quantity < pa.qcap
"""


@register("small_quantity_revenue", _Q17_DUCK, tags=("star",))
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        F.round(F.lit(_Q17_QCAP_FRAC) * F.avg("l_quantity"), 2).alias("qcap")
    )
    part = F.broadcast(
        _t(spark, sf_dir, "part").where(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 5)
        )
    )
    return (
        li.join(pa, "l_partkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("l_quantity") < F.col("qcap"))
        .agg(
            F.round(
                F.expr(
                    "cast(sum(cast(round(l_extendedprice * 10000)"
                    " AS BIGINT)) AS DOUBLE) / 10000"
                )
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )
small_quantity_revenue.__doc__ = """TPC-H Q17 shape: yearly revenue that would disappear if orders
    below {_Q17_QCAP_FRAC} x a part's average quantity were refused.
    The spec's correlated per-part scalar subquery is decorrelated
    into a (l_partkey -> qcap) aggregate re-joined to the fact — the
    cap table is fact-keyed, so the join shuffles on the same key the
    aggregate produced (one exchange, reused). Drift-free threshold:
    quantities are integer-valued doubles, so per-part sums are exact
    and the rounded cap is identical across engines/partitionings.""".format(_Q17_QCAP_FRAC=_Q17_QCAP_FRAC)


# ---------------------------------------------------------------------------
# Q20 shape — suppliers dominating a part's supply
# ---------------------------------------------------------------------------

_Q20_SHARE = 0.5  # exactly representable: the comparison cannot drift
_Q20_MIN_SIZE = 12

_Q20_DUCK = f"""
WITH pq AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
pt AS (SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY l_partkey)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
       cast(count(*) AS BIGINT) AS dominated_parts
FROM pq
JOIN pt         ON pq.l_partkey = pt.l_partkey
JOIN part p     ON pq.l_partkey = p.p_partkey
JOIN supplier s ON pq.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_size >= {_Q20_MIN_SIZE} AND pq.sq > {_Q20_SHARE} * pt.tq
GROUP BY s.s_suppkey, s.s_name, n.n_name
ORDER BY dominated_parts DESC, s_suppkey
LIMIT 25
"""


@register("dominant_part_suppliers", _Q20_DUCK, tags=("star",))
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    pt = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    part = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_size") >= _Q20_MIN_SIZE)
    )
    sup = F.broadcast(_t(spark, sf_dir, "supplier"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        pq.join(pt, "l_partkey")
        .where(F.col("sq") > F.lit(_Q20_SHARE) * F.col("tq"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(F.count("*").cast("bigint").alias("dominated_parts"))
        .orderBy(F.desc("dominated_parts"), "s_suppkey")
        .limit(25)
    )
dominant_part_suppliers.__doc__ = """TPC-H Q20 shape: suppliers who shipped more than
    {_Q20_SHARE:.0%} of a (large) part's total quantity — the
    excess-stock/concentration screen, with lineitem-derived supply
    standing in for partsupp.availqty. Two-level aggregate: per
    (part, supplier) quantities, re-aggregated per part for the
    total; both group-bys share the l_partkey shuffle key. Integer
    quantity sums x an exactly-representable 0.5 make the share
    comparison bit-deterministic with NO rounding step needed — the
    one threshold in the star family that is exact by construction.""".format(_Q20_SHARE=_Q20_SHARE)


# ---------------------------------------------------------------------------
# Q22 shape — well-funded customers who never ordered
# ---------------------------------------------------------------------------

_Q22_COHORTS = 5

_Q22_DUCK = f"""
WITH pos AS (
  SELECT round(avg(c_acctbal), 2) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT cast(c.c_nationkey % {_Q22_COHORTS} AS BIGINT) AS cohort,
       cast(count(*) AS BIGINT) AS n_customers,
       cast(sum(cast(round(c.c_acctbal * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS total_bal
FROM customer c, pos
WHERE c.c_acctbal > pos.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey % {_Q22_COHORTS}
ORDER BY cohort
"""


@register("idle_customer_balance", _Q22_DUCK, tags=("star",))
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pos = F.broadcast(
        cust.where(F.col("c_acctbal") > 0).agg(
            F.round(F.avg("c_acctbal"), 2).alias("ab")
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(pos)
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy(
            (F.col("c_nationkey") % _Q22_COHORTS)
            .cast("bigint")
            .alias("cohort")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.expr(
                "cast(sum(cast(round(c_acctbal * 10000) AS BIGINT))"
                " AS DOUBLE) / 10000"
            ).alias("total_bal"),
        )
        .orderBy("cohort")
    )
idle_customer_balance.__doc__ = """TPC-H Q22 shape: customers holding above-average positive
    balances who never placed an order, rolled up per cohort
    (nationkey mod {_Q22_COHORTS} substitutes the spec's phone
    country-code prefix). The scalar average broadcasts as a 1-row
    frame (rounded BEFORE the comparison — the float-drift rule);
    "never ordered" is a LEFT ANTI join on o_custkey, the scalable
    form of NOT EXISTS; the cohort rollup is O(cohorts). The anti
    join's build side is just order custkeys — column-pruned to one
    INT per order at the scan.""".format(_Q22_COHORTS=_Q22_COHORTS)
