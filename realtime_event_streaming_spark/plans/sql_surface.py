"""Relational-surface queries beyond the reference's own corpus.

The reference leans on ClickHouse for its SQL surface; a user switching
engines expects the standard shapes to simply work. These cover the
surface areas the other plan modules don't: multi-grain aggregation in
one pass (GROUPING SETS — the one-query alternative to the reference's
separate rollup tables, SURVEY.md §2.4/A8), anti-joins, and correlated
scalar subqueries (decorrelated by Catalyst into a join — no custom
work needed, SURVEY.md §4)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as D
from ..io import load_table, register_views
from ..registry import register

# ---------------------------------------------------------------------------
# GROUPING SETS: minute/total grains of (event_type, device) in one pass
# ---------------------------------------------------------------------------

_GS_BODY = f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce({D.DEVICE_SQL}, 'ALL') AS device,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY GROUPING SETS ((event_type, {D.DEVICE_SQL}), (event_type), ())
ORDER BY event_type, device
"""


@register("grouping_sets_rollup", _GS_BODY, tags=("sql",))
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregation in ONE scan via GROUPING SETS — the
    single-pass alternative to the reference's three separate rollup
    tables (Spark plans one Expand + one aggregate; at 100 TB this
    halves the scans vs per-grain queries)."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_GS_BODY)


# ---------------------------------------------------------------------------
# Anti-join: customers with no orders
# ---------------------------------------------------------------------------

_ANTI_DUCK = """
SELECT c_mktsegment, count(*) AS inactive_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("inactive_customers", _ANTI_DUCK, tags=("sql", "star"))
def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent orders: NOT EXISTS -> left anti-join on
    the customer key (the filtered orders side prunes at the scan). No
    row duplication, no distinct."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("inactive_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# set operations: EXCEPT / INTERSECT (completing the family beyond the
# reference's UNION ALL — SURVEY.md §2.7 notes these as absent there)
# ---------------------------------------------------------------------------

_SETOPS_BODY = """
WITH viewers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'viewers_only' AS segment, count(*) AS users FROM
  (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM buyers)
UNION ALL
SELECT 'viewer_buyers', count(*) FROM
  (SELECT user_id FROM viewers INTERSECT SELECT user_id FROM buyers)
UNION ALL
SELECT 'buyers_only', count(*) FROM
  (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM viewers)
"""


@register("audience_set_ops", _SETOPS_BODY, tags=("sql",))
def audience_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience segmentation via EXCEPT / INTERSECT (planned as left
    anti / left semi joins) — completes the set-operation surface next
    to pipeline_health's UNION ALL."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_SETOPS_BODY)


# ---------------------------------------------------------------------------
# Correlated scalar subquery: parts priced above their type's average
# ---------------------------------------------------------------------------

_CORR_BODY = """
SELECT p_type, count(*) AS n_above_avg,
       round(max(p_retailprice), 2) AS max_price
FROM part p
WHERE p_retailprice > (
  SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
GROUP BY p_type
ORDER BY p_type
"""


@register("parts_above_type_avg", _CORR_BODY, tags=("sql", "star"))
def parts_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery; Catalyst decorrelates it into an
    aggregate + join (one scan of part per side, no per-row
    re-execution)."""
    register_views(spark, sf_dir, tables=("part",))
    return spark.sql(_CORR_BODY)


# ---------------------------------------------------------------------------
# RANGE-frame window: per-event trailing 15-minute user activity
# ---------------------------------------------------------------------------

_RANGE_WIN_MS = 15 * 60 * 1000

_RANGEF_BODY = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
),
rated AS (
  SELECT user_id, ms,
         count(*) OVER (PARTITION BY user_id ORDER BY ms
                        RANGE BETWEEN {_RANGE_WIN_MS} PRECEDING
                              AND CURRENT ROW) AS n_15m
  FROM ev
)
SELECT user_id,
       cast(max(n_15m) AS BIGINT) AS peak_15m,
       cast(count(*) AS BIGINT) AS n_events,
       round(avg(cast(n_15m AS DOUBLE)), 4) AS avg_15m
FROM rated
GROUP BY user_id
ORDER BY peak_15m DESC, user_id
LIMIT 20
"""

_RANGEF_SPARK = D.to_spark_sql(
    _RANGEF_BODY,
    ("epoch_ms(ts)", "unix_millis(cast(ts AS TIMESTAMP))"),
)


@register("trailing_rate_range_frame", _RANGEF_BODY, tags=("sql-surface",))
def trailing_rate_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window aggregation — the frame type the ROWS-frame
    queries (`daily_moving_avg`'s 7 ROWS) cannot substitute when rows
    are irregularly spaced: each event's trailing count includes every
    event of the same user within 15 MINUTES, however many rows that
    is. Census: the 20 users with the highest 15-minute burst (the
    rate-limiter / bot-detection primitive). Frame bounds are integer
    epoch-ms offsets, so both engines resolve the identical window.

    Scale notes (100 TB): the window partitions by user_id (the
    bucketing key) and orders by time within the partition — state is
    one frame per user, never global; the rollup tail is bounded by
    the user count and the top-20 is a TakeOrderedAndProject."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_RANGEF_SPARK)
