"""Bucketed co-located joins: the shuffle-free fact-fact join path.

At 100 TB the orders⋈lineitem shuffle is the dominant cost of every
order-grain query; bucketing both tables by the order key removes it
entirely. This test proves the plan property, not just the result:
the bucketed join must contain NO shuffle exchange.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from realtime_event_streaming_spark.io import load_table, write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    spark.sql("CREATE DATABASE IF NOT EXISTS buck")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed_table(
        orders, spark, "buck.orders_b", "o_orderkey", 8, str(d / "o")
    )
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        spark,
        "buck.lineitem_b",
        "o_orderkey",
        8,
        str(d / "l"),
    )
    yield spark.table("buck.orders_b"), spark.table("buck.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS buck.orders_b")
    spark.sql("DROP TABLE IF EXISTS buck.lineitem_b")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, li_b = bucketed
    # Disable broadcast to force the join strategy bucketing serves.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = orders_b.join(li_b, "o_orderkey").groupBy("o_orderstatus").agg(
            F.sum("l_extendedprice").alias("rev")
        )
        plan = _plan(j)
        joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert joins, "expected a shuffle-strategy join node"
        # the join inputs must read bucketed data with no exchange
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]
        # result correctness vs unbucketed
        plain = (
            load_table(spark, "/root/testdata/sf0.001", "orders")
            .join(
                load_table(spark, "/root/testdata/sf0.001", "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        got = {r.o_orderstatus: round(r.rev, 2) for r in j.collect()}
        want = {r.o_orderstatus: round(r.rev, 2) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
