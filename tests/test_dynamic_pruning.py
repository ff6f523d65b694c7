"""Dynamic partition pruning: a dim-side filter prunes fact partitions
at runtime — the join-time counterpart of the static month pruning,
and a headline 100 TB lever (only the joined months are scanned)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import write_events_table
from realtime_event_streaming_spark.sources.clickgen import generate_clicks


def test_dim_filter_prunes_fact_partitions(spark, tmp_path):
    # fact: ~4 months of events partitioned by month
    clicks = generate_clicks(spark, n_events=100000, n_users=1000, rate_per_sec=0.012)
    ev = clicks.withColumn("ts", F.timestamp_millis("ts"))
    fact_path = str(tmp_path / "fact")
    write_events_table(ev, fact_path)
    fact = spark.read.parquet(fact_path)
    months = [r.month for r in fact.select("month").distinct().collect()]
    assert len(months) >= 3

    # dim: month attributes; filter selects ONE month
    dim = spark.createDataFrame(
        [(m, "peak" if i == 0 else "normal") for i, m in enumerate(sorted(months))],
        "month int, season string",
    )
    joined = fact.join(dim.where(F.col("season") == "peak"), "month").groupBy(
        "page"
    ).count()

    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert re.search(r"dynamicpruning", plan, re.IGNORECASE), (
        "expected a dynamic partition pruning subquery in:\n" + plan[:1500]
    )
    # correctness: equals the statically-filtered aggregate
    peak_month = sorted(months)[0]
    want = (
        fact.where(F.col("month") == peak_month).groupBy("page").count().collect()
    )
    got = joined.drop("season").collect()
    assert {(r.page, r[1]) for r in got} == {(r.page, r[1]) for r in want}
