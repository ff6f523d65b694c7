#!/usr/bin/env python
"""Measure AQE's skew-join rescue against manual salting at sf1 scale.

Synthesizes a skewed fact table (default 20 M rows, ~30 % of them on
one hot user — the shape `join_skew_diagnostics` exists to detect)
joined to a broadcast-ineligible 200 k-row dimension, and times three
executions of the same per-tier aggregation:

- ``aqe_off``: plain sort-merge join, skew rescue disabled — the
  serialized-hot-reducer baseline;
- ``aqe_skew``: plain join with ``spark.sql.adaptive.skewJoin``
  splitting the hot partition (the executed plan is asserted to carry
  ``skew=true``);
- ``salted``: ``functions/skew.salted_join`` 8-way — the explicit
  mitigation for cases AQE can't rescue.

All three must produce identical per-tier results (asserted). Prints
one JSON line; the numbers land in PERF.md's skew section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from realtime_event_streaming_spark.functions.skew import salted_join  # noqa: E402
from realtime_event_streaming_spark.session import get_spark  # noqa: E402

N_ROWS = int(os.environ.get("SKEW_ROWS", 20_000_000))
N_USERS = 200_000
HOT_FRAC_NUM, HOT_FRAC_DEN = 3, 10  # 30% of rows on the hot key
FACT = "/tmp/rtes_skew_fact"
REPS = 3

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def build_fact(spark):
    if os.path.isdir(FACT):
        shutil.rmtree(FACT)
    (
        spark.range(N_ROWS)
        .select(
            F.when(
                F.col("id") % HOT_FRAC_DEN < HOT_FRAC_NUM, F.lit(7)
            )
            .otherwise(F.pmod(F.hash("id"), F.lit(N_USERS)))
            .alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        .write.mode("overwrite")
        .parquet(FACT)
    )


def run(spark, mode: str):
    fact = spark.read.parquet(FACT)
    dim = spark.range(N_USERS).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("tier")
    )
    if mode == "salted":
        joined = salted_join(fact, dim, "user_id", salt=8)
    else:
        joined = fact.join(dim, "user_id")
    agg = joined.groupBy("tier").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")
    )
    t0 = time.time()
    rows = sorted(map(tuple, agg.collect()))
    wall = time.time() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return wall, rows, plan


def main():
    spark = get_spark("aqe-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_fact(spark)
    out: dict[str, float] = {}
    results = {}
    for mode, skew_on in (("aqe_off", False), ("aqe_skew", True), ("salted", True)):
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_on else "false",
        )
        walls = []
        for _ in range(REPS):
            wall, rows, plan = run(spark, mode)
            walls.append(wall)
        results[mode] = rows
        out[mode] = round(sorted(walls)[len(walls) // 2], 2)
        if mode == "aqe_skew":
            assert "skew=true" in plan, "AQE did not mark the join skewed"
    assert results["aqe_off"] == results["aqe_skew"] == results["salted"]
    out["rows"] = N_ROWS
    out["skew_marked"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
