"""Sketch-family invariants beyond the oracle gate.

The oracle parity test already verifies the accuracy contracts (the
bounded-error flags) at the driver's scale; these tests pin the
properties that make sketches the 100 TB answer:

- mergeability: union of per-minute sketches estimates the SAME value
  as one sketch built directly over the hour (not merely "close to
  exact" — bit-identical estimates, because DataSketches HLL union of
  same-lgK sketches is lossless w.r.t. the register state);
- plan hygiene: no Python boundary, and the hourly merge aggregates
  sketch blobs — its input is the minute pre-aggregate, never a
  re-scan of raw user_ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import load_table
from realtime_event_streaming_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_sketch_union_matches_direct_sketch(spark):
    ev = load_table(spark, SF, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("m"), "event_type"
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    merged = (
        minute.groupBy(F.date_trunc("hour", "m").alias("h"), "event_type")
        .agg(
            F.expr(
                "cast(hll_sketch_estimate(hll_union_agg(sk, false)) as bigint)"
            ).alias("est_merged")
        )
    )
    direct = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.expr(
            "cast(hll_sketch_estimate(hll_sketch_agg(user_id, 14)) as bigint)"
        ).alias("est_direct")
    )
    rows = (
        merged.join(direct, ["h", "event_type"])
        .select("est_merged", "est_direct")
        .collect()
    )
    assert rows, "no hourly groups"
    assert all(r.est_merged == r.est_direct for r in rows)


def test_sketch_queries_stay_jvm_side(spark):
    reg = load_all()
    for name in (
        "approx_distinct_accuracy",
        "approx_quantile_accuracy",
        "reagg_sketch_hourly",
    ):
        plan = reg[name].spark_fn(spark, SF)._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_sketch_rollup_merges_preagg_not_raw(spark):
    """The hourly stage unions sketch blobs from the minute grain; the
    only aggregate that ever sees user_id is the minute hll_sketch_agg
    (and the exact-check branch, which a production rollup drops)."""
    reg = load_all()
    plan = (
        reg["reagg_sketch_hourly"]
        .spark_fn(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "hll_union_agg" in plan
    # the union stage's child aggregate carries the sketch column, so
    # the merge input is the (minute, event_type, sk) pre-aggregate
    assert plan.index("hll_union_agg") < plan.index("hll_sketch_agg")
