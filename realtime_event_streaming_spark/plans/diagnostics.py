"""Shuffle-health diagnostics: join-key skew census.

At 100 TB the thing that kills a shuffle join is not size but SKEW —
one hot key serializing a single reducer while 999 executors idle.
The standard mitigations (AQE skew-join splitting, salting — this
repo's ``functions/skew.salted_join``) need a NUMBER: how hot is the
hottest key relative to the typical one, and how many salt shards
flatten it. This query computes that number from the data, the way a
pipeline operator would before choosing a join strategy.

Output: the top heavy keys with their share of all rows, plus the
global skew profile — p99 per-key count, max/avg skew factor, and the
recommended salt fan-out ``ceil(max_cnt / p99_cnt)`` (shards needed so
the hottest key's shard is no larger than a p99 key). Single scan +
per-key agg; the stats row is a broadcast 1-row cross join (the same
pattern as source_mix_weights). Exact interpolated percentile on both
engines (Spark ``percentile`` == DuckDB ``quantile_cont``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

_TOPK = 10

_SKEW_DUCK = f"""
WITH per_key AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
stats AS (
  SELECT count(*) AS n_keys,
         sum(cnt) AS n_rows,
         max(cnt) AS max_cnt,
         quantile_cont(cnt, 0.99) AS p99_cnt,
         avg(cnt) AS avg_cnt
  FROM per_key
)
SELECT k.user_id, k.cnt,
       round(cast(k.cnt AS DOUBLE) / s.n_rows, 4) AS share,
       s.n_keys,
       round(s.p99_cnt, 4) AS p99_cnt,
       round(s.max_cnt / s.avg_cnt, 4) AS skew_factor,
       cast(ceil(s.max_cnt / s.p99_cnt) AS BIGINT) AS recommended_salt
FROM per_key k, stats s
ORDER BY k.cnt DESC, k.user_id LIMIT {_TOPK}
"""


@register("join_skew_diagnostics", _SKEW_DUCK, tags=("diagnostics",))
def join_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOPK} heaviest join keys + global skew profile for the
    events->user enrichment join key. recommended_salt is the fan-out
    ``functions/skew.salted_join`` should use so the hottest key's
    largest shard shrinks to a p99-typical reducer input."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    stats = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("_p99"),
        F.avg("cnt").alias("_avg"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_rows"), 4).alias(
                "share"
            ),
            "n_keys",
            F.round(F.col("_p99"), 4).alias("p99_cnt"),
            F.round(F.col("max_cnt") / F.col("_avg"), 4).alias("skew_factor"),
            F.ceil(F.col("max_cnt") / F.col("_p99"))
            .cast("bigint")
            .alias("recommended_salt"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_TOPK)
    )


# ---------------------------------------------------------------------------
# salted join, proven end-to-end against the plain-join oracle
# ---------------------------------------------------------------------------

_SALT = 8

_SALTED_DUCK = """
WITH dim AS (
  SELECT DISTINCT user_id, user_id % 5 AS tier FROM events
)
SELECT d.tier,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       round(sum(e.value), 4) AS total_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.tier ORDER BY d.tier
"""


@register("salted_user_enrich", _SALTED_DUCK, tags=("diagnostics",))
def salted_user_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact->dimension enrichment executed through ``skew.salted_join``
    (left side salted {_SALT} ways, dimension replicated), aggregated
    per tier. The DuckDB oracle runs the PLAIN join — so the driver's
    value-hash compare proves salting is result-invariant, end-to-end,
    on real data (complementing the plan-level equivalence test in
    test_plan_properties.py). This is the mitigation
    ``join_skew_diagnostics`` sizes: when AQE can't split a hot key
    (broadcast-ineligible dim), scatter it across {_SALT} reducers."""
    from ..functions.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.col("user_id") % 5)
    )
    joined = salted_join(ev, dim, "user_id", salt=_SALT)
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("tier")
    )
