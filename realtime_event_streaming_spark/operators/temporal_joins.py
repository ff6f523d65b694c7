"""Temporal join operators: as-of join and range (interval) join.

Extension surface — the reference has no temporal joins (its only join
is the implicit stream->table append), but any event warehouse needs
them: enrich facts with the latest dimension snapshot at event time
(as-of), and attribute events to overlapping time intervals (range).
Both are implemented in the shape that survives 100 TB, not as naive
theta-joins:

- **As-of** is NOT a join at all in the physical plan: dimension
  snapshots and events are unioned, shuffled ONCE by key, sorted by
  time, and the snapshot value is forward-filled with a running
  ``last(ignorenulls)`` window. Cost = one shuffle of events+snapshots,
  zero join explosion, no per-row probe — the merge-join form every
  dedicated as-of implementation (kdb, QuestDB, DuckDB ASOF) lowers to.
- **Range** join turns the interval predicate into an equi-join: each
  interval is exploded to the fixed-width time buckets it covers
  (bucket width = max interval length, so <= 2 buckets per interval),
  events map to exactly one bucket, and the bucket equi-join is
  refined by the exact range predicate. Catalyst would otherwise plan
  a broadcast nested-loop join — fine for a broadcastable interval
  table, quadratic when both sides are large.

The DuckDB oracles deliberately use the *other* implementation (native
``ASOF JOIN``; plain theta range join), so parity proves the rewrite,
not the plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..registry import register

#: Fixture grids (deterministic, literal — both engines state the same
#: tables). Events span 2024-01-01 .. 2024-01-30.
_T0 = "2024-01-01 00:00:00"
N_SNAPSHOTS = 10  # one tier snapshot per event_type every 3 days
N_WINDOWS = 30  # 24 h windows starting every 18 h -> OVERLAPPING
WINDOW_HOURS = 24
WINDOW_STEP_HOURS = 18
_BUCKET_SECONDS = WINDOW_HOURS * 3600  # bucket width = max interval length


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    fill_cols: tuple[str, ...],
) -> DataFrame:
    """Generic as-of join: attach to each ``left`` row the latest
    ``right`` row with the same ``key`` and ``right_ts <= left_ts``
    (ties included, matching ASOF's ``>=``).

    One shuffle by ``key``, one sort by time — no join. With a
    low-cardinality key the sort parallelism is bounded by the key
    count; at warehouse scale use a composite key (key, coarse time
    range) and replicate boundary snapshots into the next range.
    Returns left columns + ``fill_cols`` (null when no prior snapshot).
    """
    lcols = left.columns
    ev = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"), "*"
    ).withColumn("_is_dim", F.lit(0))
    for c in fill_cols:
        ev = ev.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    dm = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"), *fill_cols
    ).withColumn("_is_dim", F.lit(1))
    for c in lcols:
        if c not in dm.columns:
            dm = dm.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = ev.select(dm.columns).unionByName(dm)
    # Snapshot rows sort BEFORE events at the same timestamp so an
    # event exactly at valid_from picks up the new snapshot (ASOF >=).
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_fill_{c}")
            for c in fill_cols
        ],
    )
    out = filled.where(F.col("_is_dim") == 0).select(
        *lcols, *[F.col(f"_fill_{c}").alias(c) for c in fill_cols]
    )
    return out


def _tier_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dimension-with-history fixture: one pricing tier
    per event_type, re-snapshotted every 3 days from the data's start
    (so every event has a matching snapshot)."""
    types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct()
    )
    return types.crossJoin(
        spark.range(N_SNAPSHOTS).select(F.col("id").alias("k"))
    ).select(
        "event_type",
        F.expr(
            f"timestamp_ntz'{_T0}' + make_dt_interval(k * 3, 0, 0, 0)"
        ).alias("valid_from"),
        F.concat("event_type", F.lit("-T"), F.col("k")).alias("tier"),
    )


_ASOF_DUCK = f"""
WITH types AS (SELECT DISTINCT event_type FROM events),
snaps AS (
  SELECT event_type,
         TIMESTAMP '{_T0}' + k * INTERVAL 3 DAY AS valid_from,
         event_type || '-T' || k AS tier
  FROM types, UNNEST(generate_series(0, {N_SNAPSHOTS - 1})) AS g(k)
),
j AS (
  SELECT e.value, s.tier
  FROM events e ASOF JOIN snaps s
    ON e.event_type = s.event_type AND e.ts >= s.valid_from
)
SELECT tier, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM j GROUP BY tier ORDER BY tier
"""


@register("asof_tier_rollup", _ASOF_DUCK, tags=("join", "temporal"))
def asof_tier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with their at-event-time pricing tier via the
    union + forward-fill as-of join, rolled up per tier. The DuckDB
    oracle uses a NATIVE ``ASOF JOIN`` — parity proves the Spark
    rewrite implements exactly ASOF semantics (latest snapshot with
    valid_from <= ts, ties matching)."""
    events = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    snaps = _tier_snapshots(spark, sf_dir)
    joined = asof_join(
        events,
        snaps,
        key="event_type",
        left_ts="ts",
        right_ts="valid_from",
        fill_cols=("tier",),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("tier")
    )


def _incident_windows(spark: SparkSession) -> DataFrame:
    """Deterministic OVERLAPPING interval fixture: 24 h windows starting
    every 18 h (an event can fall in 1-2 windows — proves the join is a
    true interval join, not a bucketing)."""
    return spark.range(N_WINDOWS).select(
        F.col("id").alias("w_id"),
        F.expr(
            f"timestamp_ntz'{_T0}' + make_dt_interval(0, id * {WINDOW_STEP_HOURS}, 0, 0)"
        ).alias("w_start"),
        F.expr(
            f"timestamp_ntz'{_T0}' + make_dt_interval(0, id * {WINDOW_STEP_HOURS} + {WINDOW_HOURS}, 0, 0)"
        ).alias("w_end"),
    )


def range_join_buckets(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = _BUCKET_SECONDS,
) -> DataFrame:
    """Interval join as bucket-equi-join + exact refine.

    ``bucket_seconds`` must be >= the longest interval, so each
    interval covers at most 2 buckets (explode factor <= 2); each event
    maps to exactly 1 bucket. The shuffle is an equi-join on the bucket
    id — at 100 TB this is a plain hash join, where the naive range
    predicate would be a nested-loop. Timestamps are bucketed via epoch
    seconds (session timezone is pinned UTC, so NTZ->epoch is stable).
    """
    ev = events.withColumn(
        "_b",
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)),
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(start_col)) / F.lit(bucket_seconds)
                ),
                # end is exclusive: an interval ending exactly on a
                # bucket edge does not reach into the next bucket
                F.floor(
                    (F.unix_timestamp(F.col(end_col)) - 1)
                    / F.lit(bucket_seconds)
                ),
            )
        ),
    )
    return ev.join(iv, "_b").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )


_RANGE_DUCK = f"""
WITH wins AS (
  SELECT k AS w_id,
         TIMESTAMP '{_T0}' + k * INTERVAL {WINDOW_STEP_HOURS} HOUR AS w_start,
         TIMESTAMP '{_T0}' + k * INTERVAL {WINDOW_STEP_HOURS} HOUR
           + INTERVAL {WINDOW_HOURS} HOUR AS w_end
  FROM UNNEST(generate_series(0, {N_WINDOWS - 1})) AS g(k)
)
SELECT w_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events e JOIN wins w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w_id ORDER BY w_id
"""


@register("range_join_windows", _RANGE_DUCK, tags=("join", "temporal"))
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events attributed to overlapping 24 h incident windows via the
    bucketed range join, rolled up per window. The oracle states the
    plain theta range join — identical results by construction since
    bucketing is a pure optimization."""
    events = load_table(spark, sf_dir, "events").select("ts", "value")
    joined = range_join_buckets(events, _incident_windows(spark))
    return (
        joined.groupBy("w_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("w_id")
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension merge (dimension-side maintenance for as-of joins)
# ---------------------------------------------------------------------------

#: Deterministic change batch carved from the dimension itself so both
#: engines state identical inputs at every scale factor: every 7th
#: customer gets a segment/balance update, every 13th spawns a brand
#: new customer (negative key — collision-free without a max() scan).
SCD_UPD_MOD = 7
SCD_INS_MOD = 13

_SCD2_DUCK = f"""
WITH dim AS (
  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
  FROM customer
),
upd AS (
  SELECT k, seg || '_V2' AS nseg, round(bal + 100, 2) AS nbal
  FROM dim WHERE k % {SCD_UPD_MOD} = 0
),
merged AS (
  SELECT d.seg, d.bal, 1 AS version,
         CASE WHEN u.k IS NULL THEN 'open' ELSE 'closed' END AS status
  FROM dim d LEFT JOIN upd u USING (k)
  UNION ALL
  SELECT nseg, nbal, 2, 'open' FROM upd
  UNION ALL
  SELECT 'NEWSEG', bal, 1, 'open' FROM dim WHERE k % {SCD_INS_MOD} = 0
)
SELECT seg AS mktsegment,
       cast(version AS INT) AS version,
       status,
       cast(count(*) AS BIGINT) AS n_rows,
       round(sum(bal), 2) AS total_bal
FROM merged
GROUP BY seg, version, status
ORDER BY mktsegment, version, status
"""


@register("scd2_dim_merge", _SCD2_DUCK, tags=("join", "temporal"))
def scd2_dim_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 merge — the maintenance step
    that FEEDS `asof_tier_rollup`'s snapshot side: apply a change
    batch (updates + inserts) to a versioned dimension so every key
    keeps its full history (closed v1 row + open v2 row) instead of
    being overwritten. Census output: per (segment, version, status)
    row counts and balance totals over the post-merge dimension.

    The merge is ONE left join + a map-side explode: each dimension
    row joined against the change batch emits its closed-v1 and
    open-v2 rows when matched, or passes through open-v1 unmatched —
    the exact single-pass shape lakehouse ``MERGE INTO`` lowers to
    (ConditionalInsert over a matched/unmatched join), with inserts
    unioned map-side. The DuckDB oracle deliberately states the
    semantics as three UNION ALL branches (two passes over the dim),
    so the hash match proves the one-pass rewrite.

    Scale notes (100 TB): a real change batch is O(day), tiny vs the
    dimension — Spark broadcasts it and the merge never shuffles the
    dimension at all (map-side join + explode + map-side union); here
    the batch is carved from the dimension itself so the join is
    keyed on c_custkey either way. History grows append-only, and the
    (key, valid_from) layout keeps the as-of union-sort consumers
    co-partitioned."""
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    upd = dim.where(F.col("k") % SCD_UPD_MOD == 0).select(
        "k",
        F.concat(F.col("seg"), F.lit("_V2")).alias("nseg"),
        F.round(F.col("bal") + 100, 2).alias("nbal"),
    )
    j = dim.join(F.broadcast(upd), "k", "left")
    merged = j.select(
        F.explode(
            F.when(
                F.col("nseg").isNotNull(),
                F.expr(
                    "array(struct(seg, bal, 1 as version, "
                    "'closed' as status), "
                    "struct(nseg as seg, nbal as bal, 2 as version, "
                    "'open' as status))"
                ),
            ).otherwise(
                F.expr(
                    "array(struct(seg, bal, 1 as version, "
                    "'open' as status))"
                )
            )
        ).alias("r")
    ).select("r.seg", "r.bal", "r.version", "r.status")
    inserts = dim.where(F.col("k") % SCD_INS_MOD == 0).select(
        F.lit("NEWSEG").alias("seg"),
        F.col("bal"),
        F.lit(1).alias("version"),
        F.lit("open").alias("status"),
    )
    return (
        merged.unionByName(inserts)
        .groupBy("seg", "version", "status")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.sum("bal"), 2).alias("total_bal"),
        )
        .select(
            F.col("seg").alias("mktsegment"),
            F.col("version").cast("int").alias("version"),
            "status",
            "n_rows",
            "total_bal",
        )
        .orderBy("mktsegment", "version", "status")
    )
