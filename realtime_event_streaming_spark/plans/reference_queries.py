"""The reference's analytical query corpus, rebuilt on Spark.

Reference surface covered here (SURVEY.md §2.2-§2.10, batch side):
``sql/metrics_queries.sql:4-67`` (6 monitoring queries),
``MONITORING_SETUP.md:113-160`` (4 BI queries),
``superset/README.md:121-144`` (2 dashboard queries), the
``recent_activity`` view (``sql/clickhouse_tables.sql:88-99``), the MV
rollup (``:75-85``) and the two orphan rollup tables (``:40-72``), plus
a batch analogue of the Flink anomaly detector
(``StreamJob.java:130-191``).

All queries run over the driver's ``events`` table (stand-in for
``rt.clicks_raw``; see functions/dialect.py for derived dimensions).
"Now"-relative predicates use a scalar subquery ``(SELECT max(ts) FROM
events)`` instead of the wall clock so results are deterministic at any
scale factor — the Catalyst plan is identical to the wall-clock variant
(a literal after subquery execution, so partition pruning still
applies).

Scale notes (100 TB): every query here is a scan -> partial agg ->
shuffle-on-group-keys -> final agg. Group-key cardinality is bounded
(minutes x small dims), so the shuffle is tiny relative to the scan; the
scan itself prunes month partitions via the time predicates when the
fact table is written with io.write_events_table's layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as D
from ..io import load_table, register_views
from ..registry import register

MAXTS = "(SELECT max(ts) FROM events)"


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# R1 — events-per-minute throughput (reference: sql/metrics_queries.sql:4-12)
# ---------------------------------------------------------------------------

_R1_SPARK = f"""
SELECT {D.fmt_ts_spark("date_trunc('minute', ts)")} AS minute,
       count(*) AS events_per_minute,
       count(DISTINCT user_id) AS unique_users
FROM events
WHERE ts >= {MAXTS} - INTERVAL 1 HOUR
GROUP BY 1
ORDER BY minute DESC
"""

_R1_DUCK = f"""
SELECT {D.fmt_ts_duck("date_trunc('minute', ts)")} AS minute,
       count(*) AS events_per_minute,
       count(DISTINCT user_id) AS unique_users
FROM events
WHERE ts >= {MAXTS} - INTERVAL 1 HOUR
GROUP BY 1
ORDER BY minute DESC
"""


@register("throughput_per_minute", _R1_DUCK, headline=True, tags=("reference",))
def throughput_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute event rate + exact distinct users over the last hour
    of data (reference: sql/metrics_queries.sql:4-12; operators A1, A2,
    F1, P4, O1)."""
    return _sql(spark, sf_dir, _R1_SPARK)


# ---------------------------------------------------------------------------
# R2 — value/latency distribution stats (reference: sql/metrics_queries.sql:14-22
#      — avg / quantile(0.95) / quantile(0.99) / max of e2e latency; A3-A5)
# ---------------------------------------------------------------------------

_R2_SPARK = """
SELECT event_type,
       count(*) AS cnt,
       round(avg(value), 4) AS avg_value,
       round(percentile(value, 0.95), 4) AS p95_value,
       round(percentile(value, 0.99), 4) AS p99_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

_R2_DUCK = """
SELECT event_type,
       count(*) AS cnt,
       round(avg(value), 4) AS avg_value,
       round(quantile_cont(value, 0.95), 4) AS p95_value,
       round(quantile_cont(value, 0.99), 4) AS p99_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("latency_stats", _R2_DUCK, headline=True, tags=("reference",))
def latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats per event_type — the reference's end-to-end
    latency query shape (avg/p95/p99/max; metrics_queries.sql:14-22)
    over the fixture's `value` measure. Exact interpolated percentiles
    on both engines (Spark `percentile` == DuckDB `quantile_cont`)."""
    return _sql(spark, sf_dir, _R2_SPARK)


# ---------------------------------------------------------------------------
# R3 — data freshness / span (reference: sql/metrics_queries.sql:33-40; F14)
# ---------------------------------------------------------------------------

_R3_SPARK = f"""
SELECT {D.fmt_ts_spark('min(ts)')} AS first_event,
       {D.fmt_ts_spark('max(ts)')} AS last_event,
       {D.EPOCH_S_SPARK.format(col='max(ts)')} - {D.EPOCH_S_SPARK.format(col='min(ts)')} AS span_seconds,
       count(*) AS total_events
FROM events
"""

_R3_DUCK = f"""
SELECT {D.fmt_ts_duck('min(ts)')} AS first_event,
       {D.fmt_ts_duck('max(ts)')} AS last_event,
       {D.EPOCH_S_DUCK.format(col='max(ts)')} - {D.EPOCH_S_DUCK.format(col='min(ts)')} AS span_seconds,
       count(*) AS total_events
FROM events
"""


@register("data_freshness", _R3_DUCK, tags=("reference",))
def data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max event time and data span — the reference's freshness
    check (metrics_queries.sql:33-40; operators A5, F14)."""
    return _sql(spark, sf_dir, _R3_SPARK)


# ---------------------------------------------------------------------------
# R4 — pipeline health: raw vs rollup reconciliation via UNION ALL
#      (reference: sql/metrics_queries.sql:42-57; U1)
# ---------------------------------------------------------------------------

_R4_SPARK = f"""
WITH span AS (SELECT max(ts) AS mx FROM events),
raw AS (
  SELECT 'events_raw' AS table_name,
         count(*) AS row_cnt,
         count(*) AS event_sum
  FROM events, span WHERE ts >= mx - INTERVAL 5 MINUTE
),
agg AS (
  SELECT 'page_minute_agg' AS table_name,
         count(*) AS row_cnt,
         cast(coalesce(sum(cnt), 0) AS BIGINT) AS event_sum
  FROM (
    SELECT date_trunc('minute', ts) AS m, event_type, count(*) AS cnt
    FROM events, span WHERE ts >= mx - INTERVAL 5 MINUTE
    GROUP BY 1, 2
  )
)
SELECT * FROM raw UNION ALL SELECT * FROM agg
"""

_R4_DUCK = f"""
WITH span AS (SELECT max(ts) AS mx FROM events),
raw AS (
  SELECT 'events_raw' AS table_name,
         count(*) AS row_cnt,
         count(*) AS event_sum
  FROM events, span WHERE ts >= mx - INTERVAL 5 MINUTE
),
agg AS (
  SELECT 'page_minute_agg' AS table_name,
         count(*) AS row_cnt,
         cast(coalesce(sum(cnt), 0) AS BIGINT) AS event_sum
  FROM (
    SELECT date_trunc('minute', ts) AS m, event_type, count(*) AS cnt
    FROM events, span WHERE ts >= mx - INTERVAL 5 MINUTE
    GROUP BY 1, 2
  )
)
SELECT * FROM raw UNION ALL SELECT * FROM agg
"""


@register("pipeline_health", _R4_DUCK, tags=("reference",))
def pipeline_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-event count vs minute-rollup sum over the same 5-minute span
    — the reference's pipeline-consistency check
    (metrics_queries.sql:42-57, UNION ALL at :50)."""
    return _sql(spark, sf_dir, _R4_SPARK)


# ---------------------------------------------------------------------------
# R5 — throughput summary with derived rates
#      (reference: sql/metrics_queries.sql:59-67; A7, A2)
# ---------------------------------------------------------------------------

_R5_BODY = f"""
SELECT count(*) AS total_events,
       round(cast(count(*) AS DOUBLE) / 5, 4) AS events_per_minute,
       round(cast(count(*) AS DOUBLE) / 300, 4) AS events_per_second,
       count(DISTINCT user_id) AS unique_users,
       count(DISTINCT {D.PAGE_K_SQL}) AS unique_pages,
       count(DISTINCT {D.COUNTRY_SQL}) AS unique_countries
FROM events
WHERE ts >= {MAXTS} - INTERVAL 5 MINUTE
"""

_R5_SPARK = _R5_BODY
_R5_DUCK = _R5_BODY


@register("throughput_summary", _R5_DUCK, tags=("reference",))
def throughput_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute throughput summary with per-minute/per-second rates and
    multi-column distincts (metrics_queries.sql:59-67)."""
    return _sql(spark, sf_dir, _R5_SPARK)


# ---------------------------------------------------------------------------
# R5b — rows-per-minute ingest growth (reference: metrics_queries.sql:24-31)
# ---------------------------------------------------------------------------

_R5B_SPARK = f"""
SELECT {D.fmt_ts_spark("date_trunc('minute', ts)")} AS minute,
       count(*) AS rows_inserted
FROM events
WHERE ts >= {MAXTS} - INTERVAL 10 MINUTE
GROUP BY 1
ORDER BY minute DESC
"""

_R5B_DUCK = f"""
SELECT {D.fmt_ts_duck("date_trunc('minute', ts)")} AS minute,
       count(*) AS rows_inserted
FROM events
WHERE ts >= {MAXTS} - INTERVAL 10 MINUTE
GROUP BY 1
ORDER BY minute DESC
"""


@register("rows_per_minute", _R5B_DUCK, tags=("reference",))
def rows_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest growth: rows per minute over the last 10 minutes
    (metrics_queries.sql:24-31)."""
    return _sql(spark, sf_dir, _R5B_SPARK)


# ---------------------------------------------------------------------------
# R5c — per-page activity, last 5 minutes (reference: superset/README.md:112-120)
# ---------------------------------------------------------------------------

_R5C_BODY = f"""
SELECT {D.PAGE_K_SQL} AS page_k,
       count(*) AS events,
       count(DISTINCT user_id) AS unique_users
FROM events
WHERE ts >= {MAXTS} - INTERVAL 5 MINUTE
  AND {D.PAGE_K_SQL} IS NOT NULL
GROUP BY 1
ORDER BY events DESC, page_k
"""


@register("page_activity_5min", _R5C_BODY, tags=("reference",))
def page_activity_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page events + users over the last 5 minutes — the Superset
    real-time metrics chart (superset/README.md:112-120)."""
    return _sql(spark, sf_dir, _R5C_BODY)


# ---------------------------------------------------------------------------
# R6 — geographic breakdown with conditional AVG
#      (reference: MONITORING_SETUP.md:125-133 and :136-146; P5/F7)
# ---------------------------------------------------------------------------

_R6_BODY = f"""
SELECT {D.COUNTRY_SQL} AS country,
       count(*) AS clicks,
       count(DISTINCT user_id) AS unique_users,
       round(avg(CASE WHEN event_type = 'view' THEN 0 ELSE 1 END), 4)
         AS engaged_ratio
FROM events
GROUP BY 1
ORDER BY clicks DESC, country
"""


@register("geo_breakdown", _R6_BODY, headline=True, tags=("reference",))
def geo_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-country clicks / users / conditional-avg ratio (reference:
    MONITORING_SETUP.md:136-146 — `AVG(if(referrer='/',0,1))`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.expr(D.COUNTRY_SQL).alias("country"))
        .agg(
            F.count("*").alias("clicks"),
            F.countDistinct("user_id").alias("unique_users"),
            F.round(
                F.avg(F.when(F.col("event_type") == "view", 0).otherwise(1)), 4
            ).alias("engaged_ratio"),
        )
        .orderBy(F.desc("clicks"), "country")
    )


# ---------------------------------------------------------------------------
# R7 — device breakdown with share-of-total (reference:
#      MONITORING_SETUP.md:149-159; window-fn share is our extension)
# ---------------------------------------------------------------------------

_R7_BODY = f"""
SELECT {D.DEVICE_SQL} AS device,
       count(*) AS clicks,
       count(DISTINCT user_id) AS unique_users,
       count(DISTINCT {D.PAGE_K_SQL}) AS pages_visited,
       round(count(*) / cast(sum(count(*)) OVER () AS DOUBLE), 4) AS share
FROM events
GROUP BY 1
ORDER BY clicks DESC, device
"""


@register("device_breakdown", _R7_BODY, tags=("reference",))
def device_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-device clicks / users / share-of-total
    (MONITORING_SETUP.md:149-159)."""
    return _sql(spark, sf_dir, _R7_BODY)


# ---------------------------------------------------------------------------
# R8 — top-k pages by clicks (reference: superset/README.md:121-131; O2, F8)
# ---------------------------------------------------------------------------

_R8_BODY = f"""
SELECT {D.PAGE_K_SQL} AS page_k,
       count(*) AS clicks,
       count(DISTINCT user_id) AS unique_users
FROM events
WHERE {D.PAGE_K_SQL} IS NOT NULL
GROUP BY 1
ORDER BY clicks DESC, page_k
LIMIT 10
"""


@register("top_pages", _R8_BODY, headline=True, tags=("reference",))
def top_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 page ids (extracted from the JSON props column) by click
    count (superset/README.md:121-131; JSON parse surface
    StreamJob.java:219,234). Spark plans TakeOrderedAndProject — no full
    sort at scale. Deterministic tiebreak on page_k."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr(D.PAGE_K_SQL)  # shared snippet == the oracle's expression
    return (
        ev.select(k.alias("page_k"), "user_id")
        .where(F.col("page_k").isNotNull())
        .groupBy("page_k")
        .agg(
            F.count("*").alias("clicks"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy(F.desc("clicks"), "page_k")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# R9 — minute rollup = the ClickHouse MV / Flink window agg, batch form
#      (reference: clickhouse_tables.sql:75-85, StreamJob.java:95-125)
# ---------------------------------------------------------------------------

_R9_SPARK = f"""
SELECT {D.fmt_ts_spark("date_trunc('minute', ts)")} AS window_start,
       {D.fmt_ts_spark("date_trunc('minute', ts) + INTERVAL 1 MINUTE")} AS window_end,
       event_type,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY date_trunc('minute', ts), event_type
"""

_R9_DUCK = f"""
SELECT {D.fmt_ts_duck("date_trunc('minute', ts)")} AS window_start,
       {D.fmt_ts_duck("date_trunc('minute', ts) + INTERVAL 1 MINUTE")} AS window_end,
       event_type,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY date_trunc('minute', ts), event_type
"""


@register("minute_rollup", _R9_DUCK, headline=True, tags=("reference",))
def minute_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute x event_type rollup with exact distinct users — the
    batch form of `page_minute_agg` (clickhouse_tables.sql:23-37,
    MV :75-85; Flink window StreamJob.java:95-125, exact HashSet
    distinct :102-108)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.date_trunc("minute", F.col("ts"))
    return ev.groupBy(
        F.date_format(w, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format(w + F.expr("INTERVAL 1 MINUTE"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_end"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("unique_users"),
    )


# ---------------------------------------------------------------------------
# R10 — 5-minute rollup (orphan table rt.page_5min_agg,
#       clickhouse_tables.sql:40-54 — has no writer in the reference;
#       we implement the intended rollup)
# ---------------------------------------------------------------------------

_b5s = D.BUCKET5M_SPARK.format(ts="ts")
_b5d = D.BUCKET5M_DUCK.format(ts="ts")

_R10_SPARK = f"""
SELECT {D.fmt_ts_spark(_b5s)} AS window_start,
       {D.fmt_ts_spark(_b5s + " + INTERVAL 5 MINUTE")} AS window_end,
       event_type,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users,
       count(DISTINCT {D.PAGE_K_SQL}) AS unique_pages
FROM events
GROUP BY {_b5s}, event_type
"""

_R10_DUCK = f"""
SELECT {D.fmt_ts_duck(_b5d)} AS window_start,
       {D.fmt_ts_duck(_b5d + " + INTERVAL 5 MINUTE")} AS window_end,
       event_type,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users,
       count(DISTINCT {D.PAGE_K_SQL}) AS unique_pages
FROM events
GROUP BY {_b5d}, event_type
"""


@register("rollup_5min", _R10_DUCK, tags=("reference",))
def rollup_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute rollup with a second distinct dimension (the orphan
    `page_5min_agg` table's intent: clickhouse_tables.sql:40-54 incl.
    `unique_countries` analog). Bucket via explicit epoch arithmetic so
    both engines align identically."""
    return _sql(spark, sf_dir, _R10_SPARK)


# ---------------------------------------------------------------------------
# R11 — hourly rollup by (event_type, device) (orphan table
#       rt.page_hourly_agg, clickhouse_tables.sql:57-72)
# ---------------------------------------------------------------------------

_R11_SPARK = f"""
SELECT {D.fmt_ts_spark("date_trunc('hour', ts)")} AS window_start,
       event_type,
       {D.DEVICE_SQL} AS device,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY date_trunc('hour', ts), event_type, 3
"""

_R11_DUCK = f"""
SELECT {D.fmt_ts_duck("date_trunc('hour', ts)")} AS window_start,
       event_type,
       {D.DEVICE_SQL} AS device,
       count(*) AS cnt,
       count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY date_trunc('hour', ts), event_type, 3
"""


@register("rollup_hourly", _R11_DUCK, headline=True, tags=("reference",))
def rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly x (event_type, device) rollup — the orphan
    `page_hourly_agg` table's intent (clickhouse_tables.sql:57-72)."""
    return _sql(spark, sf_dir, _R11_SPARK)


# ---------------------------------------------------------------------------
# R12 — recent_activity view (reference: clickhouse_tables.sql:88-99)
# ---------------------------------------------------------------------------

_R12_SPARK = f"""
SELECT event_type,
       count(*) AS total_clicks,
       count(DISTINCT user_id) AS unique_users,
       {D.fmt_ts_spark('max(ts)')} AS last_seen
FROM events
WHERE ts >= {MAXTS} - INTERVAL 24 HOUR
GROUP BY event_type
ORDER BY total_clicks DESC, event_type
"""

_R12_DUCK = f"""
SELECT event_type,
       count(*) AS total_clicks,
       count(DISTINCT user_id) AS unique_users,
       {D.fmt_ts_duck('max(ts)')} AS last_seen
FROM events
WHERE ts >= {MAXTS} - INTERVAL 24 HOUR
GROUP BY event_type
ORDER BY total_clicks DESC, event_type
"""


@register("recent_activity", _R12_DUCK, tags=("reference",))
def recent_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-24h rollup with max(ts) last_seen — the reference's
    `recent_activity` view (clickhouse_tables.sql:88-99)."""
    return _sql(spark, sf_dir, _R12_SPARK)


# ---------------------------------------------------------------------------
# R13 — re-aggregation over the minute rollup (SummingMergeTree read
#       semantics; reference: superset/README.md:135-144, A6)
# ---------------------------------------------------------------------------

_R13_BODY = """
SELECT event_type,
       cast(sum(cnt) AS BIGINT) AS total_events,
       cast(sum(unique_users) AS BIGINT) AS sum_unique_users,
       count(*) AS minutes
FROM (
  SELECT date_trunc('minute', ts) AS m, event_type,
         count(*) AS cnt, count(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1, 2
)
GROUP BY event_type
ORDER BY event_type
"""


@register("reagg_from_minute", _R13_BODY, tags=("reference",))
def reagg_from_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side re-aggregation over the minute pre-aggregate — exactly
    how the reference reads its SummingMergeTree
    (superset/README.md:135-144). `sum_unique_users` deliberately
    preserves the reference's sum-of-distincts semantics (NOT a true
    distinct union — flagged in SURVEY.md §2.4/A6)."""
    return _sql(spark, sf_dir, _R13_BODY)


# ---------------------------------------------------------------------------
# R13b — rollup cascade: coarser grains from the finer pre-aggregate
# ---------------------------------------------------------------------------

_b5m = "make_timestamp((epoch_us(m) // 300000000) * 300000000)"
_b5m_spark = (
    "timestamp_micros((unix_micros(cast(m as timestamp)) div 300000000)"
    " * 300000000)"
)

_CASCADE_SPARK = f"""
WITH minute_agg AS (
  SELECT date_trunc('minute', ts) AS m, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT {D.fmt_ts_spark(_b5m_spark)} AS window_start,
       event_type,
       cast(sum(cnt) AS BIGINT) AS cnt
FROM minute_agg
GROUP BY {_b5m_spark}, event_type
"""

_CASCADE_DUCK = f"""
WITH minute_agg AS (
  SELECT date_trunc('minute', ts) AS m, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT {D.fmt_ts_duck(_b5m)} AS window_start,
       event_type,
       cast(sum(cnt) AS BIGINT) AS cnt
FROM minute_agg
GROUP BY {_b5m}, event_type
"""


@register("rollup_cascade_5min", _CASCADE_DUCK, tags=("reference",))
def rollup_cascade_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute counts derived from the 1-minute pre-aggregate instead
    of raw events — the rollup-cascade pattern that makes coarser
    grains nearly free at scale (input is the minute table, ~1000x
    smaller than the facts). Counts are additive so the cascade is
    exact; distinct users are NOT additive and must come from raw or a
    sketch-merge (documented limit of SummingMergeTree-style cascades,
    SURVEY.md §2.4/A6)."""
    return _sql(spark, sf_dir, _CASCADE_SPARK)


# ---------------------------------------------------------------------------
# R14 — daily growth with running total (reference:
#       MONITORING_SETUP.md:113-121 shape, cumulative sum as extension)
# ---------------------------------------------------------------------------

_R14_SPARK = """
WITH daily AS (
  SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
         count(*) AS cnt,
         count(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1
)
SELECT day, cnt, unique_users,
       cast(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS running_total
FROM daily ORDER BY day
"""

_R14_DUCK = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS cnt,
         count(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1
)
SELECT day, cnt, unique_users,
       cast(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS running_total
FROM daily ORDER BY day
"""


@register("event_growth_daily", _R14_DUCK, tags=("reference",))
def event_growth_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume + running cumulative total
    (MONITORING_SETUP.md:113-121 shape; window aggregate)."""
    return _sql(spark, sf_dir, _R14_SPARK)


# ---------------------------------------------------------------------------
# R15 — batch z-score anomaly detection (reference: StreamJob.java:130-191 —
#       Welford running mean/variance per key, |z| > 2.5 after >= 5 obs)
# ---------------------------------------------------------------------------

_R15_SPARK = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT h, event_type, cnt,
         avg(cnt) OVER w AS mean_prev,
         stddev_samp(cnt) OVER w AS sd_prev,
         count(*) OVER w AS n_prev
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT date_format(h, 'yyyy-MM-dd HH:mm:ss') AS window_start,
       event_type, cnt,
       round((cnt - mean_prev) / sd_prev, 4) AS z_score,
       round(mean_prev, 4) AS running_mean,
       n_prev AS n_observations
FROM stats
WHERE n_prev >= 5 AND sd_prev > 0
  AND abs((cnt - mean_prev) / sd_prev) > 2.5
ORDER BY window_start, event_type
"""

_R15_DUCK = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT h, event_type, cnt,
         avg(cnt) OVER w AS mean_prev,
         stddev_samp(cnt) OVER w AS sd_prev,
         count(*) OVER w AS n_prev
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, cnt,
       round((cnt - mean_prev) / sd_prev, 4) AS z_score,
       round(mean_prev, 4) AS running_mean,
       n_prev AS n_observations
FROM stats
WHERE n_prev >= 5 AND sd_prev > 0
  AND abs((cnt - mean_prev) / sd_prev) > 2.5
ORDER BY window_start, event_type
"""


@register("anomaly_zscore_batch", _R15_DUCK, headline=True, tags=("reference",))
def anomaly_zscore_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of the Flink Welford anomaly detector
    (StreamJob.java:160-186: running mean/variance per key, flag when
    |z| > 2.5 with >= 5 prior observations). The running stats over all
    preceding windows are expressed as frame-bounded window aggregates —
    mathematically identical to the Welford recurrence. The streaming
    form lives in streaming/anomaly_stream.py."""
    return _sql(spark, sf_dir, _R15_SPARK)
