"""Behavioral analytics: per-group top-k and gap-based sessionization.

Extensions a click-stream analyst expects beyond the reference corpus
(SURVEY.md §2.5 explicitly notes per-group top-k as the natural
window-function extension; the reference only simulates sessions on the
producer side, produce.py:64-125 — the engine-side reconstruction is
the missing analytical half)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as D
from ..io import register_views
from ..registry import register

# ---------------------------------------------------------------------------
# top event types per country (per-group top-k via window function)
# ---------------------------------------------------------------------------

_TOPK_BODY = f"""
WITH by_ct AS (
  SELECT {D.COUNTRY_SQL} AS country, event_type,
         count(*) AS clicks, count(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY country
            ORDER BY clicks DESC, event_type) AS rnk
  FROM by_ct
)
SELECT country, rnk, event_type, clicks, unique_users
FROM ranked WHERE rnk <= 3
ORDER BY country, rnk
"""


@register("top_types_per_country", _TOPK_BODY, tags=("behavior",))
def top_types_per_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per country: the per-group top-k pattern
    (window row_number over an aggregated frame — the aggregate
    shrinks the data BEFORE the window sort, so the window never sees
    raw events)."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_TOPK_BODY)


# ---------------------------------------------------------------------------
# gap-based sessionization (30-minute inactivity gap)
# ---------------------------------------------------------------------------

_SESS_CTE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR {epoch_ts} - {epoch_prev} > 1800 THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS events_in_session,
         {span} AS session_seconds
  FROM sessions GROUP BY user_id, session_id
)
SELECT count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users,
       round(avg(events_in_session), 4) AS avg_events_per_session,
       round(avg(session_seconds), 4) AS avg_session_seconds,
       max(events_in_session) AS max_events_in_session
FROM per_session
"""

_SESS_SPARK = _SESS_CTE.format(
    epoch_ts=D.EPOCH_S_SPARK.format(col="ts"),
    epoch_prev=D.EPOCH_S_SPARK.format(col="prev_ts"),
    span=(
        D.EPOCH_S_SPARK.format(col="max(ts)")
        + " - "
        + D.EPOCH_S_SPARK.format(col="min(ts)")
    ),
)

_SESS_DUCK = _SESS_CTE.format(
    epoch_ts=D.EPOCH_S_DUCK.format(col="ts"),
    epoch_prev=D.EPOCH_S_DUCK.format(col="prev_ts"),
    span=(
        D.EPOCH_S_DUCK.format(col="max(ts)")
        + " - "
        + D.EPOCH_S_DUCK.format(col="min(ts)")
    ),
)


_COHORT_CTE = """
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         {week_diff} AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT {fmt_cohort} AS cohort_week,
       week_offset,
       count(*) AS active_users
FROM activity
WHERE week_offset <= 4
GROUP BY 1, week_offset
ORDER BY cohort_week, week_offset
"""

_WD_SPARK = (
    "cast(("
    + D.EPOCH_S_SPARK.format(col="date_trunc('week', e.ts)")
    + " - "
    + D.EPOCH_S_SPARK.format(col="f.cohort_week")
    + ") / 604800 AS INT)"
)
_WD_DUCK = (
    "cast(("
    + D.EPOCH_S_DUCK.format(col="date_trunc('week', e.ts)")
    + " - "
    + D.EPOCH_S_DUCK.format(col="f.cohort_week")
    + ") / 604800 AS INT)"
)

_COHORT_SPARK = _COHORT_CTE.format(
    week_diff=_WD_SPARK, fmt_cohort=D.fmt_ts_spark("cohort_week")
)
_COHORT_DUCK = _COHORT_CTE.format(
    week_diff=_WD_DUCK, fmt_cohort=D.fmt_ts_duck("cohort_week")
)


@register("weekly_retention_cohorts", _COHORT_DUCK, tags=("behavior",))
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted per subsequent active week offset. First-touch
    reduction + self-join back to activity — the standard cohort shape;
    the join is co-partitioned on user_id with the group-by that
    precedes it."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_COHORT_SPARK)


@register("user_sessions", _SESS_DUCK, tags=("behavior",))
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag per user ->
    new-session flag -> running sum as session id -> per-session then
    corpus-level stats. One shuffle by user_id serves both window
    passes (same partitioning). The streaming analogue is Spark's
    built-in session_window; this is the batch/backfill path."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_SESS_SPARK)


# ---------------------------------------------------------------------------
# concurrent-session peaks (sweep line over session intervals)
# ---------------------------------------------------------------------------

_CONC_CTE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR {epoch_ts} - {epoch_prev} > 1800 THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
spans AS (
  SELECT user_id, session_id,
         min({epoch_ts}) AS s, max({epoch_ts}) + 1 AS e
  FROM sessions GROUP BY user_id, session_id
),
edges AS (
  SELECT s AS t, 1 AS d FROM spans
  UNION ALL
  SELECT e AS t, -1 AS d FROM spans
),
net AS (SELECT t, cast(sum(d) AS BIGINT) AS nd FROM edges GROUP BY t),
timeline AS (
  SELECT t, sum(nd) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrency
  FROM net
)
SELECT cast(t AS BIGINT) AS epoch_s, cast(concurrency AS BIGINT) AS concurrency
FROM timeline
ORDER BY concurrency DESC, epoch_s
LIMIT 20
"""

_CONC_SPARK = _CONC_CTE.format(
    epoch_ts=D.EPOCH_S_SPARK.format(col="ts"),
    epoch_prev=D.EPOCH_S_SPARK.format(col="prev_ts"),
)
_CONC_DUCK = _CONC_CTE.format(
    epoch_ts=D.EPOCH_S_DUCK.format(col="ts"),
    epoch_prev=D.EPOCH_S_DUCK.format(col="prev_ts"),
)


@register("concurrent_session_peaks", _CONC_DUCK, tags=("behavior", "temporal"))
def concurrent_session_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions: sessionize (same 30-min gap rule as
    `user_sessions`), convert each session to +1/-1 edges at its
    half-open [start, end+1s) bounds, and sweep — a running sum over
    net edge weights per distinct second. Concurrency is exact at
    every change point with 2 rows per session, never a time-grid x
    interval explode. Equal-timestamp edges net out BEFORE the sweep
    (group-by t), so the cumulative sum needs no tiebreak.

    Scale notes: the sweep's global ordered window runs over ~2 rows
    per session — fine to millions of sessions on one partition; at
    warehouse scale, partition the sweep by day after carrying in each
    day's opening concurrency (a two-pass prefix-sum, same plan shape
    per partition)."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_CONC_SPARK)


# ---------------------------------------------------------------------------
# robust (median/MAD) outlier census — the Hampel filter shape
# ---------------------------------------------------------------------------

#: Hampel threshold: |x - median| > _MAD_K * (1.4826 * MAD). 1.4826
#: scales MAD to sigma-equivalent under normality.
_MAD_K = 3.0

_MAD_BODY = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, med.med,
         abs(e.value - med.med) AS ad
  FROM events e JOIN med ON e.event_type = med.event_type
  WHERE e.value IS NOT NULL
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT dev.event_type,
       cast(count(*) AS BIGINT) AS n_rows,
       round(max(dev.med), 4) AS median_value,
       round(max(mad.mad), 4) AS mad_value,
       cast(sum(CASE WHEN dev.ad > {_MAD_K} * 1.4826 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
ORDER BY dev.event_type
"""

_MAD_SPARK = D.to_spark_sql(
    _MAD_BODY,
    ("quantile_cont(value, 0.5)", "percentile(value, 0.5)"),
    ("quantile_cont(ad, 0.5)", "percentile(ad, 0.5)"),
)


@register("robust_mad_outliers", _MAD_BODY, tags=("anomaly",))
def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_MAD_SPARK)
robust_mad_outliers.__doc__ = """Robust outlier census per event type — the Hampel filter
    (median + MAD) that the z-score detectors (`anomaly_zscore_batch`,
    the streaming Welford state) cannot replace when the contamination
    itself inflates the mean/stddev: median and MAD have a 50%
    breakdown point vs 0% for the moment estimators. Flags values
    with |x - median| > {k} * 1.4826 * MAD. Exact interpolated medians
    on both engines (Spark `percentile` == DuckDB `quantile_cont`,
    the `latency_stats` precedent).

    Scale notes (100 TB): two grouped exact medians = two shuffles on
    the (bounded-cardinality) event_type key; at true 100 TB the exact
    median swaps for the mergeable histogram sketch
    (`histogram_quantile_rollup`) with identical downstream algebra —
    the census shape is unchanged. The median/MAD tables are
    K-row broadcasts into the scan-side join.""".format(k=_MAD_K)


# ---------------------------------------------------------------------------
# user-path transition mining (event-type Markov bigrams)
# ---------------------------------------------------------------------------

_TRANS_BODY = """
WITH ordered AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (SELECT prev_type, sum(n) AS tn FROM trans GROUP BY prev_type)
SELECT trans.prev_type, trans.next_type,
       cast(trans.n AS BIGINT) AS n_transitions,
       round(cast(trans.n AS DOUBLE) / tot.tn, 4) AS p_next
FROM trans JOIN tot ON trans.prev_type = tot.prev_type
ORDER BY trans.prev_type, trans.next_type
"""


@register("event_transition_matrix", _TRANS_BODY, tags=("behavior",))
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag() per user in (ts, event_id) order — the
    deterministic total order both engines share — then transition
    counts and row-normalized probabilities. The user-journey mining
    primitive behind funnel discovery (where `view_purchase_conversions`
    checks ONE known path, this surfaces ALL paths and their odds).

    Scale notes (100 TB): the lag window partitions by user_id
    (bounded by events-per-user — the natural key the raw table is
    already bucketed on in `write_bucketed_table`); the transition
    rollup is |event_types|^2 rows. No corpus-wide window, no skew
    beyond the bot-user case the diagnostics cover."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_TRANS_BODY)


# ---------------------------------------------------------------------------
# offline CUSUM change-point estimation per day
# ---------------------------------------------------------------------------

_CUSUM_BODY = """
WITH minutes AS (
  SELECT date_trunc('day', ts) AS day,
         date_trunc('minute', ts) AS minute,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT day, round(avg(cast(cnt AS DOUBLE)), 4) AS day_mean
  FROM minutes GROUP BY day
),
cum AS (
  SELECT m.day, m.minute, m.cnt,
         sum(cast(m.cnt AS DOUBLE) - s.day_mean)
           OVER (PARTITION BY m.day ORDER BY m.minute) AS s_i
  FROM minutes m JOIN stats s ON m.day = s.day
),
peak AS (
  SELECT day, minute, s_i,
         row_number() OVER (PARTITION BY day
                            ORDER BY round(abs(s_i), 4) DESC, minute)
           AS rn,
         max(s_i) OVER (PARTITION BY day) AS s_max,
         min(s_i) OVER (PARTITION BY day) AS s_min
  FROM cum
),
cp AS (
  SELECT day, minute AS change_minute,
         round(s_max - s_min, 4) AS cusum_range
  FROM peak WHERE rn = 1
),
sides AS (
  SELECT c.day, cp.change_minute, cp.cusum_range,
         round(avg(CASE WHEN c.minute <= cp.change_minute
                        THEN cast(c.cnt AS DOUBLE) END), 4) AS mean_before,
         round(avg(CASE WHEN c.minute > cp.change_minute
                        THEN cast(c.cnt AS DOUBLE) END), 4) AS mean_after,
         cast(count(*) AS BIGINT) AS n_minutes
  FROM cum c JOIN cp ON c.day = cp.day
  GROUP BY c.day, cp.change_minute, cp.cusum_range
)
SELECT cast(day AS DATE) AS day, n_minutes, change_minute,
       cusum_range, mean_before, mean_after
FROM sides ORDER BY day
"""


@register("cusum_change_points", _CUSUM_BODY, tags=("anomaly",))
def cusum_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM change-point estimation per day: S_i = running
    sum of (minute count - day mean); the estimated change minute is
    argmax |S_i| (the classic CUSUM estimator) and the CUSUM range
    max(S)-min(S) is the shift-evidence statistic; before/after means
    quantify the level shift. Where the Welford/z detectors flag
    SINGLE anomalous windows, this locates a SUSTAINED level change —
    the deploy-went-wrong signal.

    Deterministic: the running sum folds 4dp-rounded deviations in
    minute order inside a day partition (same order both engines);
    the argmax tie-breaks on (rounded |S|, minute).

    Scale notes (100 TB): everything is keyed by day — the cumulative
    window is partition-bounded at 1440 rows, the rollup emits one row
    per day. The minute pre-aggregation is the only corpus-sized
    shuffle (shared shape with every rollup query)."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_CUSUM_BODY)


# ---------------------------------------------------------------------------
# SLO burn-rate (multiwindow) over the value measure
# ---------------------------------------------------------------------------

_SLO_BAD = 80.0   # value above this breaches the latency SLO
_SLO_TARGET = 0.95  # 95% of events must be under _SLO_BAD

_BURN_BODY = f"""
WITH hours AS (
  SELECT date_trunc('hour', ts) AS hour,
         count(*) AS n,
         sum(CASE WHEN value > {_SLO_BAD} THEN 1 ELSE 0 END) AS bad
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
-- 4dp fractions via INTEGER half-up rounding: these are exact
-- integer ratios, which DO land on decimal midpoints (163/800 =
-- .20375) where double round() differs across engines; f4 =
-- floor((2*bad*10^4 + n) / (2*n)) is midpoint-free by construction.
rates AS (
  SELECT hour, n, bad,
         (2 * bad * 10000 + n) // (2 * n) AS f4_1h,
         (2 * sum(bad) OVER w6 * 10000 + sum(n) OVER w6)
           // (2 * sum(n) OVER w6) AS f4_6h
  FROM hours
  WINDOW w6 AS (ORDER BY hour ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT hour,
       cast(n AS BIGINT) AS n_events,
       cast(f4_1h AS DOUBLE) / 10000 AS bad_frac_1h,
       cast(f4_6h AS DOUBLE) / 10000 AS bad_frac_6h,
       round(cast(f4_1h AS DOUBLE) / {int((1 - _SLO_TARGET) * 10000)}, 4)
         AS burn_1h,
       round(cast(f4_6h AS DOUBLE) / {int((1 - _SLO_TARGET) * 10000)}, 4)
         AS burn_6h,
       CASE WHEN f4_1h > {int((1 - _SLO_TARGET) * 10000)}
             AND f4_6h > {int((1 - _SLO_TARGET) * 10000)}
            THEN 1 ELSE 0 END AS page_alert
FROM rates ORDER BY hour
"""


_BURN_SPARK = D.to_spark_sql(_BURN_BODY, ("//", "div"))


@register("slo_burn_rate", _BURN_BODY, tags=("anomaly", "reference"))
def slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_BURN_SPARK)
slo_burn_rate.__doc__ = """Multiwindow SLO burn rate (the SRE-workbook alerting shape the
    reference's Grafana/Prometheus stack would carry): per hour, the
    fraction of events breaching value > {bad} over the 1-hour and
    trailing-6-hour windows, each divided by the {eb:.0%} error budget;
    page when BOTH windows burn above 1x — the fast window gives
    reaction speed, the slow window suppresses blips. Pure integer
    counts into rational divisions: bit-deterministic.

    Scale notes (100 TB): one scan -> hour-keyed partial counts; the
    6-hour lookback is a 6-row ROWS frame over the tiny hourly series.
    Burn-rate alerting costs nothing more than the rollup the
    dashboard already maintains.""".format(bad=_SLO_BAD, eb=1 - _SLO_TARGET)


# ---------------------------------------------------------------------------
# top-k turnover: day-over-day churn of the heavy-hitter set
# ---------------------------------------------------------------------------

_TURNOVER_K = 10

_TURN_BODY = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, user_id, count(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT day, user_id,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, user_id) AS rn
  FROM daily
),
topk AS (SELECT day, user_id FROM ranked WHERE rn <= {_TURNOVER_K}),
days AS (SELECT DISTINCT day FROM topk),
pairs AS (
  SELECT d.day,
         (SELECT count(*) FROM topk a JOIN topk b
           ON a.user_id = b.user_id
          AND a.day = d.day - INTERVAL 1 DAY AND b.day = d.day) AS kept
  FROM days d
  WHERE EXISTS (SELECT 1 FROM topk p
                WHERE p.day = d.day - INTERVAL 1 DAY)
)
SELECT cast(day AS DATE) AS day,
       cast(kept AS BIGINT) AS kept,
       cast({_TURNOVER_K} - kept AS BIGINT) AS churned,
       round(cast(kept AS DOUBLE) / {_TURNOVER_K}, 4) AS stability
FROM pairs ORDER BY day
"""


@register("topk_turnover_daily", _TURN_BODY, tags=("behavior",))
def topk_turnover_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_TURN_BODY)
topk_turnover_daily.__doc__ = """Day-over-day churn of the top-{k} heaviest users: how much of
    yesterday's heavy-hitter set survives into today (kept / churned /
    stability). A stable set is organic load; sudden full turnover is
    a bot cohort or an instrumentation change — the drift twin of
    `cms_heavy_hitters`' point-in-time view.

    Scale notes (100 TB): per-day top-k comes from a day-partitioned
    window over the (day, user) rollup; the day-to-day comparison
    joins two {k}-row sets per day. Nothing beyond the rollup is
    corpus-sized.""".format(k=_TURNOVER_K)


# ---------------------------------------------------------------------------
# tail-latency trend: OLS slope of hourly p95
# ---------------------------------------------------------------------------

_P95_TREND_BODY = """
WITH hours AS (
  SELECT date_trunc('hour', ts) AS hour,
         round(quantile_cont(value, 0.95), 4) AS p95
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT p95,
         row_number() OVER (ORDER BY hour) - 1 AS h_idx
  FROM hours
)
SELECT cast(count(*) AS BIGINT) AS n_hours,
       round(min(p95), 4) AS min_p95,
       round(max(p95), 4) AS max_p95,
       round(regr_slope(p95, cast(h_idx AS DOUBLE)), 4) + 0
         AS p95_slope_per_hour,
       round(regr_r2(p95, cast(h_idx AS DOUBLE)), 4) AS r2
FROM idx
"""

_P95_TREND_SPARK = D.to_spark_sql(
    _P95_TREND_BODY,
    ("quantile_cont(value, 0.95)", "percentile(value, 0.95)"),
)


@register("p95_trend", _P95_TREND_BODY, tags=("anomaly", "reference"))
def p95_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is tail latency degrading? OLS slope of the hourly p95 series
    over hour index (native regr_slope/regr_r2, the
    `dup_cluster_powerlaw` precedent) — the capacity-planning trend
    the point-in-time `latency_stats` can't see. One row: series
    length, p95 range, slope/hour, fit quality.

    Scale notes (100 TB): the exact grouped percentile is the only
    corpus-sized aggregation (hour-keyed; swaps for the mergeable
    histogram sketch at true scale); the regression runs over the
    tiny hourly series."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_P95_TREND_SPARK)


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness trend (sliding exact distinct)
# ---------------------------------------------------------------------------

_WAU_BODY = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u
    ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
  GROUP BY d.day
)
SELECT cast(dau.day AS DATE) AS day,
       cast(dau.dau AS BIGINT) AS dau,
       cast(wau.wau AS BIGINT) AS wau,
       round(cast(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY day
"""


@register("wau_stickiness_trend", _WAU_BODY, tags=("behavior", "reference"))
def wau_stickiness_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU/WAU) per day — the
    product-health trio on every growth dashboard. Sliding EXACT
    distinct cannot ride a window frame (distinct doesn't decompose),
    so the trailing week is a day-to-days interval join over the
    deduplicated (day, user) table — the standard exact form; the
    approximate form merges the per-day HLL sketches
    (`reagg_sketch_hourly`'s algebra) for O(1) per window.

    Scale notes (100 TB): everything downstream of the (day, user)
    dedup is bounded by days x active users; the interval join
    expands each user-day into at most 7 window rows — a constant
    fan-out, shuffled on day."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_WAU_BODY)


# ---------------------------------------------------------------------------
# activity streaks (gaps-and-islands over user-days)
# ---------------------------------------------------------------------------

_STREAK_BODY = """
WITH du AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
grp AS (
  SELECT user_id, day,
         datediff('day', DATE '1970-01-01', day)
         - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
  FROM du
),
streaks AS (
  SELECT user_id, count(*) AS streak_len
  FROM grp GROUP BY user_id, anchor
),
longest AS (
  SELECT user_id, max(streak_len) AS best FROM streaks GROUP BY user_id
)
SELECT cast(best AS BIGINT) AS streak_days,
       cast(count(*) AS BIGINT) AS n_users
FROM longest
GROUP BY best
ORDER BY streak_days
"""


_STREAK_SPARK = D.to_spark_sql(
    _STREAK_BODY,
    ("datediff('day', DATE '1970-01-01', day)",
     "datediff(day, DATE '1970-01-01')"),
)


@register("activity_streak_histogram", _STREAK_BODY, tags=("behavior",))
def activity_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, histogrammed
    — the canonical gaps-and-islands window pattern (consecutive days
    share the day-minus-rank anchor) at user grain; the engagement
    distribution behind streak-based retention features.

    Scale notes (100 TB): the island window partitions by user
    (bounded by active days per user); streak and histogram rollups
    are user- then streak-bounded. One dedup shuffle on (user, day)
    is the only corpus-sized step."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_STREAK_SPARK)


# ---------------------------------------------------------------------------
# market-basket page association (support / confidence / lift)
# ---------------------------------------------------------------------------

#: minimum co-visitor support and the result cut
_LIFT_MIN_USERS = 5
_LIFT_TOPK = 20

_LIFT_BODY = f"""
WITH baskets AS (
  SELECT DISTINCT user_id, {D.PAGE_K_SQL} AS page FROM events
),
nu AS (SELECT cast(count(DISTINCT user_id) AS BIGINT) AS n FROM baskets),
pc AS (
  SELECT page, cast(count(*) AS BIGINT) AS c FROM baskets GROUP BY page
),
pairs AS (
  SELECT a.page AS pa, b.page AS pb,
         cast(count(*) AS BIGINT) AS c_ab
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.page < b.page
  GROUP BY a.page, b.page
),
scored AS (
  SELECT p.pa, p.pb, p.c_ab, ca.c AS c_a, cb.c AS c_b, nu.n,
         (2 * p.c_ab * nu.n * 10000 + ca.c * cb.c)
           {{idiv}} (2 * ca.c * cb.c) AS lift4
  FROM pairs p
  JOIN pc ca ON ca.page = p.pa
  JOIN pc cb ON cb.page = p.pb
  CROSS JOIN nu
  WHERE p.c_ab >= {_LIFT_MIN_USERS}
)
SELECT pa, pb, c_ab,
       cast((2 * c_ab * 10000 + n) {{idiv}} (2 * n) AS DOUBLE) / 10000
         AS support,
       cast((2 * c_ab * 10000 + c_a) {{idiv}} (2 * c_a) AS DOUBLE) / 10000
         AS confidence,
       cast(lift4 AS DOUBLE) / 10000 AS lift
FROM scored
ORDER BY lift4 DESC, pa, pb
LIMIT {_LIFT_TOPK}
"""


@register(
    "page_pair_lift",
    _LIFT_BODY.format(idiv="//"),
    tags=("behavior",),
)
def page_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_LIFT_BODY.format(idiv="div"))
page_pair_lift.__doc__ = """Market-basket association over page co-visits (Agrawal &
    Srikant's support/confidence/lift at the user-basket grain): for
    page pairs co-visited by >= {m} users, support = P(a,b),
    confidence = P(b|a), lift = P(a,b)/(P(a)P(b)) — the
    cross-promotion / related-content signal. The basket-grain
    complement of `token_pmi_topk` (adjacency grain) and
    `event_transition_matrix` (sequence grain); lift is PMI without
    the log, which is WHY it stays an exact integer rational here —
    every metric is an integer half-up 4-dp ratio of exact distinct
    counts, no float ever enters (the top-k cut orders by the integer
    lift itself).

    Scale notes (100 TB): baskets dedupe to one row per (user, page)
    first, so the pair self-join is bounded per user by the SQUARE OF
    DISTINCT PAGES VISITED (page-domain-bounded, 100 here), shuffled
    on user_id — the sessionizer's key; the pair census collapses to
    <= |pages|^2/2 rows; page counts broadcast back. The classic
    a-priori first pass, expressed as joins.

    Integer-range bound: the lift4 numerator 2*c_ab*n*10^4 stays
    BIGINT-exact while c_ab*n < ~4.6e14 — comfortable for any
    single-tenant page domain (c_ab <= n, so it holds up to ~21M
    co-visiting users) but NOT unbounded: past ~2e7 x 2e7 the
    numerator overflows. The scale-out form divides first — lift =
    (c_ab/c_a) * (n/c_b) as two half-up ratios at 1e-2 each — or
    computes lift4 in DuckDB HUGEINT / Spark DECIMAL(38,0); the
    10^4-quantized output algebra is unchanged.""".format(
        m=_LIFT_MIN_USERS
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (the slope twin of the MAD/CUSUM family)
# ---------------------------------------------------------------------------


def _theil_sql(dd: str, idiv: str) -> str:
    return f"""
WITH days AS (
  SELECT {dd} AS x0, cast(count(*) AS BIGINT) AS y
  FROM (SELECT date_trunc('day', ts) AS day FROM events)
  GROUP BY 1
),
mn AS (SELECT min(x0) AS m FROM days),
daily AS (
  SELECT cast(days.x0 - mn.m AS BIGINT) AS x, y FROM days CROSS JOIN mn
),
pairs AS (
  SELECT cast(b.y - a.y AS DOUBLE) / cast(b.x - a.x AS DOUBLE) AS s
  FROM daily a JOIN daily b ON b.x > a.x
),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s) AS rn,
         count(*) OVER () AS np
  FROM pairs
),
med AS (
  SELECT avg(s) AS ts_slope,
         max(np) AS n_pairs
  FROM ranked
  WHERE rn IN ((np + 1) {idiv} 2, (np + 2) {idiv} 2)
),
ols AS (
  SELECT cast(count(*) AS BIGINT) AS n,
         cast(sum(x) AS BIGINT) AS sx,
         cast(sum(y) AS BIGINT) AS sy,
         cast(sum(x * y) AS BIGINT) AS sxy,
         cast(sum(x * x) AS BIGINT) AS sxx
  FROM daily
)
SELECT ols.n AS n_days,
       cast(med.n_pairs AS BIGINT) AS n_pairs,
       med.ts_slope AS ts_slope,
       cast(ols.n * ols.sxy - ols.sx * ols.sy AS DOUBLE)
         / cast(ols.n * ols.sxx - ols.sx * ols.sx AS DOUBLE) AS ols_slope,
       med.ts_slope
         - cast(ols.n * ols.sxy - ols.sx * ols.sy AS DOUBLE)
           / cast(ols.n * ols.sxx - ols.sx * ols.sx AS DOUBLE) AS slope_gap
FROM med CROSS JOIN ols
"""


_THEIL_DUCK = _theil_sql("datediff('day', DATE '1970-01-01', day)", "//")
_THEIL_SPARK = _theil_sql("datediff(day, DATE '1970-01-01')", "div")


@register("theil_sen_trend", _THEIL_DUCK, tags=("anomaly",))
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend over daily event volume — the SLOPE
    member of the robust family (`robust_mad_outliers` = location/
    scale, `cusum_change_points` = level shifts, this = drift): the
    median of all pairwise day-to-day slopes, which tolerates up to
    ~29% corrupted days where the OLS slope (reported beside it, with
    the gap) is dragged by a single outage or backfill spike. The
    pre-alert for slow capacity drift that per-day z-scores miss.

    Determinism: every pairwise slope is ONE IEEE division of exact
    integer deltas (x re-indexed from the corpus's first day, so all
    intermediates are small integers); the median picks the middle
    value(s) by row_number with an averaging step that is exact IEEE
    add/divide; the OLS slope is one division of exact BIGINT
    moment sums — no round() anywhere, both engines emit identical
    doubles.

    Scale notes (100 TB): the corpus collapses to one row per DAY
    before anything pairwise happens, so the O(days^2) slope set is
    ~500k pairs for a 1000-day warehouse — a single-partition sort at
    worst; the production variant medians per-week slopes or samples
    pairs (Siegel) at identical plan shape. One corpus scan total."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_THEIL_SPARK)


# ---------------------------------------------------------------------------
# second-order path mining (event-type trigrams, session-bounded)
# ---------------------------------------------------------------------------

_PATH3_TOPK = 20

_PATH3_BODY = f"""
WITH ordered AS (
  SELECT user_id, event_type, ts,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3,
         lead({{ep}}, 2) OVER w - {{ep}} AS span_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type AS t1, t2, t3, count(*) AS n,
         count(DISTINCT user_id) AS n_users
  FROM ordered
  WHERE t3 IS NOT NULL AND span_s <= 1800
  GROUP BY event_type, t2, t3
)
SELECT t1, t2, t3,
       cast(n AS BIGINT) AS n_paths,
       cast(n_users AS BIGINT) AS n_users
FROM paths
ORDER BY n DESC, t1, t2, t3
LIMIT {_PATH3_TOPK}
"""


@register(
    "path_trigrams_topk",
    _PATH3_BODY.format(ep=D.EPOCH_S_DUCK.format(col="ts")),
    tags=("behavior",),
)
def path_trigrams_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(
        _PATH3_BODY.format(ep=D.EPOCH_S_SPARK.format(col="ts"))
    )
path_trigrams_topk.__doc__ = """Top-{k} three-step user paths (event-type trigrams whose three
    steps fall within a 30-minute span — the sessionization bound of
    `user_sessions`, applied windowless via the lead-offset epoch
    delta): the second-order extension of `event_transition_matrix`
    (first-order Markov bigrams) that exposes the multi-step journeys
    funnel design starts from — `funnel_three_step` measures ONE
    chosen path; this query DISCOVERS which paths are worth
    measuring.

    Scale notes (100 TB): one shuffle on user_id (the sessionizer's
    key) for the lead window, then a group-by bounded by the
    event-type domain CUBED (5^3 here); the top-k cut is
    TakeOrderedAndProject. Exact counts, deterministic
    (count, path) tie order — no float anywhere.""".format(
        k=_PATH3_TOPK
    )
