"""Funnel / conversion analytics (batch form, oracle-gated).

The batch counterpart of streaming/enrich.py's stream-stream interval
join: event-to-event joins bounded by a time window, the shape behind
every conversion, attribution and retention query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import dialect as D
from ..io import register_views
from ..registry import register
from ..streaming.enrich import CONVERSION_WINDOW

# '10 minutes' -> 'INTERVAL 10 MINUTE' (valid in both dialects); one
# constant ties the batch funnel to its streaming twin.
_WINDOW_INTERVAL = "INTERVAL " + CONVERSION_WINDOW.rstrip("s").upper()

_CONV_CTE = """
WITH views AS (
  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
),
purchases AS (
  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT v.user_id, v.v_ts, min(p.p_ts) AS first_purchase_ts
  FROM views v JOIN purchases p
    ON p.user_id = v.user_id
   AND p.p_ts > v.v_ts
   AND p.p_ts <= v.v_ts + {interval}
  GROUP BY v.user_id, v.v_ts
)
SELECT count(*) AS conversions,
       count(DISTINCT user_id) AS converting_users,
       round(avg({gap}), 4) AS avg_seconds_to_purchase
FROM conv
"""

_CONV_SPARK = _CONV_CTE.format(
    interval=_WINDOW_INTERVAL,
    gap=(
        D.EPOCH_S_SPARK.format(col="first_purchase_ts")
        + " - "
        + D.EPOCH_S_SPARK.format(col="v_ts")
    )
)
_CONV_DUCK = _CONV_CTE.format(
    interval=_WINDOW_INTERVAL,
    gap=(
        D.EPOCH_S_DUCK.format(col="first_purchase_ts")
        + " - "
        + D.EPOCH_S_DUCK.format(col="v_ts")
    )
)


@register("view_purchase_conversions", _CONV_DUCK, tags=("behavior",))
def view_purchase_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View -> first purchase within 10 minutes, per (user, view):
    time-bounded event join + earliest-match reduction, summarized.
    The interval predicate keeps the join linear-ish (each view matches
    only the few purchases in its window); the streaming twin
    (streaming/enrich.py) runs the same join with watermarked state."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_CONV_SPARK)


# ---------------------------------------------------------------------------
# multi-touch time-decay attribution
# ---------------------------------------------------------------------------

#: attribution window and the decay: weight = 1 / (1 + minutes-before)
#: — a RATIONAL decay chosen over exp(-dt/tau) deliberately: both
#: engines compute it as one integer-derived division (bit-identical),
#: where libm exp() may differ in the last ulp across platforms.
_ATTR_WINDOW_MS = 30 * 60 * 1000

_ATTR_BODY = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
),
touch AS (
  SELECT p.event_id AS pid, t.event_type AS touch_type,
         (p.ms - t.ms) // 60000 AS mins
  FROM ev p JOIN ev t
    ON t.user_id = p.user_id
   AND t.ms < p.ms AND p.ms - t.ms <= {_ATTR_WINDOW_MS}
  WHERE p.event_type = 'purchase'
    AND t.event_type IN ('view', 'click')
),
w AS (
  SELECT pid, touch_type,
         cast(1 AS DOUBLE) / (1 + mins) AS w
  FROM touch
),
norm AS (
  SELECT pid, touch_type,
         w / sum(w) OVER (PARTITION BY pid) AS share
  FROM w
)
SELECT touch_type,
       cast(count(*) AS BIGINT) AS n_touches,
       cast(count(DISTINCT pid) AS BIGINT) AS n_purchases,
       round(sum(share), 4) AS total_credit,
       round(avg(share), 4) AS avg_share
FROM norm
GROUP BY touch_type
ORDER BY touch_type
"""

_ATTR_SPARK = D.to_spark_sql(
    _ATTR_BODY,
    ("epoch_ms(ts)", "unix_millis(cast(ts AS TIMESTAMP))"),
    ("(p.ms - t.ms) // 60000", "(p.ms - t.ms) div 60000"),
)


@register("time_decay_attribution", _ATTR_BODY, tags=("behavior",))
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch time-decay attribution: every view/click by the
    same user in the 30 minutes before a purchase earns credit
    1/(1+minutes-before), normalized so each purchase distributes
    exactly 1.0 of credit across its touches; rolled up per touch
    type. The last-touch/first-touch single-winner models are
    degenerate cases of this shape; the decay is rational (not
    exp()) so both engines compute bit-identical weights — see
    _ATTR_WINDOW_MS note.

    Scale notes (100 TB): the touch join is equi-keyed on user_id
    with a pushed time-band predicate — each purchase matches only
    its own user's recent events (skew-safe unless one user is a bot,
    which `join_skew_diagnostics` exists to catch); the per-purchase
    normalization window partitions by purchase id, bounded by
    touches-per-purchase. Rollup is 2 rows out."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_ATTR_SPARK)


# ---------------------------------------------------------------------------
# 3-step strict-order funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

_F3_WINDOW_MS = 30 * 60 * 1000

_F3_BODY = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
),
v AS (SELECT event_id AS vid, user_id, ms AS vms FROM ev
      WHERE event_type = 'view'),
step2 AS (
  SELECT v.vid, v.user_id, v.vms, min(c.ms) AS cms
  FROM v JOIN ev c
    ON c.user_id = v.user_id AND c.event_type = 'click'
   AND c.ms > v.vms AND c.ms <= v.vms + {_F3_WINDOW_MS}
  GROUP BY v.vid, v.user_id, v.vms
),
step3 AS (
  SELECT s.vid, min(p.ms) AS pms, max(s.vms) AS vms
  FROM step2 s JOIN ev p
    ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND p.ms > s.cms AND p.ms <= s.vms + {_F3_WINDOW_MS}
  GROUP BY s.vid
),
counts AS (
  SELECT (SELECT count(*) FROM v) AS n_views,
         (SELECT count(*) FROM step2) AS n_clicked,
         (SELECT count(*) FROM step3) AS n_purchased,
         (SELECT avg(cast((pms - vms) // 60000 AS DOUBLE)) FROM step3)
           AS avg_mins_to_purchase
)
SELECT cast(n_views AS BIGINT) AS n_views,
       cast(n_clicked AS BIGINT) AS n_clicked,
       cast(n_purchased AS BIGINT) AS n_purchased,
       round(cast(n_clicked AS DOUBLE) / n_views, 4) AS rate_clicked,
       round(cast(n_purchased AS DOUBLE) / n_views, 4) AS rate_purchased,
       round(avg_mins_to_purchase, 4) AS avg_mins_to_purchase
FROM counts
"""

_F3_SPARK = D.to_spark_sql(
    _F3_BODY,
    ("epoch_ms(ts)", "unix_millis(cast(ts AS TIMESTAMP))"),
    ("(pms - vms) // 60000", "(pms - vms) div 60000"),
)


@register("funnel_three_step", _F3_BODY, tags=("behavior",))
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 3-step funnel: view -> first subsequent click ->
    first purchase AFTER that click, all inside 30 minutes of the
    view. The ordering constraint (purchase must follow the CLICK,
    not just the view) is what separates funnel analysis from plain
    co-occurrence — `view_purchase_conversions` is the 2-step
    degenerate case. One summary row: step counts, conversion rates,
    mean minutes-to-purchase (integer minute grain).

    Scale notes (100 TB): both step joins are user-keyed equi-joins
    with pushed time bands (each view matches only its user's events
    in a 30-minute slice); the min() reductions keep state one row
    per funnel entry. The scalar-subquery tail is a 1-row gather —
    the same bounded pattern as `throughput_summary`."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_F3_SPARK)


# ---------------------------------------------------------------------------
# attribution model comparison (first / last / time-decay side-by-side)
# ---------------------------------------------------------------------------

_ATTRCMP_BODY = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
),
touch AS (
  SELECT p.event_id AS pid, t.event_type AS touch_type, t.ms,
         (p.ms - t.ms) // 60000 AS mins
  FROM ev p JOIN ev t
    ON t.user_id = p.user_id
   AND t.ms < p.ms AND p.ms - t.ms <= {_ATTR_WINDOW_MS}
  WHERE p.event_type = 'purchase'
    AND t.event_type IN ('view', 'click')
),
marked AS (
  SELECT pid, touch_type, mins,
         row_number() OVER (PARTITION BY pid ORDER BY ms, touch_type)
           AS rn_first,
         row_number() OVER (PARTITION BY pid ORDER BY ms DESC, touch_type)
           AS rn_last,
         cast(1 AS DOUBLE) / (1 + mins) AS w
  FROM touch
),
scored AS (
  SELECT pid, touch_type,
         CASE WHEN rn_first = 1 THEN cast(1 AS DOUBLE)
              ELSE cast(0 AS DOUBLE) END AS credit_first,
         CASE WHEN rn_last = 1 THEN cast(1 AS DOUBLE)
              ELSE cast(0 AS DOUBLE) END AS credit_last,
         w / sum(w) OVER (PARTITION BY pid) AS credit_decay
  FROM marked
)
SELECT touch_type,
       round(sum(credit_first), 4) AS first_touch,
       round(sum(credit_last), 4) AS last_touch,
       round(sum(credit_decay), 4) AS time_decay
FROM scored
GROUP BY touch_type
ORDER BY touch_type
"""

_ATTRCMP_SPARK = D.to_spark_sql(
    _ATTRCMP_BODY,
    ("epoch_ms(ts)", "unix_millis(cast(ts AS TIMESTAMP))"),
    ("(p.ms - t.ms) // 60000", "(p.ms - t.ms) div 60000"),
)


@register("attribution_model_compare", _ATTRCMP_BODY, tags=("behavior",))
def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three attribution models over the identical touch set, side by
    side: first-touch (the earliest view/click gets the whole credit),
    last-touch (the latest does), and the rational time-decay shares
    of `time_decay_attribution` — per touch type, each column summing
    to the same purchase total, so the table directly shows HOW MUCH
    the model choice moves budget between channels (the argument every
    marketing-analytics meeting has). Single/first/last winners via
    deterministic (ms, type)-ordered row_numbers.

    Scale notes (100 TB): identical join/window shape to the decay
    query — one user-keyed touch join, per-purchase windows; the
    three models are three expressions over the SAME shuffles, which
    is the point: comparing models costs one plan, not three."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_ATTRCMP_SPARK)


# ---------------------------------------------------------------------------
# time-to-convert distribution (the latency SHAPE behind the funnel avg)
# ---------------------------------------------------------------------------


def _ttc_sql(pct: str, gap: str) -> str:
    return f"""
WITH views AS (
  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
),
purchases AS (
  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT v.user_id, v.v_ts, min(p.p_ts) AS first_purchase_ts
  FROM views v JOIN purchases p
    ON p.user_id = v.user_id
   AND p.p_ts > v.v_ts
   AND p.p_ts <= v.v_ts + {_WINDOW_INTERVAL}
  GROUP BY v.user_id, v.v_ts
),
lat AS (SELECT {gap} AS s FROM conv)
SELECT cast(count(*) AS BIGINT) AS n_conversions,
       round({pct.format(p="0.25")}, 4) AS p25_s,
       round({pct.format(p="0.5")}, 4) AS p50_s,
       round({pct.format(p="0.75")}, 4) AS p75_s,
       round({pct.format(p="0.9")}, 4) AS p90_s,
       cast(max(s) AS BIGINT) AS max_s,
       cast(sum(CASE WHEN s <= 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS within_1min,
       cast(sum(CASE WHEN s <= 300 THEN 1 ELSE 0 END) AS BIGINT)
         AS within_5min
FROM lat
"""


_TTC_DUCK = _ttc_sql(
    "quantile_cont(s, {p})",
    D.EPOCH_S_DUCK.format(col="first_purchase_ts")
    + " - " + D.EPOCH_S_DUCK.format(col="v_ts"),
)
_TTC_SPARK = _ttc_sql(
    "percentile(s, {p})",
    D.EPOCH_S_SPARK.format(col="first_purchase_ts")
    + " - " + D.EPOCH_S_SPARK.format(col="v_ts"),
)


@register("funnel_time_to_convert", _TTC_DUCK, tags=("behavior",))
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTION of view-to-purchase latency — the shape behind
    `view_purchase_conversions`' single average: exact interpolated
    quartiles + p90 (Spark `percentile` == DuckDB `quantile_cont`,
    the `latency_stats` precedent), the max, and SLO-style
    within-1min/-5min counts. The number an on-site merchandiser
    tunes against: a p50 of seconds with a p90 of minutes means the
    average is lying about the typical conversion.

    Scale notes (100 TB): same bounded user-keyed interval join as
    the conversion query (each view matches its user's purchases in
    one window slice), then one global aggregate over the
    conversion-sized latency column — integer seconds, so the
    percentile sort is small and exact."""
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(_TTC_SPARK)
