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
