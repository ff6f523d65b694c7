"""Streaming joins: stream-static enrichment and stream-stream funnels.

The reference has no joins at all (SURVEY.md §2.8) — its users would
reach for ClickHouse dictionaries (enrichment) or give up (funnels).
Both are native Structured Streaming capabilities:

- stream-static: each micro-batch hash-joins against a (broadcastable)
  dimension snapshot — no state, exact.
- stream-stream interval join: both sides buffered in watermarked
  state; the time-bound predicate lets Spark expire state as the
  watermark advances. This is the conversion-funnel operator.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: conversion window: a purchase within 10 minutes of a view.
CONVERSION_WINDOW = "10 minutes"


def enrich_clicks(events: DataFrame, dim: DataFrame, on: str = "country") -> DataFrame:
    """Stream-static enrichment: attach dimension attributes to each
    event. The static side is broadcast per micro-batch (re-read each
    batch, so slowly-changing dims pick up updates)."""
    return events.join(F.broadcast(dim), on, "left")


def view_purchase_conversions_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: for each `view`-like event, find the
    same user's `purchase`-like events within CONVERSION_WINDOW.

    ``events`` must carry a watermark; both sides derive from it. State
    for each side is expired once the watermark passes the interval
    bound — bounded memory at any stream length.
    """
    views = events.where(F.col("page") != "/checkout").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("page").alias("v_page"),
    )
    purchases = events.where(F.col("page") == "/checkout").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return views.join(
        purchases,
        F.expr(
            f"""
            v_user = p_user AND
            p_ts > v_ts AND
            p_ts <= v_ts + INTERVAL {CONVERSION_WINDOW}
            """
        ),
    ).select(
        "v_user",
        "v_page",
        F.col("v_ts").alias("view_ts"),
        F.col("p_ts").alias("purchase_ts"),
    )
