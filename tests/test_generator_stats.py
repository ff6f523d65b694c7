"""Generator distribution checks (SURVEY.md §5.2: chi-square sanity)
and churn/cohort structure."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from realtime_event_streaming_spark.sources.clickgen import (
    COUNTRIES,
    DEVICES,
    PAGES,
    generate_clicks,
)


def _chi_square(observed: Counter, expected_weights, n: int) -> float:
    total_w = sum(w for _, w in expected_weights)
    chi = 0.0
    for value, w in expected_weights:
        exp = n * w / total_w
        obs = observed.get(value, 0)
        chi += (obs - exp) ** 2 / exp
    return chi


@pytest.mark.parametrize(
    "column,weights,crit",
    [
        ("page", PAGES, 29.6),  # chi2 df=10, p=0.001
        ("country", COUNTRIES, 24.3),  # df=7, p=0.001
        ("device", DEVICES, 13.8),  # df=2, p=0.001
    ],
)
def test_weighted_distributions_chi_square(spark, column, weights, crit):
    rows = generate_clicks(spark, n_events=20000, n_users=1000).select(column).collect()
    observed = Counter(r[0] for r in rows)
    chi = _chi_square(observed, weights, 20000)
    assert chi < crit, f"{column} distribution off: chi2={chi:.1f} (crit {crit})"


def test_churn_creates_multiple_cohorts(spark):
    # ~6 weeks of events with 4-week churn structure
    clicks = generate_clicks(
        spark, n_events=30000, n_users=600, rate_per_sec=0.008, churn_weeks=4
    )
    ev = clicks.withColumn("ts", F.timestamp_millis("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    cohorts = firsts.select("cohort_week").distinct().count()
    assert cohorts >= 3, f"expected staggered cohorts, got {cohorts}"
    # determinism preserved under churn
    a = generate_clicks(spark, 2000, 100, 1.0, churn_weeks=3).orderBy("_seq").collect()
    b = generate_clicks(spark, 2000, 100, 1.0, churn_weeks=3).orderBy("_seq").collect()
    assert a == b
