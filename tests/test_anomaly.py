"""Welford state math vs numpy (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from realtime_event_streaming_spark.operators.anomaly import (
    MIN_OBSERVATIONS,
    WelfordState,
    Z_THRESHOLD,
)


def test_welford_matches_numpy():
    rng = np.random.default_rng(42)
    xs = rng.normal(100, 15, size=500)
    ws = WelfordState()
    for x in xs:
        ws.update(float(x))
    assert ws.n == 500
    assert ws.mean == pytest.approx(float(np.mean(xs)), rel=1e-12)
    assert ws.variance == pytest.approx(float(np.var(xs, ddof=1)), rel=1e-10)


def test_score_requires_history():
    ws = WelfordState()
    for i in range(MIN_OBSERVATIONS - 1):
        is_anom, z, reason = ws.score(1e9)
        assert not is_anom and reason == "insufficient-history"
        ws.update(100.0 + i)
    # 4 observations so far -> still insufficient
    is_anom, _, reason = ws.score(1e9)
    assert not is_anom
    ws.update(104.0)
    # 5 observations -> a wild value must now flag
    is_anom, z, reason = ws.score(1e9)
    assert is_anom and z > Z_THRESHOLD and reason.startswith("spike")


def test_score_zero_variance_guard():
    ws = WelfordState()
    for _ in range(10):
        ws.update(5.0)
    is_anom, z, reason = ws.score(500.0)
    assert not is_anom and reason == "zero-variance"


def test_drop_direction():
    ws = WelfordState()
    for x in (100, 104, 98, 102, 101, 99):
        ws.update(float(x))
    is_anom, z, reason = ws.score(0.0)
    assert is_anom and z < -Z_THRESHOLD and reason.startswith("drop")
