"""Welford online mean/variance — the anomaly detector's state math.

Reference semantics (StreamJob.java:130-191): per (page, country) key,
maintain running count/mean/M2 over successive window counts via
Welford's algorithm (:160-170); flag |z| > 2.5 once >= 5 observations
exist (:175,:178); the current observation is scored against the stats
of the *prior* observations, then folded in.

This module is the pure function shared by:
- the streaming operator (streaming/anomaly_stream.py, keyed state), and
- unit tests comparing against numpy (tests/test_anomaly.py).

The batch/SQL equivalent is `anomaly_zscore_batch` in
plans/reference_queries.py (frame-bounded window aggregates — the same
recurrence in closed form).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

Z_THRESHOLD = 2.5
MIN_OBSERVATIONS = 5


@dataclass
class WelfordState:
    n: int = 0
    mean: float = 0.0
    m2: float = 0.0

    def update(self, x: float) -> None:
        """Fold one observation in (Welford recurrence)."""
        self.n += 1
        delta = x - self.mean
        self.mean += delta / self.n
        self.m2 += delta * (x - self.mean)

    @property
    def variance(self) -> float:
        """Sample variance (n-1 denominator), 0 while n < 2."""
        return self.m2 / (self.n - 1) if self.n > 1 else 0.0

    @property
    def stddev(self) -> float:
        return math.sqrt(self.variance)

    def score(self, x: float) -> tuple[bool, float, str]:
        """Score ``x`` against the current (prior) stats WITHOUT
        folding it in. Returns (is_anomaly, z, reason)."""
        if self.n < MIN_OBSERVATIONS:
            return False, 0.0, "insufficient-history"
        sd = self.stddev
        if sd <= 0.0:
            return False, 0.0, "zero-variance"
        z = (x - self.mean) / sd
        if abs(z) > Z_THRESHOLD:
            direction = "spike" if z > 0 else "drop"
            return True, z, f"{direction}: z={z:.2f} vs mean={self.mean:.2f}"
        return False, z, "normal"
