#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (the recorded number): FRESH-SESSION-PER-RUN, median-of-3.
The parent process spawns 3 child processes; each child builds its own
SparkSession/JVM, runs every headline query once after a per-query
warm-up collect (JIT/codegen, parquet footer caches), and reports its
per-query wall times. The parent reports the per-query MEDIAN across
the children; `value` is the sum of medians. A fresh JVM per
repetition removes the same-JVM drift (heap growth, JIT state, codegen
cache pressure) that made totals measured mid-session vs end-of-
session differ by ~15% (round-8 PERF notes) — every recorded number
now measures the same cold-start-warmed state the driver's own
invocation sees.

Env knobs:
  SPARK_GRAFT_BENCH_RUNS  repetitions (default 3)
  SPARK_GRAFT_BENCH_MODE  "fresh" (default) | "same-jvm" — same-jvm
      keeps the old in-process loop (1 warm-up + N timed runs per
      query, median); use it for quick iteration, never for recorded
      numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sf(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def run_single(sf_dir: str, timed_runs: int = 1) -> dict[str, float]:
    """One session's pass over the headline queries: per query, one
    warm-up collect then ``timed_runs`` timed collects (median if >1).
    Called in a CHILD process in fresh mode; directly in same-jvm
    mode."""
    from realtime_event_streaming_spark.registry import load_all
    from realtime_event_streaming_spark.session import get_spark

    spark = get_spark("rtes-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    headline = {n: q for n, q in reg.items() if q.headline}
    times: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        q.spark_fn(spark, sf_dir).collect()  # warm-up
        samples = []
        for _ in range(timed_runs):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "fresh")

    if "--single" in sys.argv:
        print(json.dumps(run_single(sf_dir)))
        return

    if mode == "same-jvm":
        times = run_single(sf_dir, timed_runs=n_runs)
    else:
        per_run: list[dict[str, float]] = []
        for _ in range(n_runs):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single"],
                capture_output=True,
                text=True,
                cwd=str(Path(__file__).resolve().parent),
                env=os.environ.copy(),
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(proc.returncode)
            per_run.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        times = {
            name: round(statistics.median(r[name] for r in per_run), 4)
            for name in per_run[0]
        }

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": _sf(sf_dir),
        "mode": f"{mode}-median-{n_runs}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
