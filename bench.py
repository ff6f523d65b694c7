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

STEAL GUARD (round-10): this sandbox suffers episodic hypervisor
CPU-steal windows (identical frozen code measured 42-102 s same-jvm
within one hour — PERF.md round-9 host-noise control). Each child run
therefore records the /proc/stat steal-jiffies delta and 1-min
loadavg around it; a run whose steal RATE (jiffies/sec; 100 Hz x 32
vCPU => 3200/s is fully-stolen, idle baseline ~15/s) exceeds
$SPARK_GRAFT_STEAL_MAX (default 100, ~3% of capacity) is re-run up to
$SPARK_GRAFT_STEAL_RETRIES (default 2) times before being accepted —
a steal episode can only inflate the recorded number, never deflate
it, so retrying-on-steal is conservative. Every accepted run's steal
fields ship in the output JSON (`runs`) so any surviving number
carries its own noise certificate.

Child handoff: the child writes its JSON to a temp file passed via
--out (stdout may carry stray JVM/log4j lines and is only a display
channel); the parent fails loudly with the child's captured output if
the file is missing or unparseable.

Env knobs:
  SPARK_GRAFT_BENCH_RUNS     repetitions (default 3)
  SPARK_GRAFT_BENCH_MODE     "fresh" (default) | "same-jvm" — same-jvm
      keeps the old in-process loop (1 warm-up + N timed runs per
      query, median); use it for quick iteration, never for recorded
      numbers.
  SPARK_GRAFT_STEAL_MAX      steal jiffies/sec above which a run is
      considered episode-contaminated (default 100)
  SPARK_GRAFT_STEAL_RETRIES  bounded re-runs per repetition (default 2)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sf(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def _steal_jiffies() -> int | None:
    """Cumulative steal jiffies from /proc/stat (None off-Linux)."""
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
        return int(first[8])  # user nice sys idle iowait irq sirq STEAL
    except (OSError, IndexError, ValueError):
        return None


def _load1() -> float | None:
    try:
        return os.getloadavg()[0]
    except OSError:
        return None


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


def _spawn_child(sf_dir: str) -> tuple[dict[str, float], dict]:
    """Run one fresh-JVM repetition in a child process; return its
    per-query times plus the steal/load telemetry wrapped around it."""
    with tempfile.NamedTemporaryFile(
        mode="r", suffix=".json", prefix="rtes_bench_", delete=False
    ) as tf:
        out_path = tf.name
    try:
        s0, t0 = _steal_jiffies(), time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             "--out", out_path],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parent),
            env=os.environ.copy(),
        )
        elapsed = time.monotonic() - t0
        s1 = _steal_jiffies()
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(proc.returncode)
        try:
            with open(out_path) as fh:
                times = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            raise SystemExit(
                f"bench child exited 0 but produced no parseable JSON at "
                f"{out_path}: {e}\n--- child stdout (tail) ---\n"
                f"{proc.stdout[-2000:]}\n--- child stderr (tail) ---\n"
                f"{proc.stderr[-2000:]}"
            ) from e
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass
    steal = None if s0 is None or s1 is None else s1 - s0
    meta = {
        "elapsed_sec": round(elapsed, 2),
        "steal_jiffies": steal,
        "steal_per_sec": (
            None if steal is None else round(steal / max(elapsed, 1e-9), 1)
        ),
        "load1": _load1(),
    }
    return times, meta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "fresh")
    steal_max = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "100"))
    steal_retries = int(os.environ.get("SPARK_GRAFT_STEAL_RETRIES", "2"))

    if "--single" in sys.argv:
        times = run_single(sf_dir)
        payload = json.dumps(times)
        if "--out" in sys.argv:
            out_path = sys.argv[sys.argv.index("--out") + 1]
            with open(out_path, "w") as fh:
                fh.write(payload)
        print(payload)
        return

    run_meta: list[dict] = []
    if mode == "same-jvm":
        times = run_single(sf_dir, timed_runs=n_runs)
    else:
        per_run: list[dict[str, float]] = []
        for _ in range(n_runs):
            retries = 0
            while True:
                t, meta = _spawn_child(sf_dir)
                rate = meta["steal_per_sec"]
                if (
                    rate is not None
                    and rate > steal_max
                    and retries < steal_retries
                ):
                    retries += 1
                    sys.stderr.write(
                        f"bench: steal episode ({rate} jiffies/s > "
                        f"{steal_max}) — re-running (retry {retries}/"
                        f"{steal_retries})\n"
                    )
                    continue
                meta["steal_retries"] = retries
                break
            per_run.append(t)
            run_meta.append(meta)
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
    if run_meta:
        out["runs"] = run_meta
        out["steal_guard"] = {
            "max_jiffies_per_sec": steal_max,
            "retries_allowed": steal_retries,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
