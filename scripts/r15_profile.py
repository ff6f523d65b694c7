#!/usr/bin/env python
"""Round-15 optimization profiler: per-headline-query wall, Spark job
count, and .explain('formatted') capture.

Usage:
  python scripts/r15_profile.py [--names a,b,c] [--plans-dir plans/r15]
      [--runs 2] [--suffix before]

For each selected query (default: all headline queries) in a SINGLE
warm session:
  - one warm-up collect (JIT/codegen/footer caches, index builds);
  - ``--runs`` timed collects (median recorded);
  - the number of Spark jobs the timed run launched (job-group
    counted via the status tracker) — the tiny-job-tax proxy at
    contract scale where per-job overhead, not bytes, dominates;
  - ``.explain('formatted')`` written to
    ``<plans-dir>/<name>_<suffix>.txt`` (for eager-checkpoint
    queries this shows the final consumer plan over the checkpoint
    RDDs — the executed shape of the last stage; the hop jobs are
    visible in the job count instead).

Timing here is same-JVM (relative ranking / before-after deltas);
recorded BENCH numbers stay fresh-median-3 via bench.py.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from realtime_event_streaming_spark.registry import load_all  # noqa: E402
from realtime_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("r15-profile")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    if args.names:
        names = args.names.split(",")
    else:
        names = sorted(n for n, q in reg.items() if q.headline)

    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        q = reg[name]
        sc.setJobDescription(f"{name}: warm-up")
        q.spark_fn(spark, args.sf_dir).collect()  # warm-up
        samples, job_counts = [], []
        for i in range(args.runs):
            group = f"r15prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = q.spark_fn(spark, args.sf_dir)
            df.collect()
            samples.append(time.perf_counter() - t0)
            job_counts.append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
        if plans_dir:
            df = q.spark_fn(spark, args.sf_dir)
            qe = df._jdf.queryExecution()
            df.collect()  # finalize AQE so the capture is the EXECUTED plan
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
            plan = qe.explainString(mode.fromString("formatted"))
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(plan)
        out[name] = {
            "wall_median": round(statistics.median(samples), 4),
            "wall_all": [round(s, 4) for s in samples],
            "jobs": max(job_counts),
        }
        print(
            f"{name:35s} {out[name]['wall_median']:8.3f}s "
            f"jobs={out[name]['jobs']}",
            flush=True,
        )
    total = round(sum(v["wall_median"] for v in out.values()), 3)
    print(f"{'TOTAL':35s} {total:8.3f}s")
    print(json.dumps({"total": total, "queries": out}))


if __name__ == "__main__":
    main()
