#!/usr/bin/env python
"""Run the DuckDB oracle-parity gate on the 10x synthesized corpus.

Usage: python scripts/sf1_parity_sweep.py [--sf-dir /tmp/rtes_sf1]
       [--from-name m] [--names a,b,c]

Round-6 swept the registry alphabetically through 'm' at sf1 and
caught three real cross-engine float-determinism hazards (PERF.md §sf1
oracle parity). This script finishes the job: by default it sweeps
every query whose name sorts >= --from-name, or an explicit --names
list. Continues past failures and prints a summary so one broken query
doesn't hide the rest of the tail.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oracle import compare, duck_connection  # noqa: E402

from realtime_event_streaming_spark.registry import load_all  # noqa: E402
from realtime_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/rtes_sf1")
    ap.add_argument("--from-name", default=None)
    ap.add_argument("--to-name", default=None)
    ap.add_argument("--names", default=None)
    ap.add_argument(
        "--skip",
        default="margin_mutual_nn",
        help="comma-separated names to exclude (default: the documented "
        "all-pairs labeled baseline, quadratic by design in BOTH "
        "engines -- its scale path is the IVF candidate generator)",
    )
    args = ap.parse_args()

    reg = load_all()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = sorted(reg)
        if args.from_name:
            names = [n for n in names if n >= args.from_name]
        if args.to_name:
            names = [n for n in names if n < args.to_name]
    skip = {n.strip() for n in (args.skip or "").split(",") if n.strip()}
    names = [n for n in names if n not in skip]

    spark = get_spark("sf1-parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf_dir)

    failures: list[str] = []
    for i, name in enumerate(names, 1):
        q = reg[name]
        t0 = time.time()
        try:
            df = q.spark_fn(spark, args.sf_dir)
            problems = [] if q.oracle is None else compare(
                name, df, con, q.oracle
            )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            problems = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "ok" if not problems else "FAIL"
        print(f"[{i}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
        for p in problems:
            print(f"    {p}", flush=True)
            failures.append(p)

    print(f"\nswept {len(names)} queries at {args.sf_dir}: "
          f"{len(names) - len({f.split(':')[0] for f in failures})} green, "
          f"{len({f.split(':')[0] for f in failures})} failing", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
