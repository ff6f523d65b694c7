#!/usr/bin/env python
"""Plan-quality sweep: the CLI `audit` counters for EVERY registered
query at sf0.001, with the global invariants asserted mechanically:

- zero row-at-a-time Python anywhere (BatchEvalPython);
- every broadcast-nested-loop join is intentional (the bounded
  crossJoin sites — flagged for eyeballing, not failed).

Prints one JSON line per query and a summary; exit 1 if the hard
invariant breaks.

Usage: python scripts/plan_audit_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from realtime_event_streaming_spark.registry import load_all  # noqa: E402
from realtime_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    reg = load_all()
    bad = []
    nested = []
    for name in sorted(reg):
        try:
            df = reg[name].spark_fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            df.collect()
            plan = qe.explainString(mode.fromString("simple"))
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": str(e)[:120]}))
            bad.append(name)
            continue
        row = {
            "query": name,
            "row_at_a_time_python": plan.count("BatchEvalPython"),
            "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            # runtime bloom filters: REVIEW counter, not a failure —
            # beneficial when the creation side is small, pathological
            # when it is the corpus (the round-14 NSW finding: a
            # corpus-sized bloom built per hop to prefilter a <=B-row
            # frontier, which also degraded executed DPP)
            "runtime_bloom_filters": plan.count("might_contain"),
            # a DPP filter that degraded to literal true in the final
            # plan = a partitioned scan that silently reads everything
            "dpp_degraded_to_true": plan.count(
                "dynamicpruningexpression(true)"
            ),
        }
        print(json.dumps(row), flush=True)
        if row["row_at_a_time_python"]:
            bad.append(name)
        if row["nested_loop_joins"] or row["cartesian"]:
            nested.append(name)
    print(
        f"summary: {len(reg)} queries; row-at-a-time offenders: {bad}; "
        f"nested-loop/cartesian sites (bounded-crossJoin review list): "
        f"{len(nested)}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    # propagate the documented non-zero exit (row-at-a-time Python is
    # a hard invariant) — a discarded return value can never fail CI
    raise SystemExit(main())
