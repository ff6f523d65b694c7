#!/usr/bin/env python
"""100x scale sweep (judge r9 item 4): extend the admission-path sweep
to sf10 (100x sf0.1) for the ops whose 50x behavior round 9 proved
flat, plus the heaviest dedup trio and the round-10 serving probe.

Queries and what their scaling claims:

- update_dedup_index / update_ann_index: probe (warm) should stay
  FLAT — steady-state admission reads the materialized index, never
  the corpus. build+cycle grows with corpus (the periodic rebuild a
  deployment amortizes).
- pq_rerank_serve: warm probe is the ANN serving path — index build
  amortized, probe cost bounded by nprobe cells + shortlist.
- dedup_minhash_lsh / winnowing_dup_pairs / repeated_substring_census
  / exact_substring_strip: one-shot corpus passes; wall should scale
  ~linearly in rows (posting/fingerprint shuffles), NEVER
  quadratically — the ratio table is the evidence.

Corpora synthesized by scripts/synth_sf.py rules (no RNG,
shape-preserving; per-token suffixing keeps replicas mutually
dissimilar so the LSH candidate graph scales honestly).

Usage: python scripts/scale_sweep_sf10.py [--skip-trio]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

SFS = [
    ("sf0.1", "/root/testdata/sf0.1", None),
    ("sf1", "/tmp/rtes_sf1", 10),
    ("sf10", "/tmp/rtes_sf10", 100),
]

#: (query, timed mode): "maint" = cold build+cycle then min-of-2 warm
#: probes; "oneshot" = single timed pass per SF.
QUERIES = [
    ("update_dedup_index", "maint"),
    ("update_ann_index", "maint"),
    ("pq_rerank_serve", "maint"),
    ("dedup_minhash_lsh", "oneshot"),
    ("winnowing_dup_pairs", "oneshot"),
    ("repeated_substring_census", "oneshot"),
    ("exact_substring_strip", "oneshot"),
]


def ensure_corpus(dst: str, factor: int) -> None:
    if os.path.isdir(dst) and os.path.exists(f"{dst}/embeddings.parquet"):
        return
    print(f"synthesizing {dst} (factor {factor})...", flush=True)
    subprocess.run(
        [
            sys.executable,
            "scripts/synth_sf.py",
            "--src",
            "/root/testdata/sf0.1",
            "--dst",
            dst,
            "--factor",
            str(factor),
        ],
        check=True,
    )


def main() -> None:
    from realtime_event_streaming_spark.registry import load_all
    from realtime_event_streaming_spark.session import get_spark

    skip_trio = "--skip-trio" in sys.argv
    for _, dst, factor in SFS:
        if factor:
            ensure_corpus(dst, factor)

    spark = get_spark("scale-sweep-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    for name, mode in QUERIES:
        if skip_trio and mode == "oneshot":
            continue
        for label, sf_dir, _ in SFS:
            t0 = time.perf_counter()
            if mode == "maint":
                n = reg[name].spark_fn(spark, sf_dir).count()
            else:
                # collect(), NOT count(): on aggregate-output queries
                # (repeated_substring_census groups per source) count()
                # lets Catalyst prune the aggregate expressions and
                # with them the entire fingerprint pipeline, timing
                # only a distinct-source scan. collect() forces every
                # output value to be computed.
                n = len(reg[name].spark_fn(spark, sf_dir).collect())
            cold = time.perf_counter() - t0
            if mode == "maint":
                warm = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    reg[name].spark_fn(spark, sf_dir).count()
                    warm.append(time.perf_counter() - t0)
                print(
                    f"{name} @ {label}: build+cycle {cold:.2f}s, "
                    f"probe {min(warm):.2f}s (rows={n})",
                    flush=True,
                )
            else:
                print(
                    f"{name} @ {label}: {cold:.2f}s (rows={n})",
                    flush=True,
                )


if __name__ == "__main__":
    main()
