"""CLI smoke tests (subprocess — the real user surface)."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "realtime_event_streaming_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )


def test_list_names_all_queries():
    r = _run("list")
    assert r.returncode == 0
    assert "queries; * = benchmarked headline" in r.stdout
    assert "minute_rollup" in r.stdout and "dedup_minhash_lsh" in r.stdout


def test_run_emits_json_rows():
    r = _run("run", "latency_stats", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert rows and {"event_type", "cnt", "p95_value"} <= set(rows[0])


def test_unknown_query_fails_cleanly():
    r = _run("run", "nope")
    assert r.returncode == 2
    assert "unknown query" in r.stderr
