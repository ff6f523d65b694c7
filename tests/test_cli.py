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


def test_audit_command_counts_plan_properties(capsys):
    """`audit` reports the plan-quality counters from the AQE-final
    plan: the no-parquet-rescan property of the manifest and the
    Arrow-only Python boundary of the multimodal leg are visible in
    one JSON line each."""
    import json

    from realtime_event_streaming_spark.__main__ import main

    sys.argv = ["prog", "audit", "pretraining_mix_manifest",
                "--sf-dir", "/root/testdata/sf0.001"]
    assert main() == 0
    a = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a["parquet_scans"] == 0  # every branch reads the checkpoint
    assert a["row_at_a_time_python"] == 0

    sys.argv = ["prog", "audit", "multimodal_features",
                "--sf-dir", "/root/testdata/sf0.001"]
    assert main() == 0
    a = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a["arrow_python"] >= 1 and a["row_at_a_time_python"] == 0
