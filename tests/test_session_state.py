"""Event-time sessionization: gap closure by BOTH paths — input-proved
gaps and event-time timeout expiry — through the real ingest path
(JSON file stream -> parse_clicks -> sessionize)."""

from __future__ import annotations

import json
import os
import time

import pytest

from realtime_event_streaming_spark.streaming.ingest import (
    parse_clicks,
    read_json_file_stream,
)
from realtime_event_streaming_spark.streaming.session_state import (
    sessionize_clicks,
    sessionize_clicks_tws,
)

BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z


def _click(user, off_s, page):
    return json.dumps(
        {
            "event_id": f"e{user}-{off_s}",
            "user_id": str(user),
            "ts": BASE_MS + off_s * 1000,
            "page": page,
            "referrer": "direct",
            "country": "US",
            "device": "desktop",
        }
    )


def _write_batches(path, batches):
    """One file per micro-batch, strictly increasing mtimes (the file
    source orders by modification time)."""
    os.makedirs(path, exist_ok=True)
    t0 = time.time()
    for i, lines in enumerate(batches):
        f = os.path.join(path, f"b{i}.json")
        with open(f, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.utime(f, (t0 + i, t0 + i))


#: u1 session A: 3 events / 2 pages in 10 s.  u1 session B starts
#: 290 s later (>> 60 s gap): arriving input closes A inline.
#: Sentinels (u2) advance the watermark so B's event-time TIMEOUT
#: fires (wm after batch 3 = 00:09:50 > B's 00:06:20 timeout; batch 4
#: evaluates it).  u2's own session must still be open at the end.
GAP_AND_TIMER_BATCHES = [
    [_click(1, 0, "/a"), _click(1, 5, "/a"), _click(1, 10, "/b")],
    [_click(1, 300, "/c"), _click(1, 320, "/d")],
    [_click(2, 600, "/x")],
    [_click(2, 660, "/x")],
]


def _run_sessions(spark, src, sessionize, name):
    stream = parse_clicks(
        read_json_file_stream(spark, src, max_files_per_trigger=1),
        watermark="10 seconds",
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).collect()


def _assert_gap_and_timer_sessions(rows):
    got = {(r.user_id, r.session_start_ms): r for r in rows}
    # exactly the two u1 sessions: A (closed by arriving input's gap),
    # B (closed by the event-time timeout); u2's session is still open.
    assert set(got) == {("1", BASE_MS), ("1", BASE_MS + 300000)}
    a = got[("1", BASE_MS)]
    assert (a.n_events, a.n_pages, a.duration_s) == (3, 2, 10.0)
    assert a.session_end_ms == BASE_MS + 10000
    b = got[("1", BASE_MS + 300000)]
    assert (b.n_events, b.n_pages, b.duration_s) == (2, 2, 20.0)


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_sessions_close_by_gap_and_by_timer(spark, tmp_path, provider):
    src = str(tmp_path / "clicks")
    _write_batches(src, GAP_AND_TIMER_BATCHES)
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, "")
    if provider == "rocksdb":
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        rows = _run_sessions(
            spark, src, sessionize_clicks, f"sessions_gst_{provider}"
        )
    finally:
        if old:
            spark.conf.set(key, old)
        elif provider == "rocksdb":
            spark.conf.unset(key)
    _assert_gap_and_timer_sessions(rows)


def test_batch_spanning_multiple_sessions_splits_runs(spark, tmp_path):
    # one micro-batch holding three gap-separated runs for the same
    # user: the two complete runs must emit immediately, the last
    # stays open (no timeout can have fired yet).
    batches = [
        [
            _click(7, 0, "/a"),
            _click(7, 30, "/b"),
            _click(7, 200, "/a"),
            _click(7, 210, "/a"),
            _click(7, 400, "/z"),
        ]
    ]
    src = str(tmp_path / "clicks2")
    _write_batches(src, batches)
    rows = _run_sessions(spark, src, sessionize_clicks, "sessions_runs")
    got = sorted((r.session_start_ms, r.n_events, r.n_pages) for r in rows)
    assert got == [(BASE_MS, 2, 2), (BASE_MS + 200000, 2, 1)]


def _has_protobuf() -> bool:
    from realtime_event_streaming_spark.protobuf_compat import (
        ensure_protobuf,
    )

    return ensure_protobuf()


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState Python protocol needs protobuf and no "
    "vendorable pure-Python copy was found (see protobuf_compat)",
)
def test_sessions_tws_state_v2_path(spark, tmp_path):
    """Same scenario through the Spark 4 transformWithStateInPandas
    form (typed state + explicit timers, RocksDB provider)."""
    src = str(tmp_path / "clicks_tws")
    _write_batches(src, GAP_AND_TIMER_BATCHES)
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rows = _run_sessions(spark, src, sessionize_clicks_tws, "sessions_tws")
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    _assert_gap_and_timer_sessions(rows)
