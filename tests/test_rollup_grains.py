"""Multi-grain streaming rollups (the reference's orphan tables,
clickhouse_tables.sql:40-72, finally get writers) — approx variant
reconciled against batch within HLL tolerance."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.sources.clickgen import (
    as_json_records,
    generate_clicks,
    write_stream_fixture,
)
from realtime_event_streaming_spark.streaming.agg import (
    rollup_5min_stream,
    rollup_hourly_stream,
    rollup_sliding_stream,
    session_stream,
)
from realtime_event_streaming_spark.streaming.ingest import (
    parse_clicks,
    read_json_file_stream,
)


def _run(df, spark, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_multi_grain_rollups(spark, tmp_path):
    # 0.5 ev/s x 4000 = ~2.2 h span: enough for hourly windows to close
    clicks = generate_clicks(spark, n_events=4000, n_users=150, rate_per_sec=0.5)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=6)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))

    five = _run(rollup_5min_stream(stream), spark, "g5")
    hourly = _run(rollup_hourly_stream(stream), spark, "gh")

    batch = parse_clicks(as_json_records(clicks))
    truth5 = (
        batch.groupBy(F.window("ts", "5 minutes").alias("win"), "page")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "page", "cnt")
    )
    j5 = five.alias("s").join(truth5.alias("b"), ["window_start", "page"])
    assert five.count() > 10
    assert j5.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0
    # HLL uniques within 15% of exact on matched windows
    exact5 = (
        batch.groupBy(F.window("ts", "5 minutes").alias("win"), "page")
        .agg(F.countDistinct("user_id").alias("uu"))
        .select(F.col("win.start").alias("window_start"), "page", "uu")
    )
    je = five.join(exact5, ["window_start", "page"])
    bad = je.where(
        F.abs(F.col("unique_users") - F.col("uu")) > F.greatest(F.col("uu") * 0.15, F.lit(2))
    ).count()
    assert bad == 0, "HLL estimate outside tolerance"

    assert hourly.count() > 0
    assert set(hourly.columns) >= {
        "window_start",
        "page",
        "country",
        "device",
        "cnt",
        "unique_users",
    }


def test_sliding_windows(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=2000, n_users=80, rate_per_sec=2)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=4)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))
    slid = _run(rollup_sliding_stream(stream), spark, "gslide")
    assert slid.count() > 0
    # every event lands in window/slide = 5 overlapping windows: summed
    # sliding counts over fully-emitted regions are ~5x the tumbling sum
    batch = parse_clicks(as_json_records(clicks))
    truth = (
        batch.groupBy(F.window("ts", "5 minutes", "1 minute").alias("win"), "page")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "page", "cnt")
    )
    j = slid.alias("s").join(truth.alias("b"), ["window_start", "page"])
    assert j.count() == slid.count(), "emitted sliding window missing from truth"
    assert j.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0


def test_session_windows_stream(spark, tmp_path):
    # per-user inter-arrival ~ n_users/rate = 100 s >> the 1-minute gap,
    # so sessions close (and emit) continuously as the watermark moves
    clicks = generate_clicks(spark, n_events=1500, n_users=20, rate_per_sec=0.2)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=4)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))
    sess = _run(session_stream(stream, gap="1 minute"), spark, "gsess")
    assert sess.count() > 0
    rows = sess.collect()
    assert all(r.session_end >= r.session_start for r in rows)
    assert all(r.events_in_session >= 1 for r in rows)
