"""Update-mode rollup + read-side merge == the reference's MV model.

The append-mode rollup trades latency for finalized-only rows; the
update log makes every window visible at micro-batch latency and the
read-side merge (last refinement per key) must equal the batch truth
over ALL windows — including ones the watermark never finalized."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.sources.clickgen import (
    as_json_records,
    generate_clicks,
    write_stream_fixture,
)
from realtime_event_streaming_spark.streaming.agg import (
    minute_rollup_batch,
    read_rollup_log,
    rollup_stream_approx,
    write_rollup_update_log,
)
from realtime_event_streaming_spark.streaming.ingest import (
    parse_clicks,
    read_json_file_stream,
)


def test_update_log_merge_equals_batch(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=3000, n_users=100, rate_per_sec=5)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=5)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))

    # exact counts need no dedup in update mode for cnt; uniques use
    # HLL here, so compare cnt exactly and skip unique comparison.
    q = write_rollup_update_log(
        rollup_stream_approx(stream),
        str(tmp_path / "log"),
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    merged = read_rollup_log(spark, str(tmp_path / "log"))
    truth = minute_rollup_batch(parse_clicks(as_json_records(clicks)))

    # EVERY window appears (no watermark finalization cut), exactly once
    assert merged.count() == truth.count()
    j = merged.alias("s").join(truth.alias("b"), ["window_start", "page", "country"])
    assert j.count() == truth.count()
    assert j.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0
    # refinement actually happened: the log holds more rows than keys
    log_rows = spark.read.parquet(str(tmp_path / "log")).count()
    assert log_rows > merged.count()
