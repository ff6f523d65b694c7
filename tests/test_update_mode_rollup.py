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


def test_rollup_parts_merge_replay_and_compaction(spark, tmp_path):
    """The additive parts store (SummingMergeTree semantics): parts
    merge-on-read to the batch truth, a REPLAYED batch replaces its
    own part instead of double-counting, and compaction preserves the
    merged values while folding parts."""
    from realtime_event_streaming_spark.streaming.agg import (
        _rollup_part,
        compact_rollup_parts,
        read_rollup_parts,
        write_rollup_parts,
    )

    clicks = generate_clicks(spark, n_events=3000, n_users=100, rate_per_sec=5)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=5)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))
    q = write_rollup_parts(
        stream,
        str(tmp_path / "parts"),
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    merged = read_rollup_parts(spark, str(tmp_path / "parts"))
    events = parse_clicks(as_json_records(clicks))
    truth = events.groupBy(
        F.expr("(unix_micros(ts) div 60000000)").alias("m_min"), "country"
    ).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("user_id").alias("uniq"),
    )
    assert merged.count() == truth.count()
    j = merged.alias("s").join(truth.alias("b"), ["m_min", "country"])
    assert j.count() == truth.count()
    assert j.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0
    # HLL estimate within the documented band of the exact distinct
    bad = j.where(
        F.abs(F.col("approx_users") - F.col("uniq"))
        > F.greatest(F.lit(8.0), 0.08 * F.col("uniq"))
    )
    assert bad.count() == 0

    # multiple parts landed (one per input file / micro-batch)
    parts_before = spark.read.parquet(str(tmp_path / "parts"))
    n_batches = parts_before.select("batch_id").distinct().count()
    assert n_batches > 1

    # REPLAY: re-deliver batch 0's part write with the same batch_id —
    # dynamic partition overwrite must replace, not append.
    first_file = sorted((tmp_path / "in").glob("*"))[0]
    raw0 = spark.read.format("text").load(str(first_file))
    replay_part = (
        _rollup_part(parse_clicks(raw0))
        .withColumn("batch_id", F.lit(0))
    )
    (
        replay_part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(str(tmp_path / "parts"))
    )
    after_replay = read_rollup_parts(spark, str(tmp_path / "parts"))
    jj = after_replay.alias("s").join(truth.alias("b"), ["m_min", "country"])
    assert jj.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0

    # compaction folds to one part with identical merged values
    compact_rollup_parts(spark, str(tmp_path / "parts"))
    folded = spark.read.parquet(str(tmp_path / "parts"))
    assert folded.select("batch_id").distinct().count() == 1
    after = read_rollup_parts(spark, str(tmp_path / "parts"))
    jc = after.alias("s").join(truth.alias("b"), ["m_min", "country"])
    assert jc.count() == truth.count()
    assert jc.where(F.col("s.cnt") != F.col("b.cnt")).count() == 0
