"""Streaming joins: stream-static enrichment and the stream-stream
interval join, reconciled against their batch equivalents."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.sources.clickgen import (
    as_json_records,
    generate_clicks,
    write_stream_fixture,
)
from realtime_event_streaming_spark.streaming.enrich import (
    enrich_clicks,
    view_purchase_conversions_stream,
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


def test_stream_static_enrichment(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=2000, n_users=80, rate_per_sec=5)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=3)
    dim = spark.createDataFrame(
        [("US", "americas"), ("CA", "americas"), ("DE", "emea"), ("FR", "emea"),
         ("GB", "emea"), ("IN", "apac"), ("JP", "apac"), ("AU", "apac")],
        "country string, region string",
    )
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))
    enriched = _run(enrich_clicks(stream, dim), spark, "enriched")
    assert enriched.count() == 2000
    assert enriched.where(F.col("region").isNull()).count() == 0
    regions = {r.region for r in enriched.select("region").distinct().collect()}
    assert regions == {"americas", "emea", "apac"}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=4000, n_users=60, rate_per_sec=5)
    write_stream_fixture(clicks, str(tmp_path / "in"), n_files=5)
    stream = parse_clicks(read_json_file_stream(spark, str(tmp_path / "in")))
    joined = _run(
        view_purchase_conversions_stream(stream), spark, "convs"
    )

    batch_events = parse_clicks(as_json_records(clicks))
    views = batch_events.where(F.col("page") != "/checkout").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("page").alias("v_page"),
    )
    purchases = batch_events.where(F.col("page") == "/checkout").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    truth = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts > v_ts AND p_ts <= v_ts + INTERVAL 10 MINUTES"
        ),
    )
    n_stream, n_truth = joined.count(), truth.count()
    assert n_stream > 100, "fixture should produce conversions"
    # streaming emits matches whose state the watermark completed; every
    # emitted pair must exist in the batch truth, and coverage must be
    # high (tail pairs near stream end may lack watermark confirmation)
    j = joined.join(
        truth,
        (joined.v_user == truth.v_user)
        & (joined.view_ts == truth.v_ts)
        & (joined.purchase_ts == truth.p_ts),
        "left_anti",
    )
    assert j.count() == 0, "stream emitted a pair not in batch truth"
    assert n_stream >= 0.8 * n_truth, (n_stream, n_truth)
