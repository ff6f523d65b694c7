"""Storage maintenance jobs: TTL partition expiry and small-file
compaction (the explicit versions of ClickHouse's background merges
and TTL, SURVEY.md §4)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import (
    compact_partition,
    expire_old_partitions,
    write_events_table,
)
from realtime_event_streaming_spark.sources.clickgen import generate_clicks


def test_compaction_preserves_data(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=20000, n_users=500, rate_per_sec=50)
    ev = clicks.withColumn("ts", F.timestamp_millis("ts"))
    path = str(tmp_path / "events")
    # deliberately fragment (write_events_table would coalesce per
    # month, so write raw): many small files, like a micro-batch sink
    (
        ev.withColumn("month", F.date_format("ts", "yyyyMM"))
        .repartition(40)
        .write.partitionBy("month")
        .parquet(path)
    )
    part = tmp_path / "events" / "month=202401"
    before_files = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    before = spark.read.parquet(path)
    before_cnt = before.count()
    before_sum = before.agg(F.sum(F.hash("event_id"))).collect()[0][0]

    n_after = compact_partition(spark, path, "202401", target_file_mb=128)

    after_files = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert after_files == n_after <= 2 < before_files
    after = spark.read.parquet(path)
    assert after.count() == before_cnt
    assert after.agg(F.sum(F.hash("event_id"))).collect()[0][0] == before_sum


def test_compaction_recovers_from_interrupted_swap(spark, tmp_path):
    clicks = generate_clicks(spark, n_events=10000, n_users=200, rate_per_sec=50)
    ev = clicks.withColumn("ts", F.timestamp_millis("ts"))
    path = str(tmp_path / "t")
    (
        ev.withColumn("month", F.date_format("ts", "yyyyMM"))
        .repartition(10)
        .write.partitionBy("month")
        .parquet(path)
    )
    n_before = spark.read.parquet(path).count()
    # simulate the crash window: month set aside, tmp never renamed in
    os.rename(f"{path}/month=202401", f"{path}/.compact_old_month=202401")
    n_files = compact_partition(spark, path, "202401")
    assert n_files >= 1
    assert spark.read.parquet(path).count() == n_before
    assert not [p for p in os.listdir(path) if p.startswith(".compact")]


def test_ttl_drops_only_old_partitions(spark, tmp_path):
    # ~3 months of data -> several month partitions
    clicks = generate_clicks(spark, n_events=50000, n_users=500, rate_per_sec=0.01)
    ev = clicks.withColumn("ts", F.timestamp_millis("ts"))
    path = str(tmp_path / "events")
    write_events_table(ev, path)
    months = sorted(
        p.split("=")[1] for p in os.listdir(path) if p.startswith("month=")
    )
    assert len(months) >= 2
    cutoff = months[1]
    dropped = expire_old_partitions(spark, path, cutoff)
    assert dropped == [months[0]]
    remaining = spark.read.parquet(path).select("month").distinct().collect()
    assert all(str(r.month) >= cutoff for r in remaining)
