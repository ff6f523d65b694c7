"""Python Data Source (Spark 4 API): partition-invariance and schema
contract for the registered `clickgen` source."""

from __future__ import annotations

from realtime_event_streaming_spark.sources.clickgen_source import register


def test_result_invariant_under_partition_count(spark):
    register(spark)

    def load(parts):
        return (
            spark.read.format("clickgen")
            .option("n_events", 2000)
            .option("num_partitions", parts)
            .load()
        )

    one = load(1).orderBy("event_id").collect()
    eight = load(8).orderBy("event_id").collect()
    assert one == eight
    assert len(one) == 2000
    # parallelism is real: the planned RDD has the requested partitions
    assert load(8).rdd.getNumPartitions() == 8


def test_schema_and_determinism(spark):
    register(spark)
    df = (
        spark.read.format("clickgen").option("n_events", 100).load()
    )
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "ts", "page", "country", "device",
    ]
    a = df.collect()
    b = spark.read.format("clickgen").option("n_events", 100).load().collect()
    assert a == b


def test_arrow_reader_matches_row_reader(spark):
    from realtime_event_streaming_spark.sources.clickgen_source import (
        register_all,
    )

    register_all(spark)
    row = (
        spark.read.format("clickgen").option("n_events", 1000).load()
        .orderBy("event_id").collect()
    )
    arrow = (
        spark.read.format("clickgen_arrow").option("n_events", 1000).load()
        .orderBy("event_id").collect()
    )
    assert row == arrow


def test_streaming_source_emits_offset_managed_batches(spark, tmp_path):
    from realtime_event_streaming_spark.sources.clickgen_source import (
        register_all,
    )

    register_all(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("clickgen_stream")
        .option("rows_per_batch", 500)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["batchId"] >= 2:
            break
        time.sleep(1)
    q.stop()
    got = spark.read.parquet(out)
    n = got.count()
    assert n >= 1000 and n % 500 == 0, n
    # deterministic: ids are the md5 of the contiguous sequence
    assert got.select("event_id").distinct().count() == n


def test_wiredump_writer_commit_protocol(spark, tmp_path):
    import json
    import os

    from realtime_event_streaming_spark.sources.clickgen_source import (
        register_all,
    )

    register_all(spark)
    out = str(tmp_path / "wire")
    df = (
        spark.read.format("clickgen").option("n_events", 300)
        .option("num_partitions", 4).load()
    )
    df.write.format("wiredump").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 300
    parts = sorted(
        p for p in os.listdir(out) if p.startswith("part-")
    )
    assert parts == manifest["parts"]
    # round trip: the dumped wire JSON reloads to the same rows
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 300
    orig = {r.event_id for r in df.select("event_id").collect()}
    got = {r.event_id for r in back.select("event_id").collect()}
    assert got == orig
