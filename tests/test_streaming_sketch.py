"""Stream==batch reconciliation for the CMS sketch: the mergeability
claim (PERF.md, sketches docstring) executed — a streaming aggregation
over incrementally-arriving chunks must finish with the EXACT sketch
the batch pass computes over the same rows, because CMS merge is
addition."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import load_table
from realtime_event_streaming_spark.streaming.sketch_stream import (
    cms_bucketize,
    cms_sketch_stream,
)

SF = "/root/testdata/sf0.001"


def _cells(rows):
    return {(r["seed"], r["bucket"]): r["c"] for r in rows}


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    events = load_table(spark, SF, "events").select("event_id", "user_id")

    # batch sketch over all rows
    batch = (
        cms_bucketize(events)
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    )

    # deliver the same rows as THREE separate files (micro-batches land
    # in arrival order; the sketch must not care)
    src = tmp_path / "events_src"
    events.withColumn(
        "chunk", (F.col("event_id") % 3).cast("int")
    ).write.partitionBy("chunk").parquet(str(src))

    stream = spark.readStream.schema(
        events.schema
    ).option("recursiveFileLookup", "true").parquet(str(src))
    q = (
        cms_sketch_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from cms_stream").collect()

    assert _cells(streamed) == _cells(batch)
    # constant-state contract: never more than D*W cells
    from realtime_event_streaming_spark.operators.sketches import CMS_D, CMS_W

    assert len(streamed) <= CMS_D * CMS_W
