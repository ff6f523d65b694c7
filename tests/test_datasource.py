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
