"""realtime_event_streaming_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
``YongzhQi/realtime-event-streaming`` (Python producer -> Kafka -> Flink
-> ClickHouse -> SQL dashboards), re-expressed Spark-first:

- Batch analytics: Spark SQL / DataFrame queries (Catalyst-optimized),
  see :mod:`realtime_event_streaming_spark.plans`.
- Streaming: Structured Streaming ingestion, tumbling-window rollups and
  a stateful Welford anomaly operator,
  see :mod:`realtime_event_streaming_spark.streaming`.
- Training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing),
  see :mod:`realtime_event_streaming_spark.operators`.

Nothing in this package is ported from the reference's Java/ClickHouse
code; reference files are cited (file:line) in docstrings only to map
*what* is computed, never *how*.
"""

__version__ = "0.1.0"
