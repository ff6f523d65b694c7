"""Canonical schemas for the click-event domain.

Reference: event wire format README.md:83-93 / producer/produce.py:127-135
(epoch-millisecond ``ts``); at-rest tables sql/clickhouse_tables.sql:5-72.
Flat primitive-only schemas — one StructType each (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Wire schema: what arrives as JSON on the bus (ts = epoch ms).
CLICK_WIRE_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("user_id", StringType()),
        StructField("ts", LongType()),  # epoch milliseconds
        StructField("page", StringType()),
        StructField("referrer", StringType()),
        StructField("country", StringType()),
        StructField("device", StringType()),
    ]
)

#: Parsed in-flight schema (ts as TimestampType; reference Click POJO
#: StreamJob.java:48-64).
CLICK_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("user_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("page", StringType()),
        StructField("referrer", StringType()),
        StructField("country", StringType()),
        StructField("device", StringType()),
    ]
)

#: Minute rollup (reference PageMinuteAgg StreamJob.java:66-90 /
#: rt.page_minute_agg clickhouse_tables.sql:23-37).
PAGE_MINUTE_AGG_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("page", StringType()),
        StructField("country", StringType()),
        StructField("cnt", LongType()),
        StructField("unique_users", LongType()),
    ]
)

#: Anomaly scorer output — THE schema the engine actually emits
#: (streaming/anomaly_stream uses this as its Arrow output type).
#: Reference shape: Tuple5 StreamJob.java:130 + reason :189. Documented
#: deviations from a literal Tuple5 mapping: ``window_start`` and
#: ``is_anomaly`` are strings ('true'/'false') for stable cross-format
#: sink output, and ``n_observations`` (the Welford count the score was
#: based on) is added for observability.
ANOMALY_SCHEMA = StructType(
    [
        StructField("page", StringType()),
        StructField("country", StringType()),
        StructField("window_start", StringType()),
        StructField("cnt", LongType()),
        StructField("is_anomaly", StringType()),
        StructField("z_score", DoubleType()),
        StructField("running_mean", DoubleType()),
        StructField("n_observations", LongType()),
        StructField("reason", StringType()),
    ]
)
