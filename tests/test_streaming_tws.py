"""transformWithState (Spark 4) Welford scorer vs the
applyInPandasWithState twin: identical output on identical input.

The new API needs the RocksDB state store provider — set per-query
here via the session conf (restored after), so the rest of the suite
keeps the default provider.

ENVIRONMENT GATE (unlocked round 9): transformWithState's Python
worker speaks protobuf to the JVM
(pyspark/sql/streaming/proto/StateMessage_pb2) and this container has
no `protobuf` package (and no pip) — but
`protobuf_compat.ensure_protobuf` (called in conftest BEFORE the JVM
launches, so workers inherit PYTHONPATH) discovers a vendored
pure-Python runtime on disk, and the reconciliation now runs fully:
the protobuf handshake, the RocksDB state server round-trips, and
stream==batch equality with the applyInPandasWithState twin. The
skipif remains only for systems with no discoverable copy at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from realtime_event_streaming_spark.streaming.anomaly_stream import (
    score_rollup_stream,
)
from realtime_event_streaming_spark.streaming.anomaly_tws import (
    score_rollup_stream_tws,
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run_to_memory(df, spark, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def rollup_fixture(spark, tmp_path):
    rows = []
    for key_i, (page, country) in enumerate([("/", "US"), ("/cart", "DE")]):
        for m in range(10):
            cnt = 100 + (m % 3) + key_i
            if m == 9:
                cnt = 1000
            rows.append(
                (
                    f"2024-01-01 00:{m:02d}:00",
                    f"2024-01-01 00:{m + 1:02d}:00",
                    page,
                    country,
                    cnt,
                    cnt,
                )
            )
    rollup = spark.createDataFrame(
        rows,
        "window_start string, window_end string, page string, country string,"
        " cnt long, unique_users long",
    )
    fixture = str(tmp_path / "rollup")
    rollup.coalesce(1).write.mode("overwrite").parquet(fixture)
    return rollup.schema, fixture


def _protobuf_available() -> bool:
    from realtime_event_streaming_spark.protobuf_compat import (
        ensure_protobuf,
    )

    return ensure_protobuf()


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState Python worker needs protobuf; no package "
    "and no vendorable pure-Python copy found on this system "
    "(see protobuf_compat)",
)
def test_tws_matches_apply_in_pandas_twin(spark, rollup_fixture):
    schema, fixture = rollup_fixture
    old = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        stream = spark.readStream.schema(schema).parquet(fixture)
        tws = _run_to_memory(
            score_rollup_stream_tws(stream), spark, "tws_scored"
        ).collect()
        stream2 = spark.readStream.schema(schema).parquet(fixture)
        twin = _run_to_memory(
            score_rollup_stream(stream2), spark, "twin_scored"
        ).collect()
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)

    key = lambda r: (r.page, r.country, r.window_start)  # noqa: E731
    assert sorted(tws, key=key) == sorted(twin, key=key)
    assert len(tws) == 20
    anom = [r for r in tws if r.is_anomaly == "true"]
    assert len(anom) == 2 and all(r.cnt == 1000 for r in anom)
