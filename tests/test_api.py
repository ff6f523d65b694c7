"""Engine façade tests (the library's public entry object)."""

from __future__ import annotations

import pytest

from realtime_event_streaming_spark.api import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, "/root/testdata/sf0.001")


def test_tables_and_queries(eng):
    assert eng.table("events").count() == 1000
    assert len(eng.names()) >= 57
    df = eng.query("latency_stats")
    assert {"event_type", "p95_value"} <= set(df.columns)
    assert df.count() == 5


def test_adhoc_sql(eng):
    row = eng.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row.n == 6000


def test_unknown_names_raise(eng):
    with pytest.raises(KeyError):
        eng.table("nope")
    with pytest.raises(KeyError):
        eng.query("nope")


def test_oracle_lookup(eng):
    assert "SELECT" in eng.oracle("latency_stats")
    assert eng.oracle("streaming_rollup_replay") is None
