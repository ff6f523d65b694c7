"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``realtime_event_streaming_spark``
package; this file only adapts its query registry to the contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from realtime_event_streaming_spark.registry import (  # noqa: E402
    driver_registry,
    load_all,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["minute_rollup"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full registry, registry.DRIVER_QUERIES first (the driver
    records CORRECTNESS rows for the first 50; the rest run under the
    same contract and stay locally oracle-gated)."""
    return {name: q.spark_fn for name, q in driver_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible driver query."""
    return {
        name: q.oracle
        for name, q in driver_registry().items()
        if q.oracle is not None
    }
