"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate. Runs at sf0.001 by default
(fast); set ORACLE_SF=/root/testdata/sf0.01 to run at the driver's
check scale.
"""

from __future__ import annotations

import os

import pytest

from realtime_event_streaming_spark.registry import load_all

from .oracle import compare, duck_connection

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

_REG = load_all()
_NAMES = sorted(_REG)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = _REG[name]
    df = q.spark_fn(spark, SF_DIR)
    if q.oracle is None:
        # Weaker rows-only check, like the driver's.
        assert df.count() >= 0
        return
    problems = compare(name, df, duck, q.oracle)
    assert not problems, "\n".join(problems)
