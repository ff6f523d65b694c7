from __future__ import annotations

import os

import pytest

from realtime_event_streaming_spark.protobuf_compat import ensure_protobuf
from realtime_event_streaming_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # must run BEFORE the JVM launches: transformWithState's Python
    # workers inherit PYTHONPATH (and the protobuf minor-skew escape
    # hatch) from the gateway env — see protobuf_compat docstring
    ensure_protobuf()
    s = get_spark("rtes-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_check():
    return SF_CHECK
