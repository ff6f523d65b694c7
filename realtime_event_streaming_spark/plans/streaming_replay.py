"""Registry entry that exercises the streaming engine itself.

The driver's oracle gate can only compare batch SQL; the streaming
rollup is genuinely non-SQL-expressible (watermarks, incremental state,
append emission), so this entry registers WITHOUT an oracle — the
driver records its weaker rows-only check, and the strong evidence is
the in-repo reconciliation test (tests/test_streaming.py: stream ==
batch on finalized windows, 0 mismatches).

The replay is fully deterministic: a seeded generator writes an ordered
wire fixture, the exact rollup consumes it with availableNow, and the
finalized windows are returned sorted.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.clickgen import generate_clicks, write_stream_fixture
from ..streaming.agg import EXACT_WATERMARK, minute_rollup_stream_exact
from ..streaming.ingest import parse_clicks, read_json_file_stream

#: Deterministic cached fixture path: the generator is seeded, so the
#: wire files are identical every run — build once, reuse forever
#: (repeated verify/bench invocations previously leaked one mkdtemp
#: per call). The _COMPLETE marker guards against a half-written dir.
_FIXTURE_ROOT = Path(tempfile.gettempdir()) / "rtes_replay_fixture_v1"


def _ensure_fixture(spark: SparkSession) -> str:
    marker = _FIXTURE_ROOT / "_COMPLETE"
    if not marker.exists():
        shutil.rmtree(_FIXTURE_ROOT, ignore_errors=True)
        clicks = generate_clicks(
            spark, n_events=2000, n_users=100, rate_per_sec=5
        )
        write_stream_fixture(clicks, str(_FIXTURE_ROOT / "in"), n_files=4)
        marker.touch()
    return str(_FIXTURE_ROOT / "in")


@register("streaming_rollup_replay", oracle=None, tags=("streaming",))
def streaming_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming replay: generator -> ordered JSON files ->
    file-source stream -> parse/watermark -> exact windowed rollup
    (chained dedup -> union -> agg) -> finalized windows.

    Returns the deterministic set of windows the watermark closed
    (same fixture every run; sf_dir is unused — the input is the
    engine's own wire format, not a warehouse table)."""
    in_dir = _ensure_fixture(spark)
    stream = parse_clicks(
        read_json_file_stream(spark, in_dir), watermark=EXACT_WATERMARK
    )
    name = "replay_rollup"
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        minute_rollup_stream_exact(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "page",
            "country",
            "cnt",
            "unique_users",
        )
        .orderBy("window_start", "page", "country")
    )
