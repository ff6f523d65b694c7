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

import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.clickgen import generate_clicks, write_stream_fixture
from ..streaming.agg import EXACT_WATERMARK, minute_rollup_stream_exact
from ..streaming.ingest import parse_clicks, read_json_file_stream


@register("streaming_rollup_replay", oracle=None, tags=("streaming",))
def streaming_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming replay: generator -> ordered JSON files ->
    file-source stream -> parse/watermark -> exact windowed rollup
    (chained dedup -> union -> agg) -> finalized windows.

    Returns the deterministic set of windows the watermark closed
    (same fixture every run; sf_dir is unused — the input is the
    engine's own wire format, not a warehouse table)."""
    d = tempfile.mkdtemp(prefix="rtes_replay_")
    clicks = generate_clicks(spark, n_events=2000, n_users=100, rate_per_sec=5)
    write_stream_fixture(clicks, f"{d}/in", n_files=4)
    stream = parse_clicks(
        read_json_file_stream(spark, f"{d}/in"), watermark=EXACT_WATERMARK
    )
    name = f"replay_{uuid.uuid4().hex[:8]}"
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
