"""Streaming count-min sketch: the mergeable-sketch rollup running as
a stream.

`operators/sketches.cms_heavy_hitters` documents the 100 TB design as
"the sketch is fixed-size and MERGEABLE — per-partition partial counts
combine by addition"; this module is that claim executed under
incremental arrival: a Structured Streaming aggregation maintains the
(seed, bucket) counts as events flow in, and because CMS merge IS
addition, the stream's final sketch is bit-identical to the batch
sketch over the same rows — pinned by the reconciliation test
(tests/test_streaming_sketch.py), the same stream==batch discipline as
`minute_rollup_stream_exact`.

No counterpart in the reference (its nearest analogue is the Flink
keyed running counts, StreamJob.java:253-276, which keep exact
per-key state); the CMS form is what replaces exact state when the
key domain is unbounded — D*W cells of state FOREVER, regardless of
how many distinct users arrive.

Scale notes (100 TB / unbounded stream): state is exactly D*W rows —
constant, no watermark needed for boundedness (we still run in
complete/update mode over the bounded fixture); the shuffle key is
(seed, bucket), perfectly uniform by construction. Probing the
streaed sketch costs D lookups per key, served from the latest
micro-batch's output table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.sketches import CMS_D, CMS_W


def cms_bucketize(events: DataFrame) -> DataFrame:
    """Explode each event into its D (seed, bucket) cells — identical
    hash to the batch CMS (seed:user_id md5-prefix mod W), so stream
    and batch sketches are comparable cell-for-cell."""
    seeded = events.select(
        "user_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(CMS_D)])
        ).alias("seed"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(concat(cast(seed as string), ':', "
        f"cast(user_id as string))), 1, 7), 16, 10) as bigint) % {CMS_W}"
    )
    return seeded.select("seed", bucket.alias("bucket"))


def cms_sketch_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming CMS maintenance: the running (seed, bucket, c) counts
    over everything seen so far. Complete-mode output is the whole
    sketch (D*W rows max) each trigger — the sketch is small enough
    that re-emitting it beats delta-tracking."""
    return (
        cms_bucketize(events_stream)
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
    )
