"""Spark-native synthetic click-event generator.

Rebuilds the reference producer's *distributions* (producer/produce.py:
pages :25-37, countries :40-49, devices :52-56, session referrer chain
:109-125, 5% session expiry :78) as deterministic column expressions —
no Python loop, no driver-side state, fully distributed and
reproducible (hash-bucket weighted choice instead of ``random.choices``;
the referrer chain is a per-user ``lag`` window instead of a session
dict).

Why not a row-by-row port: the reference generator is a single-process
loop capped by the GIL; expressed as column transforms the same
distribution generates at parquet-write speed on every executor —
this is the 100 TB-scale synthetic-load path (pair with
``spark.readStream.format("rate-micro-batch")`` for a live stream: the
same exprs apply to the rate source's ``value`` column).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

PAGES = [
    ("/", 25),
    ("/search", 15),
    ("/product/42", 12),
    ("/product/101", 8),
    ("/product/205", 5),
    ("/cart", 10),
    ("/checkout", 8),
    ("/user/profile", 7),
    ("/about", 3),
    ("/contact", 2),
    ("/help", 5),
]
COUNTRIES = [
    ("US", 35),
    ("IN", 20),
    ("DE", 12),
    ("FR", 10),
    ("JP", 8),
    ("GB", 7),
    ("CA", 5),
    ("AU", 3),
]
DEVICES = [("mobile", 60), ("desktop", 35), ("tablet", 5)]

SESSION_EXPIRY_PCT = 5  # produce.py:78


def _weighted(salt: str, choices: list[tuple[str, int]]) -> F.Column:
    """Deterministic weighted choice: hash-bucket 0..99 -> CASE ladder
    over cumulative weights."""
    bucket = F.pmod(F.hash(F.lit(salt), F.col("id")), F.lit(100))
    expr = None
    cum = 0
    for value, weight in choices[:-1]:
        cum += weight
        cond = bucket < cum
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(choices[-1][0])


def generate_clicks(
    spark: SparkSession,
    n_events: int = 10_000,
    n_users: int = 500,
    rate_per_sec: float = 100.0,
    start_ts: str = "2024-01-01 00:00:00",
    late_every: int | None = None,
    late_by_seconds: int = 60,
    churn_weeks: int | None = None,
) -> DataFrame:
    """Deterministic batch of click events in wire shape (ts = epoch ms).

    ``late_every``: if set, every k-th event's timestamp is pushed
    ``late_by_seconds`` into the past — fixture for watermark tests.

    ``churn_weeks``: if set, users join and leave over time — user u is
    active only from week (hash(u) % churn_weeks) for a hashed lifetime
    of 1..churn_weeks weeks, giving real cohort/retention structure
    (events whose user is outside their active window are re-assigned
    to a stable fallback user so volume is unchanged).
    """
    base_ms = F.unix_timestamp(F.lit(start_ts)) * 1000
    # microsecond stepping so rates above 1000 ev/s don't collapse to a
    # zero step (pmod-by-zero under ANSI)
    step_us = max(int(1_000_000.0 / rate_per_sec), 1)
    df = spark.range(n_events)
    jitter_us = F.pmod(F.hash(F.lit("jit"), F.col("id")), F.lit(step_us)).cast(
        "long"
    )
    ts_ms = base_ms + (F.col("id") * step_us + jitter_us) / F.lit(1000)
    ts_ms = ts_ms.cast("long")
    if late_every:
        ts_ms = F.when(
            F.col("id") % late_every == late_every - 1,
            ts_ms - late_by_seconds * 1000,
        ).otherwise(ts_ms)
    user_n = F.pmod(F.hash(F.lit("usr"), F.col("id")), F.lit(n_users))
    if churn_weeks:
        week = ((ts_ms / 1000 - F.unix_timestamp(F.lit(start_ts))) / 604800).cast(
            "int"
        )
        join_week = F.pmod(F.hash(F.lit("join"), user_n), F.lit(churn_weeks))
        life = F.pmod(F.hash(F.lit("life"), user_n), F.lit(churn_weeks)) + 1
        active = (week >= join_week) & (week < join_week + life)
        # fallback: a small always-active cohort keeps volume constant
        user_n = F.when(active, user_n).otherwise(
            F.pmod(F.hash(F.lit("fb"), F.col("id")), F.lit(max(n_users // 20, 1)))
        )
    df = df.select(
        F.col("id"),
        F.md5(F.concat(F.lit("evt"), F.col("id").cast("string"))).alias("event_id"),
        F.format_string("u%06d", user_n).alias("user_id"),
        ts_ms.alias("ts"),
        _weighted("page", PAGES).alias("page"),
        _weighted("country", COUNTRIES).alias("country"),
        _weighted("device", DEVICES).alias("device"),
    )
    # Referrer = previous page in the user's session chain (produce.py:121);
    # a fresh session (5%, produce.py:78) restarts the chain at '/'.
    w = Window.partitionBy("user_id").orderBy("id")
    fresh = F.pmod(F.hash(F.lit("ses"), F.col("id")), F.lit(100)) < SESSION_EXPIRY_PCT
    referrer = F.when(fresh, F.lit("/")).otherwise(
        F.coalesce(F.lag("page").over(w), F.lit("/"))
    )
    return df.withColumn("referrer", referrer).select(
        F.col("id").alias("_seq"),  # arrival order; excluded from the wire
        "event_id",
        "user_id",
        "ts",
        "page",
        "referrer",
        "country",
        "device",
    )


WIRE_COLUMNS = (
    "event_id",
    "user_id",
    "ts",
    "page",
    "referrer",
    "country",
    "device",
)


def as_json_records(clicks: DataFrame) -> DataFrame:
    """Wire-format frame: (key, value) like the reference's Kafka
    producer (produce.py:162-174 — key=user_id, value=JSON)."""
    return clicks.select(
        F.col("user_id").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in WIRE_COLUMNS])).alias("value"),
    )


def write_stream_fixture(
    clicks: DataFrame, path: str, n_files: int = 10
) -> None:
    """Write JSON-lines files for file-source streaming tests (each file
    becomes a micro-batch under maxFilesPerTrigger=1).

    Files are range-partitioned on *arrival* order (``_seq``, falling
    back to ``ts``) so the stream replays the way a live source would
    deliver it: in-order events advance the watermark gradually, and
    rows the generator marked late (``late_every``) genuinely arrive
    after the watermark has passed them — a randomly shuffled split
    would instead mark almost everything late after the first batch.
    """
    import os
    import time

    order = F.col("_seq") if "_seq" in clicks.columns else F.col("ts")
    records = clicks.select(
        order.alias("_order"),
        F.to_json(F.struct(*[F.col(c) for c in WIRE_COLUMNS])).alias("value"),
    )
    (
        records.repartitionByRange(n_files, "_order")
        .sortWithinPartitions("_order")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
    # FileStreamSource orders files by modification time; a single write
    # job stamps them all identically and the tie-break is not part
    # order (observed: reverse). Stamp strictly increasing mtimes in
    # part-number order so replay follows event time.
    parts = sorted(p for p in os.listdir(path) if p.startswith("part-"))
    base = time.time() - len(parts)
    for i, p in enumerate(parts):
        ts = base + i
        os.utime(os.path.join(path, p), (ts, ts))
