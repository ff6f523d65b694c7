"""Cross-engine expression snippets (Spark SQL + DuckDB).

The driver's correctness gate runs each Spark query next to a DuckDB
oracle over the same parquet. Every *derived* column must therefore be
computable identically in both dialects. This module centralizes those
expressions so the Spark implementation and the oracle SQL can never
drift apart.

The driver's synthetic ``events`` table plays the reference's
``clicks_raw`` (reference: sql/clickhouse_tables.sql:5-20). It lacks the
``country``/``device``/``page`` dimensions, so we derive deterministic
stand-ins from ``user_id``/``props`` — weighting is irrelevant for the
engine; the *operators* (multi-dim grouping, distinct counts, JSON
extraction) are what is being rebuilt.
"""

from __future__ import annotations

# -- portable snippets (valid in BOTH Spark SQL and DuckDB SQL) ----------

#: ISO-2 country stand-in (reference: producer/produce.py:40-49 has 8
#: weighted countries; we keep the same 8 values, uniform by user hash).
COUNTRY_SQL = (
    "CASE user_id % 8 WHEN 0 THEN 'US' WHEN 1 THEN 'IN' WHEN 2 THEN 'DE' "
    "WHEN 3 THEN 'FR' WHEN 4 THEN 'JP' WHEN 5 THEN 'GB' WHEN 6 THEN 'CA' "
    "ELSE 'AU' END"
)

#: Device stand-in (reference: producer/produce.py:52-56 — mobile .60,
#: desktop .35, tablet .05; the modulo buckets reproduce 12/7/1 of 20).
DEVICE_SQL = (
    "CASE WHEN user_id % 20 < 12 THEN 'mobile' "
    "WHEN user_id % 20 < 19 THEN 'desktop' ELSE 'tablet' END"
)

#: Page-id stand-in extracted from the JSON ``props`` column (exercises
#: the reference's JSON parse surface, StreamJob.java:219,234).
#: Portable: regexp_extract has the same 3-arg form in both engines and
#: the generator always writes '{"k": N}'.
PAGE_K_SQL = "try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT)"

#: 5-minute bucket via explicit epoch arithmetic — unambiguous in both
#: engines (no reliance on time_bucket/window origin conventions).
BUCKET5M_SPARK = (
    "timestamp_micros((unix_micros(cast({ts} as timestamp)) div 300000000)"
    " * 300000000)"
)
BUCKET5M_DUCK = "make_timestamp((epoch_us({ts}) // 300000000) * 300000000)"

#: Render a timestamp as a canonical string (second precision) — output
#: time-bucket columns as strings so the value hash cannot depend on
#: either engine's timestamp rendering or timezone handling.
TS_FMT_SPARK = "date_format({col}, 'yyyy-MM-dd HH:mm:ss')"
TS_FMT_DUCK = "strftime({col}, '%Y-%m-%d %H:%M:%S')"

#: Epoch seconds (integer, truncating) for span arithmetic.
EPOCH_S_SPARK = "(unix_micros(cast({col} as timestamp)) div 1000000)"
EPOCH_S_DUCK = "(epoch_us({col}) // 1000000)"

#: First 64 bits of md5 kept as a *hex string* — a portable total order
#: for MinHash/fingerprinting without cross-engine integer-parsing
#: differences (both engines: md5() -> lowercase hex).
MD5_64_SQL = "substr(md5({x}), 1, 16)"


def sub_checked(sql: str, *subs: tuple[str, str]) -> str:
    """Targeted SQL substitution with a presence check.

    Used both for dialect rewrites (see :func:`to_spark_sql`) and for
    template instantiation of shared SQL fragments (parameter renames
    like ``vv`` -> ``q.v``, scope renames like ``FROM documents`` ->
    ``FROM docs_u``). A blind ``str.replace`` is fragile: edit the
    body so a pattern no longer matches and the rewrite silently
    no-ops, shipping the un-rewritten text downstream (round-12
    ADVICE, found on `generation_diversity`). This helper makes every
    substitution self-checking: a missing pattern raises at import
    time instead of failing (or silently mis-computing) at run time.

    Substitutions apply IN ORDER against the partially-rewritten
    string, so later patterns may legitimately reference earlier
    replacements."""
    for old, new in subs:
        if old not in sql:
            raise ValueError(
                f"SQL substitution pattern {old!r} not found — the "
                "shared SQL body drifted from its rewrite"
            )
        sql = sql.replace(old, new)
    return sql


def to_spark_sql(sql: str, *subs: tuple[str, str]) -> str:
    """DuckDB->Spark dialect rewrite via :func:`sub_checked`.

    A handful of dual-dialect queries differ in one or two tokens
    (``//`` vs ``div``, ``quantile_cont`` vs ``percentile``); they
    derive the Spark statement from the shared body with targeted
    substitutions rather than maintaining two near-identical
    statements. Every substitution is presence-checked."""
    return sub_checked(sql, *subs)


def fmt_ts_spark(col: str) -> str:
    return TS_FMT_SPARK.format(col=col)


def fmt_ts_duck(col: str) -> str:
    return TS_FMT_DUCK.format(col=col)
