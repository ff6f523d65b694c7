"""Local replica of the driver's DuckDB-oracle differential check.

The driver compares each Spark query against its oracle SQL via
row-count + schema + order-insensitive value-hash. This harness applies
the same discipline (strict equality after canonicalization) so any
engine-difference shows up in `pytest` before it shows up in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb

from realtime_event_streaming_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out)


def spark_result(df) -> tuple[list[str], list[tuple]]:
    rows = df.collect()
    return list(df.columns), [tuple(r) for r in rows]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    rel = con.sql(sql)
    return list(rel.columns), rel.fetchall()


def compare(name: str, df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, oracle)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [
            (a, b) for a, b in zip(sc, dc) if a != b
        ][:3]
        only_s = [r for r in sc if r not in set(dc)][:3]
        only_d = [r for r in dc if r not in set(sc)][:3]
        problems.append(
            f"{name}: value mismatch; first zipped diffs={diffs}; "
            f"spark-only={only_s}; duck-only={only_d}"
        )
    return problems
