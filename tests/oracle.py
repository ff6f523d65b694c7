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
import pyarrow as pa

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


# -- Type-class parity ------------------------------------------------
#
# The driver's value-hasher is TYPE-SENSITIVE: round 2 proved that a
# DuckDB HUGEINT (int128) sum hashes differently from Spark's BIGINT
# even at identical values (pii_scan, CORRECTNESS_r02). Python-side
# canonicalization can't see that (fetchall() yields plain ints for
# both), so we additionally compare the engines' *declared* types,
# reduced to coarse classes. Any oracle whose sum()/count() lands in
# int128/decimal while Spark emits long fails HERE before it fails in
# the driver artifact. Integer widths <= 64 are treated as one class
# (the driver's 50-row history shows no failures from int32 vs int64);
# int128 and decimal are distinct classes by design.

def _arrow_type_class(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int" if t.bit_width <= 64 else "int128"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        # DuckDB HUGEINT arrives as decimal128(38,0); true decimals
        # carry (precision, scale) — the driver's value-hash is
        # decimal-PRECISION-sensitive (benford_digit_census, r7: values
        # bit-identical, Spark DECIMAL(4,4) vs DuckDB DECIMAL(5,4),
        # hash_match false), so a coarse "decimal" class here let the
        # local sim pass where the driver failed.
        if t.scale == 0 and t.precision >= 38:
            return "int128"
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_class(t.value_type)}>"
    return str(t)


def _spark_type_class(dtype: str) -> str:
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if d in ("double", "float"):
        return "float"
    if d == "boolean":
        return "bool"
    if d == "string":
        return "str"
    if d == "binary":
        return "bytes"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "timestamp"
    if d.startswith("decimal"):
        # Keep (precision,scale) — see _arrow_type_class. Spark prints
        # e.g. "decimal(4,4)"; normalize spacing.
        return d.replace(" ", "")
    if d.startswith("array<"):
        return f"list<{_spark_type_class(d[6:-1])}>"
    return d


def type_mismatches(name: str, df, con, oracle: str) -> list[str]:
    """Compare Spark vs DuckDB declared column types by coarse class."""
    spark_classes = {c: _spark_type_class(t) for c, t in df.dtypes}
    duck_schema = con.sql(oracle).limit(0).arrow().schema
    duck_classes = {f.name: _arrow_type_class(f.type) for f in duck_schema}
    out = []
    for c in sorted(set(spark_classes) & set(duck_classes)):
        if spark_classes[c] != duck_classes[c]:
            out.append(
                f"{name}: column {c!r} type-class spark="
                f"{spark_classes[c]} duck={duck_classes[c]} — the "
                f"driver's hasher is type-sensitive; cast the oracle"
            )
    return out


def compare(name: str, df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    problems.extend(type_mismatches(name, df, con, oracle))
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
