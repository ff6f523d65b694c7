#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing testdata dir.

``python scripts/synth_sf.py --src /root/testdata/sf0.1 --dst /tmp/rtes_sf1
--factor 10`` writes a 10x copy of every table, deterministically (no
RNG), preserving the statistical shape each headline query depends on:

- **Star tables** (customer/supplier/part/orders/lineitem): replica i
  shifts every key by ``i * (max_key + 1)`` consistently across fact
  and dimension, so per-customer order counts, per-order line counts
  and join fan-outs are IDENTICAL to the source — the scaled corpus is
  ``factor`` independent copies of the same economy. Dates/prices are
  unchanged (a date-range predicate selects factor x the rows, exactly
  what a bigger warehouse does).
- **events**: replica i shifts ``ts`` by ``i * (span + 1 minute)`` —
  factor x the days at the SAME per-minute density (replicating
  timestamps instead would fake 10x-hotter minutes and flatter the
  rollup queries); user_ids are kept so users are longitudinal.
- **documents**: replica i suffixes every TOKEN with ``~i``. Verbatim
  copies would make every doc a 10-way near-duplicate and blow up the
  LSH candidate graph (measuring an artifact, not scale); per-token
  suffixing keeps every replica's shingle-frequency histogram
  identical to the source (so the derived rare-shingle cap scales
  honestly) while replicas stay mutually dissimilar, like a real 10x
  crawl.
- **embeddings**: replica i rotates each vector left by i positions —
  norm-preserving, direction-changing, so ANN sees genuinely new
  points with the same norm/label distribution.
- region/nation: copied as-is (they are O(1) dimensions at any SF).

Everything runs inside DuckDB (COPY ... TO parquet); nothing touches
/root/testdata. Used for the PERF.md sf1 scaling table — the oracle
gate stays on the driver's own fixtures.
"""

from __future__ import annotations

import argparse
import os

import duckdb

STAR_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}

#: which table owns each foreign key's span (max+1 shift base)
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
}


def synth(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() or 4)}")

    def src_t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def copy(select_sql: str, name: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{dst}/{name}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)"
        )

    # key spans (max + 1) for consistent replica shifting
    span: dict[str, int] = {}
    for tbl, col in set(KEY_OWNER.values()):
        span[col] = (
            con.execute(f"SELECT max({col}) + 1 FROM {src_t(tbl)}").fetchone()[0]
        )

    for name in ("region", "nation"):
        copy(f"SELECT * FROM {src_t(name)}", name)

    for name, _keys in STAR_KEYS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM {src_t(name)}"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in KEY_OWNER:
                _, owner_col = KEY_OWNER[c]
                exprs.append(f"{c} + i * {span[owner_col]} AS {c}")
            else:
                exprs.append(c)
        copy(
            f"SELECT {', '.join(exprs)} FROM {src_t(name)}, "
            f"UNNEST(generate_series(0, {factor - 1})) AS r(i)",
            name,
        )

    # events: shift replica timestamps past the source span (same
    # per-minute density, factor x the days)
    ev_bounds = con.execute(
        f"SELECT min(ts), max(ts), max(event_id) + 1 FROM {src_t('events')}"
    ).fetchone()
    ev_span_expr = (
        "(INTERVAL 1 MINUTE + (TIMESTAMP '" + str(ev_bounds[1]) + "'"
        " - TIMESTAMP '" + str(ev_bounds[0]) + "'))"
    )
    copy(
        f"SELECT event_id + i * {ev_bounds[2]} AS event_id, "
        f"       ts + i * {ev_span_expr} AS ts, "
        f"       user_id, event_type, value, props "
        f"FROM {src_t('events')}, "
        f"UNNEST(generate_series(0, {factor - 1})) AS r(i)",
        "events",
    )

    # documents: per-token ~i suffix keeps replicas mutually dissimilar
    # with an identical shingle-DF histogram per replica
    doc_span = con.execute(
        f"SELECT max(doc_id) + 1 FROM {src_t('documents')}"
    ).fetchone()[0]
    copy(
        f"SELECT doc_id + i * {doc_span} AS doc_id, "
        f"       CASE WHEN i = 0 THEN text ELSE array_to_string("
        f"         list_transform(string_split(text, ' '), w -> w || '~' || i),"
        f"         ' ') END AS text, "
        f"       lang, source, "
        f"       CASE WHEN i = 0 THEN n_chars ELSE len(array_to_string("
        f"         list_transform(string_split(text, ' '), w -> w || '~' || i),"
        f"         ' ')) END AS n_chars "
        f"FROM {src_t('documents')}, "
        f"UNNEST(generate_series(0, {factor - 1})) AS r(i)",
        "documents",
    )

    # embeddings: rotate replica vectors left by i (norm-preserving)
    vec_span = con.execute(
        f"SELECT max(vec_id) + 1 FROM {src_t('embeddings')}"
    ).fetchone()[0]
    copy(
        f"SELECT vec_id + i * {vec_span} AS vec_id, "
        f"       CASE WHEN i = 0 THEN embedding ELSE "
        f"         list_concat(embedding[i + 1:], embedding[1:i]) END "
        f"         AS embedding, "
        f"       label "
        f"FROM {src_t('embeddings')}, "
        f"UNNEST(generate_series(0, {factor - 1})) AS r(i)",
        "embeddings",
    )
    con.close()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    synth(args.src, args.dst, args.factor)
    con = duckdb.connect()
    for t in sorted(os.listdir(args.dst)):
        if t.endswith(".parquet"):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{args.dst}/{t}')"
            ).fetchone()[0]
            print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
