"""Invariants of scripts/synth_sf.py — the sf1 scaling-bench generator.

The PERF.md sf1 table is only as honest as the synthesizer: replicas
must preserve per-key join fan-outs, documents must NOT become 10-way
near-duplicates (that would measure an LSH artifact), and embeddings
must keep their norms. Pinned here at factor=2 over sf0.001 (DuckDB
only, no Spark session needed)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"
ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("synth_sf") / "sf2x"
    subprocess.run(
        [
            sys.executable,
            str(ROOT / "scripts" / "synth_sf.py"),
            "--src",
            SRC,
            "--dst",
            str(dst),
            "--factor",
            "2",
        ],
        check=True,
        capture_output=True,
    )
    return str(dst)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_row_counts_scale_by_factor(synth_dir, duck):
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings"):
        n_src = duck.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        n_dst = duck.execute(
            f"SELECT count(*) FROM '{synth_dir}/{t}.parquet'"
        ).fetchone()[0]
        assert n_dst == 2 * n_src, t
    for t in ("region", "nation"):
        n_src = duck.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        n_dst = duck.execute(
            f"SELECT count(*) FROM '{synth_dir}/{t}.parquet'"
        ).fetchone()[0]
        assert n_dst == n_src, t


def test_keys_stay_unique_and_fanouts_preserved(synth_dir, duck):
    # primary keys stay unique after replica shifting
    for t, k in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")):
        n, d = duck.execute(
            f"SELECT count(*), count(DISTINCT {k}) "
            f"FROM '{synth_dir}/{t}.parquet'"
        ).fetchone()
        assert n == d, t
    # per-customer order-count distribution is identical to the source
    # (each replica is an independent copy of the same economy)
    q = """
    SELECT c, count(*) FROM (
      SELECT o_custkey, count(*) AS c FROM '{d}/orders.parquet'
      GROUP BY o_custkey
    ) GROUP BY c ORDER BY c
    """
    src = duck.execute(q.format(d=SRC)).fetchall()
    dst = duck.execute(q.format(d=synth_dir)).fetchall()
    assert dst == [(c, 2 * n) for c, n in src]


def test_document_replicas_are_not_near_duplicates(synth_dir, duck):
    # replica texts share ZERO 3-gram shingles with the originals
    # (per-token suffixing): exact-dup count must equal the source's,
    # not explode by the replica factor
    q = "SELECT count(*) - count(DISTINCT md5(text)) FROM '{d}/documents.parquet'"
    dup_src = duck.execute(q.format(d=SRC)).fetchone()[0]
    dup_dst = duck.execute(q.format(d=synth_dir)).fetchone()[0]
    assert dup_dst == 2 * dup_src
    # spot-check shingle disjointness for one replicated doc
    overlap = duck.execute(f"""
      WITH mx AS (SELECT max(doc_id) + 1 AS s FROM '{SRC}/documents.parquet'),
      orig AS (
        SELECT string_split(text, ' ') AS tk
        FROM '{synth_dir}/documents.parquet' WHERE doc_id = 0
      ),
      repl AS (
        SELECT string_split(text, ' ') AS tk
        FROM '{synth_dir}/documents.parquet', mx WHERE doc_id = mx.s
      )
      SELECT count(*) FROM (
        SELECT unnest(tk) AS w FROM orig
        INTERSECT
        SELECT unnest(tk) AS w FROM repl
      )
    """).fetchone()[0]
    assert overlap == 0


def test_embedding_rotation_preserves_norms(synth_dir, duck):
    bad = duck.execute(f"""
      WITH mx AS (SELECT max(vec_id) + 1 AS s FROM '{SRC}/embeddings.parquet'),
      pairs AS (
        SELECT o.vec_id,
               sqrt(list_dot_product(o.embedding::DOUBLE[],
                                     o.embedding::DOUBLE[])) AS n0,
               sqrt(list_dot_product(r.embedding::DOUBLE[],
                                     r.embedding::DOUBLE[])) AS n1,
               len(r.embedding) AS dim
        FROM '{synth_dir}/embeddings.parquet' o
        JOIN mx ON true
        JOIN '{synth_dir}/embeddings.parquet' r
          ON r.vec_id = o.vec_id + mx.s
        WHERE o.vec_id < mx.s
      )
      SELECT count(*) FROM pairs
      WHERE abs(n0 - n1) > 1e-6 OR dim != 64
    """).fetchone()[0]
    assert bad == 0


def test_events_extend_time_not_density(synth_dir, duck):
    src_span = duck.execute(
        f"SELECT min(ts), max(ts) FROM '{SRC}/events.parquet'"
    ).fetchone()
    dst_span = duck.execute(
        f"SELECT min(ts), max(ts) FROM '{synth_dir}/events.parquet'"
    ).fetchone()
    assert dst_span[0] == src_span[0]
    assert dst_span[1] > src_span[1]
    # per-minute event counts: the busiest minute must not scale with
    # the factor (replicas land in NEW minutes)
    q = """
    SELECT max(c) FROM (
      SELECT date_trunc('minute', ts) AS m, count(*) AS c
      FROM '{d}/events.parquet' GROUP BY m
    )
    """
    assert (
        duck.execute(q.format(d=synth_dir)).fetchone()[0]
        == duck.execute(q.format(d=SRC)).fetchone()[0]
    )
