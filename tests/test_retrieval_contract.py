"""Deployment contracts for the PQ re-rank operating point.

`pq_rerank_tuned` ships the MEASURED (nprobe, shortlist) point the
sweep found (scripts/pq_recall_sweep.py; PERF.md curve). These tests
pin the two claims that justify shipping it: it meets the recall
target at the sweep's measurement scale, and it is strictly cheaper
on the ADC-candidate side than the FAISS-default point. The recall
contract runs against the DuckDB restatement at sf0.1 (the full
registry's oracle parity pins spark == oracle, so the restatement IS
the registered query's semantics — and DuckDB evaluates the heavy
self-join far faster than a test-budget Spark run would).
"""

from __future__ import annotations

import os

from realtime_event_streaming_spark.operators.retrieval import (
    TUNED_NPROBE,
    TUNED_SHORTLIST,
    _ivfpq_ctes,
    _rerank_recall_duck,
)
from tests.oracle import duck_connection

SWEEP_SF = os.environ.get("ORACLE_SWEEP_SF", "/root/testdata/sf0.1")


def test_tuned_point_meets_recall_contract():
    """Mean recall@5 of the registered tuned point must be >= 0.8 at
    the sweep's measurement scale — the published deployment claim
    (PERF.md: nprobe=1/shortlist=200 measures exactly 0.80)."""
    con = duck_connection(SWEEP_SF)
    rows = con.sql(
        _rerank_recall_duck(TUNED_NPROBE, TUNED_SHORTLIST)
    ).fetchall()
    assert rows, "recall eval returned no rows"
    mean = sum(r[2] for r in rows) / len(rows)
    assert mean >= 0.8, f"tuned-point mean recall@5 {mean} < 0.8"


def test_tuned_point_is_cheaper_than_default():
    """The tuned point's candidate-generation cost (ADC-scored rows)
    must be strictly below the FAISS-default point's — the other half
    of the sweep's conclusion (recall comes from shortlist depth, not
    cell fan-out)."""
    con = duck_connection(SWEEP_SF)

    def adc_rows(nprobe):
        q = f"WITH {_ivfpq_ctes(nprobe)} SELECT count(*) FROM adc"
        return con.sql(q).fetchone()[0]

    tuned, default = adc_rows(TUNED_NPROBE), adc_rows(None)
    assert tuned < default, (tuned, default)


def test_graph_ann_meets_recall_floor():
    """`graph_ann_beam`'s beam width is sized by a measured sweep
    (B=32 -> 0.68, B=48 -> 0.78, B=64 -> 0.84 at sf0.1); the shipped
    point must stay >= 0.8 mean recall@5 at the sweep scale. Runs the
    DuckDB restatement (oracle parity pins spark == oracle)."""
    from realtime_event_streaming_spark.operators.similarity import (
        _GRAPH_RECALL_DUCK,
    )

    con = duck_connection(SWEEP_SF)
    rows = con.execute(_GRAPH_RECALL_DUCK).fetchall()
    assert rows, "recall eval returned no rows"
    mean = sum(r[2] for r in rows) / len(rows)
    assert mean >= 0.8, f"graph ANN mean recall@5 {mean} < 0.8"


def test_graph_ann_sharded_meets_recall_floor():
    """`graph_ann_sharded` splits the flat contract budget across 4
    shards, which COSTS recall inside the beam rule's envelope
    (measured 0.70 at sf0.1 vs flat 0.84 — the scatter-gather spends
    3/4 of the budget on non-owning shards; the form wins only PAST
    the envelope, PERF.md round 14). This floors the shipped 4x16
    point at 0.65 so a regression in the shard build (e.g. an edge
    leaking across shards, which would burn budget on wrong-shard
    routing) shows up as a recall drop. DuckDB restatement + exact
    arm (oracle parity pins spark == oracle)."""
    from realtime_event_streaming_spark.operators.similarity import (
        _GRAPH_ANN_SHARDED_DUCK,
        N_QUERIES,
        TOPK,
    )

    con = duck_connection(SWEEP_SF)
    got: dict[int, set[int]] = {}
    for qid, _rank, nid, _cos in con.execute(
        _GRAPH_ANN_SHARDED_DUCK
    ).fetchall():
        got.setdefault(qid, set()).add(nid)
    truth: dict[int, set[int]] = {}
    for qid, nid in con.sql(
        f"""
        WITH vecs AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS norm
          FROM embeddings
        ),
        q AS (SELECT * FROM vecs WHERE vec_id < {N_QUERIES}),
        s AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
                 list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
          FROM q JOIN vecs c ON c.vec_id <> q.vec_id
        )
        SELECT qid, nid FROM (
          SELECT qid, nid, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, nid) AS rn
          FROM s) WHERE rn <= {TOPK}
        """
    ).fetchall():
        truth.setdefault(qid, set()).add(nid)
    assert truth, "exact arm returned no rows"
    mean = sum(
        len(got.get(q, set()) & truth[q]) / TOPK for q in truth
    ) / len(truth)
    assert mean >= 0.65, f"sharded graph ANN mean recall@5 {mean} < 0.65"


def test_sharded_per_shard_rule_meets_recall_floor(spark):
    """The promoted per-shard rule width (round-14 verdict item 4:
    `probe_nsw_sharded_index(beam_width="per-shard-rule")`, sizing
    each shard's beam by `nsw_sharded_beam_width_for` — the flat
    n^0.6 rule on the SHARD size) must hold a high floor at the sweep
    scale. At sf0.1 the per-shard corpora (2000/4 = 500) sit below
    the rule's contract point, so the rule floors to B_s = 64 — a 4x
    budget premium over the contract 4x16 point (the same
    budget-premium trade the 200k measurement quantified at 2.3x vs
    the flat rule for recall 0.786 > every flat arm; PERF.md round
    14). Measured here: 1.000; floored at 0.9 so a routing or rule
    regression (e.g. the width silently falling back to the split
    default) is a test failure, not a silent recall drop. Runs the
    REAL serving path — materialized index + DPP probe — so the
    option's plumbing is covered end-to-end."""
    import duckdb
    import pyspark.sql.functions as F

    from realtime_event_streaming_spark.operators.similarity import (
        LSH_BITS,
        N_QUERIES,
        TOPK,
        _vectors,
        nsw_sharded_beam_width_for,
        probe_nsw_sharded_index,
        write_nsw_sharded_index,
    )

    import tempfile

    path = tempfile.mkdtemp(prefix="shrule_floor_")
    try:
        write_nsw_sharded_index(spark, SWEEP_SF, path, bucket_bits=LSH_BITS)
        n = spark.read.parquet(f"{path}/vecs").count()
        # the rule must floor at the contract width below the contract
        # point — per-shard corpora here are inside the envelope
        assert nsw_sharded_beam_width_for(n) >= 64
        qs = (
            _vectors(spark, SWEEP_SF)
            .where(F.col("vec_id") < N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("norm").alias("qnorm"),
            )
        )
        rows = probe_nsw_sharded_index(
            spark, path, qs, beam_width="per-shard-rule"
        ).collect()
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    with duckdb.connect() as con:
        truth: dict[int, set[int]] = {}
        for qid, nid in con.sql(
            f"""
            WITH vecs AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[])) AS norm
              FROM read_parquet('{SWEEP_SF}/embeddings.parquet')
            ),
            q AS (SELECT * FROM vecs WHERE vec_id < {N_QUERIES}),
            s AS (
              SELECT q.vec_id AS qid, c.vec_id AS nid,
                     list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
              FROM q JOIN vecs c ON c.vec_id <> q.vec_id
            )
            SELECT qid, nid FROM (
              SELECT qid, nid, row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC, nid) AS rn
              FROM s) WHERE rn <= {TOPK}
            """
        ).fetchall():
            truth.setdefault(qid, set()).add(nid)
    assert truth, "exact arm returned no rows"
    mean = sum(
        len(got.get(q, set()) & truth[q]) / TOPK for q in truth
    ) / len(truth)
    assert mean >= 0.9, f"per-shard-rule mean recall@5 {mean} < 0.9"
