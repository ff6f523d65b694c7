#!/usr/bin/env python
"""Recall-vs-cost sweep for the PQ re-rank tail: (nprobe, shortlist)
grid over `_reranked`, measured against the exact squared-L2 top-5.

Closes the round-7 open question: `pq_rerank_recall` isolated the
remaining recall gap (0.60 @ the registered nprobe=2/shortlist=50
operating point vs 0.86 for IVF-full-vector) to CANDIDATE GENERATION
— this sweep shows which knob buys it back and at what cost. Cost is
reported two ways: candidate rows scored by ADC (the scan cost a
cluster pays — rows in probed cells x queries) and local wall time.

Usage: python scripts/pq_recall_sweep.py [sf_dir]
Writes one line per grid point — the PERF.md curve source.
"""

import sys
import time

import duckdb

sys.path.insert(0, ".")
from realtime_event_streaming_spark.operators import retrieval  # noqa: E402
from realtime_event_streaming_spark.operators.retrieval import (  # noqa: E402
    PQ_NQ,
    PQ_TOPK,
    _ivfpq_ranked,
    _reranked,
)
from realtime_event_streaming_spark.session import get_spark  # noqa: E402

NPROBES = (1, 2, 4, 8)       # 8 = every coarse cell (no pruning)
SHORTLISTS = (50, 100, 200)


def exact_truth(sf_dir):
    q = f"""
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM '{sf_dir}/embeddings.parquet'
    ),
    d AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             list_dot_product(
               list_transform(generate_series(1, 64), i -> q.v[i] - c.v[i]),
               list_transform(generate_series(1, 64), i -> q.v[i] - c.v[i]))
               AS dd
      FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {PQ_NQ}
    )
    SELECT qid, nid FROM (
      SELECT qid, nid, row_number() OVER (PARTITION BY qid
             ORDER BY round(dd, 4), nid) AS rn FROM d
    ) WHERE rn <= {PQ_TOPK}
    """
    truth = {}
    for qid, nid in duckdb.sql(q).fetchall():
        truth.setdefault(qid, set()).add(nid)
    return truth


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pq-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    truth = exact_truth(sf_dir)
    denom = sum(len(v) for v in truth.values())

    for nprobe in NPROBES:
        # candidate-generation cost: ADC-scored rows at this nprobe
        n_cand = _ivfpq_ranked(spark, sf_dir, nprobe=nprobe).count()
        for shortlist in SHORTLISTS:
            t0 = time.perf_counter()
            rows = (
                _reranked(spark, sf_dir, nprobe=nprobe, shortlist=shortlist)
                .where(retrieval.F.col("rnk") <= PQ_TOPK)
                .select("query_id", "neighbor_id")
                .collect()
            )
            wall = time.perf_counter() - t0
            hits = sum(
                1 for r in rows if r.neighbor_id in truth.get(r.query_id, ())
            )
            print(
                f"sf_dir={sf_dir} nprobe={nprobe} shortlist={shortlist} "
                f"recall_at_{PQ_TOPK}={hits / denom:.3f} "
                f"adc_candidates={n_cand} wall_sec={wall:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
