#!/usr/bin/env python
"""Measure recall@5 / MRR-ish hit quality of the PQ family variants
against the exact squared-L2 top-5, at a given SF dir.

Usage: python scripts/pq_recall_compare.py [sf_dir ...]
Writes one line per (sf, variant) — the PERF.md residual-vs-raw
comparison row source."""

import sys

import duckdb

sys.path.insert(0, ".")
from realtime_event_streaming_spark.registry import load_all
from realtime_event_streaming_spark.session import get_spark

VARIANTS = [
    "pq_adc_topk",
    "ivf_pq_topk",
    "residual_ivf_pq_topk",
    "pq_rerank_topk",
]
NQ, K = 10, 5


def exact_top5(sf_dir):
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
      WHERE q.vec_id < {NQ}
    )
    SELECT qid, nid FROM (
      SELECT qid, nid, row_number() OVER (PARTITION BY qid
             ORDER BY round(dd, 4), nid) AS rn FROM d
    ) WHERE rn <= {K}
    """
    truth = {}
    for qid, nid in duckdb.sql(q).fetchall():
        truth.setdefault(qid, set()).add(nid)
    return truth


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark("pq-recall")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    for sf_dir in dirs:
        truth = exact_top5(sf_dir)
        for name in VARIANTS:
            rows = reg[name].spark_fn(spark, sf_dir).collect()
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            recalls = [
                len(got.get(q, set()) & truth[q]) / K for q in truth
            ]
            print(
                f"{sf_dir} {name}: recall@{K} = "
                f"{sum(recalls) / len(recalls):.3f}"
            )


if __name__ == "__main__":
    main()
