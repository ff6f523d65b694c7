"""Materialized dedup index: build once, probe a batch — the shape the
in-query incremental operators promise for warehouse scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import load_table
from realtime_event_streaming_spark.operators.dedup import (
    probe_dedup_index,
    write_dedup_index,
)

SF = "/root/testdata/sf0.001"


def test_index_probe_classifies_exact_near_and_fresh(spark, tmp_path):
    path = str(tmp_path / "index")
    write_dedup_index(spark, SF, path)

    docs = load_table(spark, SF, "documents")
    exact_dup = docs.where("doc_id = 42").select(
        F.lit(9001).alias("doc_id"), "text"
    )
    near_dup = docs.where("doc_id = 43").select(
        F.lit(9002).alias("doc_id"),
        F.concat("text", F.lit(" qq zz")).alias("text"),
    )
    fresh = spark.createDataFrame(
        [(9003, " ".join(f"zz{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    batch = exact_dup.unionByName(near_dup).unionByName(fresh)

    out = {
        r.doc_id: (r.exact_dup, r.near_dup)
        for r in probe_dedup_index(spark, path, batch).collect()
    }
    # verbatim re-send: both detectors; token-appended re-send: only
    # the fuzzy one; novel text: neither
    assert out == {
        9001: (True, True),
        9002: (False, True),
        9003: (False, False),
    }
