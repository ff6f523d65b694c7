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


def test_merge_then_probe_flags_new_batch(spark, tmp_path):
    """Maintenance round trip: a novel page is invisible to the base
    index, admitted via merge, then its re-send flags on BOTH
    detectors — the index no longer goes stale after one cycle."""
    from realtime_event_streaming_spark.operators.dedup import (
        merge_dedup_index,
    )

    path = str(tmp_path / "index")
    write_dedup_index(spark, SF, path)
    novel = spark.createDataFrame(
        [(9100, " ".join(f"m{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    pre = probe_dedup_index(spark, path, novel).collect()[0]
    assert (pre.exact_dup, pre.near_dup) == (False, False)

    merge_dedup_index(spark, path, novel)
    resend = novel.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    post = probe_dedup_index(spark, path, resend).collect()[0]
    assert (post.exact_dup, post.near_dup) == (True, True)


def test_compact_reduces_files_and_preserves_probe(spark, tmp_path):
    """Compaction is the background-merge step: after several appended
    batches it folds the per-batch file sets into per-partition files
    WITHOUT changing any probe answer."""
    from realtime_event_streaming_spark.io import compact_index_table
    from realtime_event_streaming_spark.operators.dedup import (
        merge_dedup_index,
    )

    path = str(tmp_path / "index")
    write_dedup_index(spark, SF, path)
    for k in range(3):
        batch = spark.createDataFrame(
            [(9200 + k, " ".join(f"c{k}t{i}" for i in range(20)))],
            "doc_id long, text string",
        )
        merge_dedup_index(spark, path, batch)

    probe = spark.createDataFrame(
        [
            (9300, " ".join(f"c1t{i}" for i in range(20))),  # merged batch
            (9301, " ".join(f"zz{i}" for i in range(20))),  # novel
        ],
        "doc_id long, text string",
    )
    before = sorted(
        map(tuple, probe_dedup_index(spark, path, probe).collect())
    )
    stats_bands = compact_index_table(
        spark, f"{path}/minhash_bands", "band_idx"
    )
    stats_hash = compact_index_table(spark, f"{path}/content_hash")
    assert stats_bands["files_after"] < stats_bands["files_before"]
    assert stats_hash["files_after"] < stats_hash["files_before"]
    after = sorted(
        map(tuple, probe_dedup_index(spark, path, probe).collect())
    )
    assert before == after
    by_id = {r[0]: r[1:] for r in after}
    assert by_id[9300] == (True, True) and by_id[9301] == (False, False)


def test_bucketed_probe_partitions_read(spark, tmp_path):
    """The opt-in interactive band layout (round-14 verdict item 5,
    promoted from the probe docstring to code): under
    `write_dedup_index(bucket_bands=True)` the probe's band scan must
    (a) return results IDENTICAL to the default layout on the same
    batch, (b) keep live executed-plan DPP, and (c) MEASURE as a
    pruned read. Spark prunes each partition COLUMN independently (an
    IN filter on band_idx and another on hb — the PRODUCT of the
    per-column value sets, not the tuple set), so a b-doc batch reads
    at most n_bands x min(b x n_bands, buckets) leaves: measured 112
    of 512 (22%) for this 2-doc batch — far below the populated leaf
    count, which makes the runtime partitions-read metric the
    non-vacuous check (the test_ivf_probe_partitions_read_runtime
    discipline)."""
    from realtime_event_streaming_spark.operators.dedup import (
        N_HASHES,
        merge_dedup_index,
        write_dedup_index as _write,
    )
    from tests.test_ann_index import _executed_file_scans

    n_bands = N_HASHES // 2
    flat_path = str(tmp_path / "flat")
    bkt_path = str(tmp_path / "bucketed")
    _write(spark, SF, flat_path)
    _write(spark, SF, bkt_path, bucket_bands=True)

    docs = load_table(spark, SF, "documents")
    batch = (
        docs.where("doc_id = 42")
        .select(F.lit(9001).alias("doc_id"), "text")
        .unionByName(
            docs.where("doc_id = 43").select(
                F.lit(9002).alias("doc_id"),
                F.concat("text", F.lit(" qq zz")).alias("text"),
            )
        )
    )
    # (a) layout changes WHERE the bytes live, never an answer
    flat_res = sorted(
        map(tuple, probe_dedup_index(spark, flat_path, batch).collect())
    )
    df = probe_dedup_index(spark, bkt_path, batch)
    bkt_res = sorted(map(tuple, df.collect()))
    assert bkt_res == flat_res and bkt_res

    # vacuity guard: the corpus must populate far more (band_idx, hb)
    # leaves than the batch can touch
    populated = (
        spark.read.parquet(f"{bkt_path}/minhash_bands")
        .select("band_idx", "hb")
        .distinct()
        .count()
    )
    assert populated > 4 * n_bands, ("fixture too small", populated)

    # (b) + (c) on the EXECUTED plan: the partitioned band scan read
    # only the batch's buckets
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression(true)" not in plan, plan[:3000]
    scans = [m for m in _executed_file_scans(df) if "numPartitions" in m]
    assert scans, "no partitioned band scan executed"
    # product bound: all n_bands band_idx values x the batch's <= 2 x
    # n_bands distinct hb values; and strictly below the populated
    # leaf count (the unpruned read)
    for m in scans:
        assert 0 < m["numPartitions"] <= n_bands * 2 * n_bands, m
        assert m["numPartitions"] < populated // 2, m

    # maintenance preserves the layout: a merged batch lands bucketed
    # and its re-send still flags
    novel = spark.createDataFrame(
        [(9200, " ".join(f"bb{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    merge_dedup_index(spark, bkt_path, novel)
    assert "hb" in spark.read.parquet(f"{bkt_path}/minhash_bands").columns
    resend = novel.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    post = probe_dedup_index(spark, bkt_path, resend).collect()[0]
    assert (post.exact_dup, post.near_dup) == (True, True)


def test_layout_rewrite_same_path_evicts_cached_schema(spark, tmp_path):
    """Round-15 verdict item 1: `read_index_parquet` caches schemas per
    bare path, and `write_dedup_index` can rewrite the SAME path with a
    different layout (± the `hb` partition column). Without eviction the
    probe after a bucketed→flat rewrite would read with the stale
    bucketed schema, take the bucketed branch, and join on a column
    that no longer exists on disk. The writers must evict, so both
    rewrite directions keep returning the layout-correct answer."""
    from realtime_event_streaming_spark.operators.dedup import (
        write_dedup_index as _write,
    )

    path = str(tmp_path / "index")
    docs = load_table(spark, SF, "documents")
    batch = docs.where("doc_id = 42").select(
        F.lit(9001).alias("doc_id"), "text"
    )

    # flat reference answer from an untouched path
    ref_path = str(tmp_path / "ref")
    _write(spark, SF, ref_path)
    ref = sorted(map(tuple, probe_dedup_index(spark, ref_path, batch).collect()))
    assert ref  # the re-sent doc must flag

    # bucketed write + probe caches the (band_idx, hb) schema for `path`
    _write(spark, SF, path, bucket_bands=True)
    first = sorted(map(tuple, probe_dedup_index(spark, path, batch).collect()))
    assert first == ref

    # rewrite the SAME path flat: the probe must see the flat layout
    # (stale cached schema would error or silently return no dups)
    _write(spark, SF, path, bucket_bands=False)
    assert "hb" not in spark.read.parquet(f"{path}/minhash_bands").columns
    after_flat = sorted(
        map(tuple, probe_dedup_index(spark, path, batch).collect())
    )
    assert after_flat == ref

    # and back: flat→bucketed must re-detect the bucketed branch
    _write(spark, SF, path, bucket_bands=True)
    after_bkt = probe_dedup_index(spark, path, batch)
    plan = after_bkt._jdf.queryExecution().executedPlan().toString()
    assert sorted(map(tuple, after_bkt.collect())) == ref
    assert "dynamicpruningexpression(true)" not in plan, plan[:3000]
