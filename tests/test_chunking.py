"""Structural invariants for the chunking / packing / corpus-prep
operators — properties the DuckDB parity check cannot state (it proves
engine agreement, not that the chunk geometry itself is right)."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_event_streaming_spark.io import register_views
from realtime_event_streaming_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    doc_chunks,
    sequence_pack,
)
from realtime_event_streaming_spark.operators.corpusprep import (
    SAMPLE_K,
    per_source_sample,
    text_normalize_roundtrip,
)

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    register_views(spark, SF, tables=("documents",))
    return spark.sql(
        "SELECT doc_id, source, size(split(text, ' ')) AS n_tok FROM documents"
    )


def test_chunks_tile_every_document(spark):
    """Chunks start every CHUNK_STRIDE tokens, all but the last are
    full CHUNK_TOKENS wide, and the last chunk's end lands exactly on
    the document's final token — so the windows cover the whole doc."""
    chunks = doc_chunks(spark, SF)
    toks = _doc_tokens(spark)
    j = chunks.join(toks, "doc_id")

    # every chunk lies inside the doc and is non-empty
    bad_width = j.where(
        (F.col("chunk_tokens") < 1) | (F.col("chunk_tokens") > CHUNK_TOKENS)
    ).count()
    assert bad_width == 0

    # non-last chunks are full width
    last = j.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    with_last = j.join(last, "doc_id")
    partial_inner = with_last.where(
        (F.col("chunk_idx") < F.col("last_idx"))
        & (F.col("chunk_tokens") != CHUNK_TOKENS)
    ).count()
    assert partial_inner == 0

    # the last chunk ends exactly at the last token
    open_tail = with_last.where(
        (F.col("chunk_idx") == F.col("last_idx"))
        & (
            F.col("chunk_idx") * CHUNK_STRIDE + F.col("chunk_tokens")
            != F.col("n_tok")
        )
    ).count()
    assert open_tail == 0


def test_chunk_index_dense_from_zero(spark):
    chunks = doc_chunks(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
        F.count("*").alias("n"),
    )
    holes = per_doc.where(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
    ).count()
    assert holes == 0


def test_packing_conserves_tokens_and_docs(spark):
    """Packing must not create or drop tokens/docs: per-source sums of
    the packed sequences equal the raw per-source totals, and sequence
    indices are dense from 0."""
    packed = sequence_pack(spark, SF)
    toks = _doc_tokens(spark)
    raw = toks.groupBy("source").agg(
        F.count("*").alias("raw_docs"), F.sum("n_tok").alias("raw_tokens")
    )
    got = packed.groupBy("source").agg(
        F.sum("n_docs").alias("packed_docs"),
        F.sum("n_tokens").alias("packed_tokens"),
        F.min("seq_idx").alias("lo"),
        F.max("seq_idx").alias("hi"),
        F.count("*").alias("n_seqs"),
    )
    j = raw.join(got, "source")
    bad = j.where(
        (F.col("raw_docs") != F.col("packed_docs"))
        | (F.col("raw_tokens") != F.col("packed_tokens"))
        | (F.col("lo") != 0)
        | (F.col("n_seqs") != F.col("hi") + 1)
    ).count()
    assert bad == 0


def test_normalize_restores_all_docs(spark):
    row = text_normalize_roundtrip(spark, SF).collect()[0]
    assert row.n_docs == 500
    assert row.n_case_corrupted > 0 and row.n_ws_corrupted > 0
    assert row.n_restored == row.n_docs


def test_per_source_sample_exact_k_distinct(spark):
    s = per_source_sample(spark, SF)
    per = s.groupBy("source").agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("nd")
    )
    assert per.where((F.col("n") != SAMPLE_K) | (F.col("nd") != SAMPLE_K)).count() == 0


def test_chunk_count_formula_edges(spark):
    """Boundary token counts: 1 token (degenerate doc), exactly one
    stride, stride+1 (first straddle), exactly CHUNK_TOKENS, and
    CHUNK_TOKENS+1 (first two-chunk doc). Checked against the closed
    form n_chunks = ceil(max(n - overlap, 1) / stride)."""
    import math

    from realtime_event_streaming_spark.operators.chunking import (
        _CHUNKS_SPARK,
    )

    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    cases = [1, 2, CHUNK_STRIDE, CHUNK_STRIDE + 1, CHUNK_TOKENS,
             CHUNK_TOKENS + 1, 2 * CHUNK_TOKENS, 100]
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)))
         for i, n in enumerate(cases)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("documents")
    got = {
        r.doc_id: r.n
        for r in spark.sql(
            f"SELECT doc_id, count(*) AS n FROM ({_CHUNKS_SPARK}) GROUP BY doc_id"
        ).collect()
    }
    for i, n in enumerate(cases):
        expect = math.ceil(max(n - overlap, 1) / CHUNK_STRIDE)
        assert got[i] == expect, (n, got[i], expect)


SF = "/root/testdata/sf0.001"


def test_mix_manifest_stage_kills_sum_to_input(spark):
    """Conservation across the composed admission chain: every input
    document is accounted for by exactly one fate (killed by the
    quality gate, killed by dedup survivorship, or kept) and every
    kept document lands in exactly one split — per source, no row
    lost or double-counted between stages."""
    from realtime_event_streaming_spark.operators.sampling import (
        pretraining_mix_manifest,
    )

    rows = pretraining_mix_manifest(spark, SF).collect()
    assert rows, "manifest must cover every source"
    for r in rows:
        assert r.n_input == r.drop_quality + r.drop_duplicate + r.n_kept, (
            f"{r.source}: stage kills must sum to input ({r})"
        )
        assert r.n_kept == r.n_train + r.n_val + r.n_test, (
            f"{r.source}: splits must partition the kept set ({r})"
        )
        # fill rate can exceed 1.0: a document straddling a sequence
        # boundary charges its overflow tokens to the sequence its
        # FIRST token lands in (sequence_pack semantics).
        if r.n_train > 0:
            assert r.n_train_sequences >= 1
            assert r.train_fill_rate > 0
        else:
            assert r.n_train_sequences == 0
            assert r.train_fill_rate == 0.0
    # the manifest's input census must equal the raw table plus the
    # planted duplicates (one copy of every 50th doc)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_planted = docs.where(F.col("doc_id") % 50 == 0).count()
    assert sum(r.n_input for r in rows) == n_docs + n_planted
    # the planted copies must actually exercise the dedup gate: every
    # planted doc whose text passes the quality gate is a duplicate
    # kill, so the column cannot be structurally zero
    assert sum(r.drop_duplicate for r in rows) > 0
