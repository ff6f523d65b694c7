"""Document chunking and sequence packing for LLM training pipelines.

Two preparation steps every pretraining data pipeline runs between
"curated corpus" and "training batches" (no counterpart in the
reference, which has no document processing — extension surface like
`operators/sampling.py`):

- **chunking**: split each document's token stream into fixed-size
  overlapping windows (CHUNK_TOKENS with CHUNK_STRIDE step, the
  sliding-window tokenizer-prep shape). Pure per-row ``explode`` of a
  ``sequence`` — no shuffle at all; at 100 TB this is a map-only stage
  that scales linearly with input splits.
- **packing**: concatenate documents (ordered deterministically within
  each source shard) and cut the concatenation into SEQ_LEN-token
  training sequences — the GPT-style "concat then chunk" packing. A
  single window cumulative sum per shard; the partition key (source)
  is the shard key, so at cluster scale each shard's window runs
  partition-local after one shuffle on source. For 100 TB, sub-shard
  the key ((source, file_bucket)) to bound per-partition row counts —
  the query shape is unchanged.

Tokens are whitespace tokens (matching `operators/textstats.token_stats`);
both engines split the same way, so counts agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from ..registry import register

CHUNK_TOKENS = 16
CHUNK_STRIDE = 12  # overlap = CHUNK_TOKENS - CHUNK_STRIDE = 4 tokens
SEQ_LEN = 256

#: number of sliding chunks for an n-token doc: ceil(max(n - overlap, 1) / stride)
_N_CHUNKS = (
    f"cast(ceil(greatest(n_tok - {CHUNK_TOKENS - CHUNK_STRIDE}, 1) "
    f"/ cast({CHUNK_STRIDE} AS DOUBLE)) AS INT)"
)

_CHUNKS_DUCK = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
chunks AS (
  SELECT doc_id, n_tok, tk,
         unnest(generate_series(0, {_N_CHUNKS} - 1)) AS chunk_idx
  FROM toks
)
SELECT doc_id,
       cast(chunk_idx AS BIGINT) AS chunk_idx,
       cast(least({CHUNK_TOKENS}, n_tok - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
         AS chunk_tokens,
       md5(array_to_string(
             list_slice(tk, chunk_idx * {CHUNK_STRIDE} + 1,
                        least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n_tok)),
             ' ')) AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_idx
"""

_CHUNKS_SPARK = f"""
WITH toks AS (
  SELECT doc_id, split(text, ' ') AS tk,
         size(split(text, ' ')) AS n_tok
  FROM documents
),
chunks AS (
  SELECT doc_id, n_tok, tk,
         explode(sequence(0, {_N_CHUNKS} - 1)) AS chunk_idx
  FROM toks
)
SELECT doc_id,
       cast(chunk_idx AS BIGINT) AS chunk_idx,
       cast(least({CHUNK_TOKENS}, n_tok - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
         AS chunk_tokens,
       md5(concat_ws(' ',
             slice(tk, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS})))
         AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_idx
"""


@register("doc_chunks", _CHUNKS_DUCK, tags=("chunking", "text"))
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_CHUNKS_SPARK)
doc_chunks.__doc__ = """Sliding-window token chunking: {CHUNK_TOKENS}-token windows with
    {CHUNK_STRIDE}-token stride over each document. Emits one row per
    chunk with its token count and an md5 of the chunk text (pinning
    the exact window *content*, not just the arithmetic). Map-only:
    explode of a per-row sequence, no shuffle.""".format(CHUNK_TOKENS=CHUNK_TOKENS, CHUNK_STRIDE=CHUNK_STRIDE)


def _pack_sql(len_fn: str, split_fn: str) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, {len_fn}({split_fn}(text, ' ')) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tok_before
  FROM toks
)
SELECT source,
       cast(floor(tok_before / cast({SEQ_LEN} AS DOUBLE)) AS BIGINT) AS seq_idx,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id
FROM cum
GROUP BY source, cast(floor(tok_before / cast({SEQ_LEN} AS DOUBLE)) AS BIGINT)
ORDER BY source, seq_idx
"""


@register("sequence_pack", _pack_sql("len", "string_split"), tags=("chunking",))
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_pack_sql("size", "split"))
sequence_pack.__doc__ = """Concat-and-chunk sequence packing: documents are concatenated in
    deterministic (source, doc_id) order and the token stream is cut
    into {SEQ_LEN}-token training sequences; a document belongs to the
    sequence its first token lands in. One cumulative-sum window per
    source shard, then a bounded group-by — the packing plan survives
    any corpus size because no state crosses shard boundaries.""".format(SEQ_LEN=SEQ_LEN)


def _pack_eff_sql(len_fn: str, split_fn: str) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, {len_fn}({split_fn}(text, ' ')) AS n_tok
  FROM documents
),
cum AS (
  SELECT source, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tok_before
  FROM toks
),
seqs AS (
  SELECT source,
         cast(floor(tok_before / cast({SEQ_LEN} AS DOUBLE)) AS BIGINT)
           AS seq_idx,
         cast(sum(n_tok) AS BIGINT) AS n_tokens
  FROM cum GROUP BY 1, 2
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_sequences,
       cast(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(cast(sum(n_tokens) AS DOUBLE)
             / (count(*) * {SEQ_LEN}), 4) AS fill_rate,
       cast(sum(CASE WHEN n_tokens > {SEQ_LEN} THEN n_tokens - {SEQ_LEN}
                     ELSE 0 END) AS BIGINT) AS overflow_tokens
FROM seqs GROUP BY source ORDER BY source
"""


@register(
    "packing_efficiency",
    _pack_eff_sql("len", "string_split"),
    tags=("chunking",),
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_pack_eff_sql("size", "split"))
packing_efficiency.__doc__ = """Packing QA over `sequence_pack`'s output grain: sequences per
    source, fill rate (tokens per {SEQ_LEN}-token slot — the utilization
    number every packing job reports; < 1.0 means padding waste), and
    overflow tokens (a document straddling a boundary contributes its
    tail to the NEXT slot; the overflow census quantifies how much
    truncation a no-straddle packer would pay instead). Same single
    window + bounded group-by as the packer itself — the QA pass costs
    one more tiny aggregation, not a second corpus scan.""".format(SEQ_LEN=SEQ_LEN)
