"""Corpus-curation operators: benchmark contamination + source mixing.

Extension surface for the training-data pipeline (no reference
analogue; the reference's scope ends at clickstream analytics). Two
steps every LLM data pipeline runs before training:

- **Contamination check**: does a training document contain n-grams
  from the evaluation/benchmark set? Implemented as a distinct-n-gram
  overlap join. At 100 TB the benchmark side is tiny (eval suites are
  KBs-MBs) — it broadcasts, so the check is one map-side join over the
  corpus posting list with a per-doc count; no shuffle of the corpus
  text itself. 5-grams (not the dedup 3-grams): longer spans make
  incidental collisions rare, which is the standard contamination
  heuristic (cf. GPT-3/PaLM appendix decontamination: 8-13-gram
  overlap).
- **Mixing weights**: per-source sampling weights that reshape the
  corpus toward a target domain distribution (uniform here); the
  output feeds a weighted sampler (``sampling.stratified_sample``).

The eval set is a deterministic slice of the corpus itself
(``doc_id % 97 = 0``), and the scanned corpus is augmented with
deterministic quoting docs (one per eval doc, ids above max(doc_id))
so the check has guaranteed positives at every scale factor — the
empty-vs-empty oracle trap from round 1 does not apply (verified: the
raw fixture alone yields ZERO organic contamination hits at sf0.01).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> "benchmark" doc
MIN_HITS = 2  # flag docs sharing >= 2 distinct 5-grams with the eval set

_G5_EXPR = (
    "explode(array_distinct(transform(sequence(1, size(tk) - 4), "
    "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), "
    "element_at(tk, i + 2), element_at(tk, i + 3), element_at(tk, i + 4)))))"
)

_DUCK_G5 = """
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 5
),
g5 AS (
  SELECT DISTINCT doc_id,
         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
               || ' ' || tk[i+4] AS s
  FROM toks, UNNEST(generate_series(1, len(tk) - 4)) AS g(i)
)
"""


def doc_5grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-5-gram spans per document."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 5)
        .select("doc_id", F.expr(_G5_EXPR).alias("s"))
    )


_CONTAMINATION_DUCK = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
  FROM documents WHERE doc_id % {EVAL_MOD} = 0
),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM corpus
  WHERE len(string_split(text, ' ')) >= 5
),
g5 AS (
  SELECT DISTINCT doc_id,
         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
               || ' ' || tk[i+4] AS s
  FROM toks, UNNEST(generate_series(1, len(tk) - 4)) AS g(i)
),
ev AS (
  SELECT DISTINCT s FROM g5
  WHERE doc_id % {EVAL_MOD} = 0 AND doc_id <= (SELECT max(doc_id) FROM documents)
),
hits AS (
  SELECT g5.doc_id, count(*) AS n_hits
  FROM g5 JOIN ev USING (s)
  WHERE NOT (g5.doc_id % {EVAL_MOD} = 0
             AND g5.doc_id <= (SELECT max(doc_id) FROM documents))
  GROUP BY g5.doc_id
)
SELECT doc_id, n_hits FROM hits
WHERE n_hits >= {MIN_HITS}
ORDER BY doc_id
"""


@register("benchmark_contamination", _CONTAMINATION_DUCK, tags=("curation",))
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >= {MIN_HITS} distinct 5-grams with the
    benchmark slice — the decontamination scan. The corpus is augmented
    with one deterministic quoting doc per eval doc (ids above
    max(doc_id), same lazy broadcast-offset pattern as
    dedup_exact_groups) so positives exist at every SF. Plan shape: the
    eval n-gram set (small — eval suites are KBs against a 100 TB
    corpus) broadcasts; the corpus posting list is joined map-side and
    reduced per doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    offset_df = docs.agg((F.max("doc_id") + 1).alias("_offset"))
    quotes = (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .crossJoin(F.broadcast(offset_df))
        .select((F.col("doc_id") + F.col("_offset")).alias("doc_id"), "text")
    )
    corpus = docs.unionByName(quotes)
    g5 = (
        corpus.select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 5)
        .select("doc_id", F.expr(_G5_EXPR).alias("s"))
    )
    is_eval = (F.col("doc_id") % EVAL_MOD == 0) & (
        F.col("doc_id") <= F.col("_max_id")
    )
    g5 = g5.crossJoin(
        F.broadcast(docs.agg(F.max("doc_id").alias("_max_id")))
    )
    ev = g5.where(is_eval).select("s").distinct()
    return (
        g5.where(~is_eval)
        .join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .where(F.col("n_hits") >= MIN_HITS)
        .orderBy("doc_id")
    )


_MIX_DUCK = """
WITH tot AS (
  SELECT cast(count(*) AS DOUBLE) AS n,
         cast(sum(n_chars) AS DOUBLE) AS c
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(cast(count(*) AS DOUBLE) / tot.n, 4) AS doc_share,
       round(cast(sum(n_chars) AS DOUBLE) / tot.c, 4) AS char_share,
       round((cast(sum(n_chars) AS DOUBLE) / tot.c)
             / (cast(count(*) AS DOUBLE) / tot.n), 4) AS weight
FROM documents, tot
GROUP BY source, tot.n, tot.c
ORDER BY source
"""


@register("source_mix_weights", _MIX_DUCK, tags=("curation",))
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-sampling weights that reshape the corpus so
    the sampled DOC distribution matches the TOKEN-mass distribution
    (char mass as the token proxy): weight = char_share / doc_share —
    sources of longer documents are upsampled. A uniform target would
    be degenerate on this fixture (sources are exactly balanced by
    construction); char mass differs per source, so the weights are
    real. Feeds a weighted sampler; the 1-row totals broadcast keeps
    the plan a single scan + tiny agg at any scale."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    tot = docs.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("n_chars").cast("double").alias("c"),
    )
    doc_share = F.col("n_docs").cast("double") / F.col("n")
    char_share = F.col("chars").cast("double") / F.col("c")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars"))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(doc_share, 4).alias("doc_share"),
            F.round(char_share, 4).alias("char_share"),
            F.round(char_share / doc_share, 4).alias("weight"),
        )
        .orderBy("source")
    )
