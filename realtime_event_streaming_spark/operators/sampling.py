"""Deterministic sampling and dataset splitting for training pipelines.

Hash-based assignment (md5 of a stable key) rather than ``rand()``:
reproducible across runs, engines and cluster sizes, and stable under
data re-partitioning — the property a training-data split must have so
val/test never leak into train across pipeline re-runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table, register_views
from ..registry import register

#: fraction of the 16-bit hash space per split: 80 / 10 / 10.
_SPLIT_SQL = (
    "CASE WHEN h < 52429 THEN 'train' WHEN h < 58982 THEN 'val' "
    "ELSE 'test' END"
)
#: first 4 md5 hex chars -> uniform 16-bit integer, portable via instr
#: (no cross-engine hex-parse differences).
_H16 = (
    "((instr('0123456789abcdef', substr(md5(cast(doc_id AS {t})), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5(cast(doc_id AS {t})), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5(cast(doc_id AS {t})), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(cast(doc_id AS {t})), 4, 1)) - 1))"
)

_SPLIT_DUCK = f"""
WITH h16 AS (
  SELECT doc_id, lang, {_H16.format(t='VARCHAR')} AS h FROM documents
)
SELECT lang, {_SPLIT_SQL} AS split,
       count(*) AS n_docs
FROM h16
GROUP BY lang, 2
ORDER BY lang, split
"""

_SPLIT_SPARK = f"""
WITH h16 AS (
  SELECT doc_id, lang, {_H16.format(t='STRING')} AS h FROM documents
)
SELECT lang, {_SPLIT_SQL} AS split,
       count(*) AS n_docs
FROM h16
GROUP BY lang, 2
ORDER BY lang, split
"""


@register("corpus_split_counts", _SPLIT_DUCK, tags=("sampling",))
def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hashed doc id, counted per
    language. Pure projection + bounded group-by; the assignment is a
    deterministic function of the row key, so any re-run or re-shard
    reproduces the exact same split."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_SPLIT_SPARK)


_STRAT_DUCK = """
SELECT lang, count(*) AS sampled_docs,
       cast(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE (instr('0123456789abcdef', substr(md5('s1|' || cast(doc_id AS VARCHAR)), 1, 1)) - 1) < 4
GROUP BY lang
ORDER BY lang
"""

_STRAT_SPARK = """
SELECT lang, count(*) AS sampled_docs,
       cast(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE (instr('0123456789abcdef', substr(md5('s1|' || cast(doc_id AS STRING)), 1, 1)) - 1) < 4
GROUP BY lang
ORDER BY lang
"""


@register("stratified_sample_counts", _STRAT_DUCK, tags=("sampling",))
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% deterministic sample (first md5 nibble < 4) summarized per
    language. Seeded by the salt in the hash input — different salts
    give independent samples; same salt is reproducible anywhere."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_STRAT_SPARK)


_PIPELINE_DUCK = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk, n_chars FROM documents
),
quality AS (
  SELECT doc_id, lang, n_chars,
         len(list_distinct(tk)) / cast(len(tk) AS DOUBLE) AS ttr,
         len(tk) AS n_tokens
  FROM toks
),
kept AS (
  SELECT doc_id, lang, n_chars FROM quality
  WHERE n_tokens >= 20 AND ttr >= 0.3
),
h16 AS (
  SELECT kept.*, {_H16.format(t='VARCHAR')} AS h FROM kept
)
SELECT lang, {_SPLIT_SQL} AS split,
       count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars
FROM h16 GROUP BY lang, 2 ORDER BY lang, split
"""

_PIPELINE_SPARK = f"""
WITH toks AS (
  SELECT doc_id, lang, split(text, ' ') AS tk, n_chars FROM documents
),
quality AS (
  SELECT doc_id, lang, n_chars,
         size(array_distinct(tk)) / cast(size(tk) AS DOUBLE) AS ttr,
         size(tk) AS n_tokens
  FROM toks
),
kept AS (
  SELECT doc_id, lang, n_chars FROM quality
  WHERE n_tokens >= 20 AND ttr >= 0.3
),
h16 AS (
  SELECT kept.*, {_H16.format(t='STRING')} AS h FROM kept
)
SELECT lang, {_SPLIT_SQL} AS split,
       count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars
FROM h16 GROUP BY lang, 2 ORDER BY lang, split
"""


@register("training_corpus_pipeline", _PIPELINE_DUCK, tags=("sampling", "text"))
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-preparation pipeline: quality filter (length +
    lexical diversity) -> deterministic split -> per-(lang, split)
    census. One scan, no UDF — the skeleton of a pretraining data
    pipeline, every stage oracle-checked end-to-end."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_PIPELINE_SPARK)


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis keys, deterministic)
# ---------------------------------------------------------------------------

WEIGHTED_K = 10


def _weighted_sql(t: str) -> str:
    # u = (h16+1)/65537 in (0,1); E-S key = -ln(u)/w with w = n_chars;
    # the k smallest keys are a weight-proportional sample without
    # replacement. Deterministic salt-hash instead of rand() — same
    # sample on every engine, run and shard layout.
    h = _H16.format(t=t).replace("md5(cast(doc_id AS", "md5(cast('ws|' || doc_id AS")
    return f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         round(-ln(({h} + 1) / cast(65537 AS DOUBLE)) /
               cast(n_chars AS DOUBLE), 4) AS es_key
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY es_key, doc_id) AS rnk FROM keyed
)
SELECT cast(rnk AS BIGINT) AS rnk, doc_id, source,
       cast(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rnk <= {WEIGHTED_K}
ORDER BY rnk
"""


@register("weighted_doc_sample", _weighted_sql("VARCHAR"), tags=("sampling",))
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement (weights = doc
    length) via deterministic Efraimidis-Spirakis keys: key =
    -ln(u)/w with u a salted-hash uniform; the k smallest keys are
    the sample. The importance-sampling primitive behind token-mass-
    proportional corpus draws, with rand() replaced by the salted hash
    so every engine and re-run draws the SAME sample. One scan + a
    top-k (per-partition heaps, no global sort)."""
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(_weighted_sql("STRING"))


# ---------------------------------------------------------------------------
# cluster-capped sampling (bounded duplicates instead of full dedup)
# ---------------------------------------------------------------------------

#: keep at most this many copies per exact-duplicate cluster. Capping
#: (rather than keeping one survivor) preserves the natural-duplication
#: frequency signal pretraining mixes sometimes want, while bounding
#: the worst clusters.
_CAP_M = 2

_CAP_DUCK = f"""
WITH h AS (
  SELECT doc_id, source, md5(text) AS content_hash FROM documents
),
ranked AS (
  SELECT doc_id, source, content_hash,
         row_number() OVER (PARTITION BY content_hash
                            ORDER BY doc_id) AS occ,
         count(*) OVER (PARTITION BY content_hash) AS csize
  FROM h
)
SELECT source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN occ <= {_CAP_M} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       cast(sum(CASE WHEN occ > {_CAP_M} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       cast(count(DISTINCT CASE WHEN csize > {_CAP_M}
                                THEN content_hash END) AS BIGINT)
         AS clusters_over_cap
FROM ranked
GROUP BY source
ORDER BY source
"""


@register("cluster_cap_sample", _CAP_DUCK, tags=("sampling", "dedup"))
def cluster_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped duplicate sampling: keep at most {m} copies
    per exact-content cluster (lowest doc_ids — deterministic),
    instead of the single survivor `dedup_survivors` keeps. The
    capping policy preserves a bounded duplication-frequency signal
    (docs that naturally recur a few times stay duplicated; the
    thousand-copy boilerplate cluster is clamped) — a standard
    pretraining-mix middle ground. Census per source: kept, dropped,
    and how many clusters hit the cap.

    Scale notes (100 TB): one shuffle on the 128-bit content hash
    (carrying the hash, not the text); the rank/size windows are
    cluster-bounded. The same plan serves any cap, and the production
    form writes the keep-list back as the admission filter — the
    `dedup_survivors` endpoint with occ <= M instead of rn = 1.""".format(
        m=_CAP_M
    )
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5("text").alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    wc = Window.partitionBy("content_hash")
    ranked = h.select(
        "source",
        "content_hash",
        F.row_number().over(w).alias("occ"),
        F.count("*").over(wc).alias("csize"),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("occ") <= _CAP_M, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("occ") > _CAP_M, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.countDistinct(
                F.when(F.col("csize") > _CAP_M, F.col("content_hash"))
            )
            .cast("bigint")
            .alias("clusters_over_cap"),
        )
        .orderBy("source")
    )
