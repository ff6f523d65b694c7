"""Deterministic sampling and dataset splitting for training pipelines.

Hash-based assignment (md5 of a stable key) rather than ``rand()``:
reproducible across runs, engines and cluster sizes, and stable under
data re-partitioning — the property a training-data split must have so
val/test never leak into train across pipeline re-runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import dialect as D
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
    h = D.sub_checked(_H16.format(t=t), ("md5(cast(doc_id AS", "md5(cast('ws|' || doc_id AS"))
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
cluster_cap_sample.__doc__ = """Frequency-capped duplicate sampling: keep at most {m} copies
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


# ---------------------------------------------------------------------------
# dedup-aware split leakage audit (train/test contamination via dups)
# ---------------------------------------------------------------------------

_LEAK_DUCK = f"""
WITH {{shingle_ctes}},
bands AS (
  SELECT doc_id, seed // 2 AS band_idx,
         min(h) * {{mh_shift}} + max(h) AS band_hash
  FROM sig GROUP BY doc_id, seed // 2
),
assigned AS (
  SELECT doc_id, md5(text) AS content_hash,
         {D.sub_checked(_SPLIT_SQL, ("h <", "hh <"))} AS split
  FROM (SELECT doc_id, text, {_H16.format(t='VARCHAR')} AS hh FROM documents)
),
clusters AS (
  SELECT content_hash, count(*) AS n,
         count(DISTINCT split) AS n_splits,
         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
         sum(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS n_eval
  FROM assigned GROUP BY content_hash
),
exact_stats AS (
  SELECT cast(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_clusters,
         cast(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS leaky_clusters,
         cast(sum(CASE WHEN n_train > 0 AND n_eval > 0 THEN n_eval
                       ELSE 0 END) AS BIGINT) AS exact_contaminated_eval
  FROM clusters
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
cross_pairs AS (
  SELECT c.doc_a, c.doc_b, sa.split AS split_a, sb.split AS split_b
  FROM cand c
  JOIN assigned sa ON sa.doc_id = c.doc_a
  JOIN assigned sb ON sb.doc_id = c.doc_b
  WHERE sa.split <> sb.split
),
near_stats AS (
  SELECT cast(count(*) AS BIGINT) AS neardup_cross_pairs,
         cast(count(DISTINCT CASE
             WHEN split_a = 'train' AND split_b <> 'train' THEN doc_b
             WHEN split_b = 'train' AND split_a <> 'train' THEN doc_a
           END) AS BIGINT) AS neardup_contaminated_eval
  FROM cross_pairs
)
SELECT dup_clusters, leaky_clusters, exact_contaminated_eval,
       neardup_cross_pairs, neardup_contaminated_eval
FROM exact_stats, near_stats
"""


def _leak_duck() -> str:
    from .dedup import _DUCK_SHINGLES, _DUCK_SIG, MH_SHIFT

    return _LEAK_DUCK.format(
        # (a historical `.replace("WITH ", "")` here was a silent no-op —
        # the shingle CTEs stopped carrying a WITH prefix long ago; the
        # checked-substitution migration, round 13, surfaced and removed it)
        shingle_ctes=f"{_DUCK_SHINGLES}, {_DUCK_SIG}",
        mh_shift=MH_SHIFT,
    )


@register("split_leakage_audit", _leak_duck(), tags=("sampling", "dedup"))
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware split audit: does the hash-based train/val/test
    assignment leak (near-)duplicate content across the split
    boundary? Exact grain: content-hash clusters spanning >1 split,
    and eval docs whose verbatim copy sits in train. Near grain:
    MinHash band-collision pairs whose endpoints land in different
    splits, and eval docs with a train-side near-dup. This is the
    internal-contamination audit (the sibling of
    `benchmark_contamination`, which checks EXTERNAL eval sets) —
    the known failure mode of doc-id-hash splitting, which
    distributes a duplicate CLUSTER independently per member.
    Production fix: split by content-hash or by dedup-cluster id
    (`dedup_survivors` keep-list) instead of doc id; this census is
    the evidence that motivates it.

    Scale notes (100 TB): exact grain is one content-hash group-by;
    near grain reuses the banded candidate generation (never
    all-pairs); both audits are census tails over bounded stats."""
    from .dedup import band_table_of, minhash_signature_arrays

    docs = load_table(spark, sf_dir, "documents")
    split_expr = F.expr(
        "CASE WHEN hh < 52429 THEN 'train' WHEN hh < 58982 THEN 'val' "
        "ELSE 'test' END"
    )
    assigned = (
        docs.select(
            "doc_id",
            F.md5("text").alias("content_hash"),
            F.expr(_H16.format(t="STRING")).alias("hh"),
        )
        .select("doc_id", "content_hash", split_expr.alias("split"))
        .localCheckpoint(eager=False)
    )
    clusters = assigned.groupBy("content_hash").agg(
        F.count("*").alias("n"),
        F.countDistinct("split").alias("n_splits"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") != "train", 1).otherwise(0)).alias(
            "n_eval"
        ),
    )
    exact_stats = clusters.agg(
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("dup_clusters"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leaky_clusters"),
        F.sum(
            F.when(
                (F.col("n_train") > 0) & (F.col("n_eval") > 0),
                F.col("n_eval"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("exact_contaminated_eval"),
    )
    bands = band_table_of(
        minhash_signature_arrays(spark, sf_dir).localCheckpoint(eager=False)
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    cross = (
        cand.join(
            assigned.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
            ),
            "doc_a",
        )
        .join(
            assigned.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
            ),
            "doc_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
    )
    near_stats = cross.agg(
        F.count("*").cast("bigint").alias("neardup_cross_pairs"),
        F.countDistinct(
            F.when(
                (F.col("split_a") == "train") & (F.col("split_b") != "train"),
                F.col("doc_b"),
            ).when(
                (F.col("split_b") == "train") & (F.col("split_a") != "train"),
                F.col("doc_a"),
            )
        )
        .cast("bigint")
        .alias("neardup_contaminated_eval"),
    )
    return exact_stats.crossJoin(near_stats).select(
        "dup_clusters",
        "leaky_clusters",
        "exact_contaminated_eval",
        "neardup_cross_pairs",
        "neardup_contaminated_eval",
    )


# ---------------------------------------------------------------------------
# pretraining mix manifest: the full admission chain as ONE plan
# ---------------------------------------------------------------------------

#: quality thresholds — identical to `training_corpus_pipeline` (and
#: the streaming admission twin in streaming/corpus_ingest.py), so the
#: composed manifest gates exactly the way the standalone stages do.
_MIX_MIN_TOKENS = 20
_MIX_MIN_TTR = 0.3
#: packed-sequence length — identical to operators/chunking.SEQ_LEN.
_MIX_SEQ_LEN = 256


def _mix_sql(len_fn: str, split_fn: str, distinct_fn: str, t: str,
             idiv: str) -> str:
    """One body, two dialects (the `training_corpus_pipeline` pattern):
    quality gate -> exact-dedup survivors -> 80/10/10 split ->
    train-split sequence packing, all composed in a single plan whose
    per-source manifest row is the datacard of the final mix."""
    h16 = _H16.format(t=t)
    return f"""
WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT d.doc_id + off.o AS doc_id, d.source, d.text
  FROM documents d CROSS JOIN off
  WHERE d.doc_id % 50 = 0
),
toks AS (
  SELECT doc_id, source, {split_fn}(text, ' ') AS tk, md5(text) AS content_hash
  FROM corpus
),
gated AS (
  SELECT doc_id, source, content_hash,
         {len_fn}(tk) AS n_tok,
         ({len_fn}(tk) >= {_MIX_MIN_TOKENS}
          AND {len_fn}({distinct_fn}(tk))
              / cast({len_fn}(tk) AS DOUBLE) >= {_MIX_MIN_TTR}) AS q_ok
  FROM toks
),
surv AS (
  SELECT doc_id, source, n_tok,
         row_number() OVER (PARTITION BY content_hash
                            ORDER BY doc_id) AS occ
  FROM gated WHERE q_ok
),
split_docs AS (
  SELECT doc_id, source, n_tok,
         (CASE WHEN {h16} < 52429 THEN 'train'
               WHEN {h16} < 58982 THEN 'val'
               ELSE 'test' END) AS split
  FROM surv WHERE occ = 1
),
cum AS (
  SELECT source, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tok_before
  FROM split_docs WHERE split = 'train'
),
packed AS (
  SELECT source,
         cast(count(DISTINCT cast(floor(tok_before
              / cast({_MIX_SEQ_LEN} AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS n_train_sequences,
         cast(sum(n_tok) AS BIGINT) AS train_tokens
  FROM cum GROUP BY source
),
input_census AS (
  SELECT source, cast(count(*) AS BIGINT) AS n_input
  FROM corpus GROUP BY source
),
gate_census AS (
  SELECT source,
         cast(sum(CASE WHEN q_ok THEN 0 ELSE 1 END) AS BIGINT)
           AS drop_quality
  FROM gated GROUP BY source
),
dup_census AS (
  SELECT source,
         cast(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS drop_duplicate
  FROM surv GROUP BY source
),
kept_census AS (
  SELECT source,
         cast(count(*) AS BIGINT) AS n_kept,
         cast(sum(n_tok) AS BIGINT) AS tokens_kept,
         cast(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train,
         cast(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_val,
         cast(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_test
  FROM split_docs GROUP BY source
)
SELECT i.source,
       i.n_input,
       coalesce(g.drop_quality, cast(0 AS BIGINT)) AS drop_quality,
       coalesce(d.drop_duplicate, cast(0 AS BIGINT)) AS drop_duplicate,
       coalesce(k.n_kept, cast(0 AS BIGINT)) AS n_kept,
       coalesce(k.tokens_kept, cast(0 AS BIGINT)) AS tokens_kept,
       coalesce(k.n_train, cast(0 AS BIGINT)) AS n_train,
       coalesce(k.n_val, cast(0 AS BIGINT)) AS n_val,
       coalesce(k.n_test, cast(0 AS BIGINT)) AS n_test,
       coalesce(p.n_train_sequences, cast(0 AS BIGINT))
         AS n_train_sequences,
       CASE WHEN coalesce(p.n_train_sequences, 0) = 0 THEN 0.0
            ELSE cast((2 * p.train_tokens * 10000
                       + p.n_train_sequences * {_MIX_SEQ_LEN})
                      {idiv} (2 * p.n_train_sequences * {_MIX_SEQ_LEN})
                      AS DOUBLE) / 10000 END AS train_fill_rate
FROM input_census i
LEFT JOIN gate_census g ON g.source = i.source
LEFT JOIN dup_census d ON d.source = i.source
LEFT JOIN kept_census k ON k.source = i.source
LEFT JOIN packed p ON p.source = i.source
ORDER BY i.source
"""


def _mix_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest's ONLY text pass: (doc_id, source, content_hash,
    n_tok, q_ok) for the augmented corpus. The planted duplicates
    (every 50th doc, ids offset above max — `dedup_exact_groups`'s
    lazy-offset broadcast pattern) are derived from the flagged
    ORIGINALS, not re-read from parquet: a copy shares its original's
    hash, token count and quality verdict by construction, so the
    text column is scanned and tokenized exactly once
    (plan-asserted in test_plan_properties)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    base = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("content_hash"),
        F.size(F.split("text", " ")).alias("n_tok"),
        (
            (F.size(F.split("text", " ")) >= _MIX_MIN_TOKENS)
            & (
                F.size(F.array_distinct(F.split("text", " ")))
                / F.size(F.split("text", " ")).cast("double")
                >= _MIX_MIN_TTR
            )
        ).alias("q_ok"),
    ).localCheckpoint(eager=False)  # the one and only text pass
    offset_df = base.agg((F.max("doc_id") + 1).alias("_offset"))
    planted = (
        base.where(F.col("doc_id") % 50 == 0)
        .crossJoin(F.broadcast(offset_df))
        .select(
            (F.col("doc_id") + F.col("_offset")).alias("doc_id"),
            "source",
            "content_hash",
            "n_tok",
            "q_ok",
        )
    )
    return base.unionByName(planted)


@register(
    "pretraining_mix_manifest",
    _mix_sql("len", "string_split", "list_distinct", "VARCHAR", "//"),
    headline=True,
    tags=("sampling", "dedup", "chunking", "curation"),
)
def pretraining_mix_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    flagged = _mix_flagged(spark, sf_dir).localCheckpoint(eager=False)
    wocc = Window.partitionBy("content_hash").orderBy("doc_id")
    surv = (
        flagged.where("q_ok")
        .withColumn("occ", F.row_number().over(wocc))
        .localCheckpoint(eager=False)
    )
    split_docs = (
        surv.where(F.col("occ") == 1)
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.expr(
                f"CASE WHEN {_H16.format(t='STRING')} < 52429 THEN 'train' "
                f"WHEN {_H16.format(t='STRING')} < 58982 THEN 'val' "
                f"ELSE 'test' END"
            ).alias("split"),
        )
        .localCheckpoint(eager=False)
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        split_docs.where(F.col("split") == "train")
        .withColumn(
            "tok_before", F.coalesce(F.sum("n_tok").over(wcum), F.lit(0))
        )
        .groupBy("source")
        .agg(
            F.countDistinct(
                F.floor(F.col("tok_before") / F.lit(float(_MIX_SEQ_LEN)))
            )
            .cast("bigint")
            .alias("n_train_sequences"),
            F.sum("n_tok").cast("bigint").alias("train_tokens"),
        )
    )
    input_gate = flagged.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_input"),
        F.sum(F.when(F.col("q_ok"), 0).otherwise(1))
        .cast("bigint")
        .alias("drop_quality"),
    )
    dup_census = surv.groupBy("source").agg(
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("drop_duplicate")
    )
    kept_census = split_docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("bigint")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("bigint")
        .alias("n_test"),
    )
    z = F.lit(0).cast("bigint")
    return (
        input_gate.join(F.broadcast(dup_census), "source", "left")
        .join(F.broadcast(kept_census), "source", "left")
        .join(F.broadcast(packed), "source", "left")
        .select(
            "source",
            "n_input",
            "drop_quality",
            F.coalesce("drop_duplicate", z).alias("drop_duplicate"),
            F.coalesce("n_kept", z).alias("n_kept"),
            F.coalesce("tokens_kept", z).alias("tokens_kept"),
            F.coalesce("n_train", z).alias("n_train"),
            F.coalesce("n_val", z).alias("n_val"),
            F.coalesce("n_test", z).alias("n_test"),
            F.coalesce("n_train_sequences", z).alias("n_train_sequences"),
            F.when(
                F.coalesce("n_train_sequences", z) == 0, F.lit(0.0)
            )
            .otherwise(
                F.expr(
                    f"cast((2 * train_tokens * 10000 "
                    f"+ n_train_sequences * {_MIX_SEQ_LEN}) "
                    f"div (2 * n_train_sequences * {_MIX_SEQ_LEN}) "
                    f"AS DOUBLE) / 10000"
                )
            )
            .alias("train_fill_rate"),
        )
        .orderBy("source")
    )
pretraining_mix_manifest.__doc__ = """The END-TO-END admission chain as ONE plan — the manifest a
    pretraining data job publishes alongside its output: per source,
    how many documents entered, how many each gate killed (quality
    gate first, then exact-dedup survivorship), the kept docs/tokens,
    their 80/10/10 split, and the packed training sequences the train
    split yields. Proves the standalone stages COMPOSE: the quality
    thresholds are `training_corpus_pipeline`'s, survivorship is the
    lowest-id-survives rule of the dedup family (applied cross-source:
    a duplicate's drop is charged to its OWN source), the split is
    `corpus_split_counts`' hash assignment, and the packer is
    `sequence_pack`'s concat-and-chunk window at SEQ_LEN={sl}.

    Conservation invariants (test-pinned): n_input = drop_quality +
    drop_duplicate + n_kept, and n_kept = n_train + n_val + n_test,
    per source. fill_rate is the half-up integer 4-dp ratio (no float
    knife-edge); every other column is an exact BIGINT count.

    Like `dedup_exact_groups`, the corpus is augmented with
    deterministic copies of every 50th doc (ids planted above
    max(doc_id)) so the survivorship gate produces — and the oracle
    checks — real duplicate kills at ANY scale factor: the raw
    fixture has no exact dups below sf0.1, and a manifest whose dedup
    column is structurally zero proves nothing about the stage.

    Scale notes (100 TB): the chain is ONE text scan -> two
    corpus-keyed shuffles (content_hash for survivorship, source for
    packing) -> bounded per-source censuses joined on the source
    dimension. The Spark side is DataFrame code, NOT the CTE text:
    Spark inlines every CTE reference, and the naive CTE form
    re-scans (and re-tokenizes) the parquet 15 times — here the
    flagged projection (hash, token count, quality verdict: the only
    pass that touches text) is localCheckpointed and every census
    branch reads it back, plan-asserted to a single parquet scan by
    test_plan_properties. No stage widens the data: the gate is a
    projection, dedup keeps the FIRST row per hash (map-side-
    combinable rank), packing is the per-shard cumulative window
    `sequence_pack` already ships at scale (sub-shard
    (source, file_bucket) to bound partitions). The census joins are
    dimension-sized broadcasts.""".format(
        sl=_MIX_SEQ_LEN
    )


# ---------------------------------------------------------------------------
# multi-phase temperature annealing schedule (the mix PLAN over time)
# ---------------------------------------------------------------------------

#: (phase, alpha, budget_numerator, budget_denominator): 50% of the
#: token budget at strong flattening, 30% at mild, 20% at the natural
#: distribution — the curriculum that starts diverse and anneals
#: toward the true mix. Alphas are restricted to {0.25, 0.5, 1.0}
#: DELIBERATELY: they evaluate as sqrt(sqrt(x)) / sqrt(x) / x, all
#: IEEE-correctly-rounded on both engines, where a general pow(x, a)
#: can drift a libm ulp (the temperature_resample_counts precedent).
_SCHED_PHASES = ((1, "0.25", 5, 10), (2, "0.5", 3, 10), (3, "1.0", 2, 10))
#: fixed-point quantum for the temperature weights: small enough that
#: alpha=1 weights (= tokens * Q) stay BIGINT-summable across sources
#: at ~1e12 tokens/source, large enough that sqrt-scale weights keep
#: 3+ significant decimals at any corpus size.
_SCHED_Q = 1000


def _sched_sql(len_fn: str, split_fn: str, values: str, idiv: str) -> str:
    return f"""
WITH per_source AS (
  SELECT source, cast(sum({len_fn}({split_fn}(text, ' '))) AS BIGINT) AS t
  FROM documents GROUP BY source
),
tot AS (SELECT cast(sum(t) AS BIGINT) AS tt FROM per_source),
phases AS ({values}),
w AS (
  SELECT p.phase, p.temp, p.bnum, p.bden, s.source, s.t,
         cast(floor(CASE p.phase
              WHEN 1 THEN sqrt(sqrt(cast(s.t AS DOUBLE)))
              WHEN 2 THEN sqrt(cast(s.t AS DOUBLE))
              ELSE cast(s.t AS DOUBLE) END * {_SCHED_Q} + 0.5) AS BIGINT)
           AS wq
  FROM per_source s CROSS JOIN phases p
),
ws AS (
  SELECT phase, cast(sum(wq) AS BIGINT) AS wsum FROM w GROUP BY phase
),
sh AS (
  SELECT w.phase, w.temp, w.source, w.t, w.bnum, w.bden,
         (2 * w.wq * 10000 + ws.wsum) {idiv} (2 * ws.wsum) AS share4
  FROM w JOIN ws ON ws.phase = w.phase
),
pt AS (
  SELECT phase, temp, source, t, share4,
         (2 * ((bnum * tot.tt) {idiv} bden) * share4 + 10000)
           {idiv} (2 * 10000) AS ptok
  FROM sh CROSS JOIN tot
)
SELECT cast(phase AS BIGINT) AS phase,
       cast(temp AS DOUBLE) AS temperature,
       source,
       t AS natural_tokens,
       cast(share4 AS DOUBLE) / 10000 AS phase_share,
       cast(ptok AS BIGINT) AS phase_tokens,
       cast((2 * ptok * 10000 + t) {idiv} (2 * t) AS DOUBLE) / 10000
         AS oversample
FROM pt ORDER BY phase, source
"""


def _sched_values(spark_form: bool) -> str:
    rows = ", ".join(
        f"({p}, {a}, {n}, {d})" for p, a, n, d in _SCHED_PHASES
    )
    if spark_form:
        return f"SELECT * FROM VALUES {rows} AS p(phase, temp, bnum, bden)"
    return f"SELECT * FROM (VALUES {rows}) AS p(phase, temp, bnum, bden)"


@register(
    "mix_schedule_plan",
    _sched_sql("len", "string_split", _sched_values(False), "//"),
    tags=("sampling",),
)
def mix_schedule_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(
        _sched_sql("size", "split", _sched_values(True), "div")
    )
mix_schedule_plan.__doc__ = """Multi-phase temperature-annealed mixture schedule — the PLAN a
    phased pretraining run executes (50% of the token budget at
    alpha=0.25 flattening, 30% at alpha=0.5, 20% at the natural
    alpha=1.0 mix): per (phase, source), the temperature share
    w_s = t_s^alpha / sum(t^alpha), the phase token quota, and the
    oversampling factor (phase quota / natural tokens — how many
    epochs of that source the phase consumes; the number that warns
    when a small source will be over-epoched by flattening). The
    multi-phase extension of `temperature_resample_counts` (one
    phase, doc grain) feeding `weighted_doc_sample`'s sampler.

    Determinism: alphas are restricted to sqrt-composable values so
    both engines compute IEEE-identical weights (no libm pow); each
    weight quantizes ONCE to integer quanta, after which every share,
    quota and oversample is an exact integer half-up 4-dp ratio —
    value-hash-identical at any scale, any partitioning.

    Scale notes (100 TB): one corpus scan for the per-source token
    census, then everything is |sources| x |phases| rows of integer
    arithmetic. Weight quanta stay BIGINT-summable to ~1e12
    tokens/source x thousands of sources (Q={q}); past that, raise
    the census to per-source terabins before weighting.""".format(
        q=_SCHED_Q
    )
