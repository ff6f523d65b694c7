"""Model-inference-as-DataFrame: hashed-feature linear quality scoring.

The production corpus-quality gate most large pipelines run is a cheap
linear classifier over hashed bag-of-words features (fastText-style:
token -> hash bucket -> weight lookup -> sum -> threshold). This module
expresses that inference as pure DataFrame ops — the pattern that
matters at 100 TB:

- the WEIGHT TABLE is a DataFrame joined with ``broadcast()`` (weights
  for a 4k-bucket linear model are KBs; a real 2M-bucket fastText model
  is ~10 MB — still broadcast territory), so scoring is a map-side
  hash join inside whole-stage codegen, no UDF, no shuffle of the
  corpus;
- scores are INTEGER sums (weights are integers centered on zero), so
  the per-doc score is exact and both engines agree bit-for-bit — no
  float-summation-order drift in the oracle compare; the single
  normalizing division happens once per output row, after aggregation.

Weights here are pseudo-random-but-deterministic (a Knuth
multiplicative hash of the bucket id) standing in for trained
parameters — the LOOKUP/SCORE plumbing is the operator under test; a
real deployment would load the trained vector into the same
(bucket, weight) frame. Nothing comparable exists in the reference
(its quality gates are fixed SQL predicates); this extends the
training-data surface (driver north star).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

#: Feature-hash geometry and the integer weight formula. 2654435761 is
#: Knuth's multiplicative-hash constant; mod a prime ~1e6 then center.
#: All arithmetic < 2^44, exact in BIGINT on both engines.
N_BUCKETS = 4096
_W_PRIME = 1000003
_W_CENTER = _W_PRIME // 2


_QC_DUCK = f"""
WITH weights AS (
  SELECT i AS bucket,
         (i * 2654435761) % {_W_PRIME} - {_W_CENTER} AS w
  FROM UNNEST(generate_series(0, {N_BUCKETS - 1})) AS t(i)
),
tok AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(tk), 1, 7))::BIGINT % {N_BUCKETS} AS bucket
  FROM documents, UNNEST(string_split(text, ' ')) AS u(tk)
),
doc_scores AS (
  SELECT t.doc_id, t.source,
         cast(sum(w.w) AS BIGINT) AS score,
         count(*) AS n_tokens
  FROM tok t JOIN weights w ON w.bucket = t.bucket
  GROUP BY t.doc_id, t.source
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive,
       cast(sum(score) AS BIGINT) AS total_score,
       round(cast(sum(score) AS DOUBLE) / sum(n_tokens), 4)
         AS score_per_token
FROM doc_scores GROUP BY source ORDER BY source
"""


@register("quality_classifier_scores", _QC_DUCK, tags=("inference",))
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier inference over hashed token features, per
    source: docs scored positive, total integer score, score density.
    Plan shape: corpus scan -> explode tokens -> hash to bucket ->
    BROADCAST join the (bucket, weight) model -> two-level agg. The
    weight lookup is the broadcast join — swap the generated frame for
    trained parameters and this IS fastText-style quality filtering at
    corpus scale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    weights = spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % _W_PRIME - _W_CENTER).alias("w"),
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("tk"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            "cast(conv(substr(md5(tk), 1, 7), 16, 10) as bigint) "
            f"% {N_BUCKETS}"
        ).alias("bucket"),
    )
    doc_scores = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("w").alias("score"), F.count("*").alias("n_tokens"))
    )
    return (
        doc_scores.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("score") > 0).cast("bigint")).alias("n_positive"),
            F.sum("score").alias("total_score"),
            F.round(
                F.sum("score").cast("double") / F.sum("n_tokens"), 4
            ).alias("score_per_token"),
        )
        .orderBy("source")
    )
