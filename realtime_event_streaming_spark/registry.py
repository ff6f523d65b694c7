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
    doc: str = ""


REGISTRY: dict[str, Query] = {}


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
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every module that registers queries; return the registry."""
    from .plans import reference_queries  # noqa: F401
    from .plans import star_queries  # noqa: F401
    from .plans import analytics_extras  # noqa: F401
    from .plans import behavior_queries  # noqa: F401
    from .plans import funnel_queries  # noqa: F401
    from .plans import sql_surface  # noqa: F401
    from .plans import streaming_replay  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import textstats  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import sampling  # noqa: F401
    from .operators import anomaly  # noqa: F401

    return REGISTRY
