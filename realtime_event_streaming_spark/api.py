"""Ergonomic façade: one object wrapping session, tables and queries.

    from realtime_event_streaming_spark.api import Engine

    eng = Engine.local()                       # or Engine(existing_spark)
    eng.table("events").show()
    eng.query("minute_rollup").show()
    eng.sql("SELECT count(*) FROM events").show()
    eng.names()                                # registered query names
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table, register_views
from .registry import load_all
from .session import get_spark, prepare

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


class Engine:
    """Facade over a SparkSession + one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = prepare(spark)
        self.sf_dir = sf_dir
        self._registry = load_all()
        self._views_registered = False

    @classmethod
    def local(cls, sf_dir: str = DEFAULT_SF_DIR) -> "Engine":
        return cls(get_spark(), sf_dir)

    def names(self) -> list[str]:
        return sorted(self._registry)

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; one of {TABLES}")
        return load_table(self.spark, self.sf_dir, name)

    def query(self, name: str) -> DataFrame:
        if name not in self._registry:
            raise KeyError(f"unknown query {name!r}; see names()")
        return self._registry[name].spark_fn(self.spark, self.sf_dir)

    def sql(self, statement: str) -> DataFrame:
        """Ad-hoc SQL over all tables of this Engine's sf_dir
        (registered as temp views on first use)."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(statement)

    def oracle(self, name: str) -> str | None:
        """The DuckDB oracle SQL for a query (None = rows-only op)."""
        if name not in self._registry:
            raise KeyError(f"unknown query {name!r}; see names()")
        return self._registry[name].oracle
