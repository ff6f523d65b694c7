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

    def register_sql_functions(self) -> list[str]:
        """Register the engine's derived-dimension helpers as SQL
        functions (Spark 4 SQL scalar UDFs) for ad-hoc queries:

            eng.register_sql_functions()
            eng.sql("SELECT derive_country(user_id), count(*) FROM events GROUP BY 1")
        """
        from .functions import dialect as D

        defs = {
            "derive_country": (
                "CREATE OR REPLACE TEMPORARY FUNCTION derive_country(user_id BIGINT) "
                f"RETURNS STRING RETURN {D.COUNTRY_SQL}"
            ),
            "derive_device": (
                "CREATE OR REPLACE TEMPORARY FUNCTION derive_device(user_id BIGINT) "
                f"RETURNS STRING RETURN {D.DEVICE_SQL}"
            ),
            "page_k": (
                "CREATE OR REPLACE TEMPORARY FUNCTION page_k(props STRING) "
                "RETURNS INT RETURN try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT)"
            ),
            "md5_64": (
                "CREATE OR REPLACE TEMPORARY FUNCTION md5_64(x STRING) "
                "RETURNS STRING RETURN substr(md5(x), 1, 16)"
            ),
        }
        for ddl in defs.values():
            self.spark.sql(ddl)
        return sorted(defs)

    def oracle(self, name: str) -> str | None:
        """The DuckDB oracle SQL for a query (None = rows-only op)."""
        if name not in self._registry:
            raise KeyError(f"unknown query {name!r}; see names()")
        return self._registry[name].oracle
