"""The declared query inventory: name → (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL twin for every SQL-expressible query.

This is the engine's public face for the driver contract
(``__spark_entry__.py``) and mirrors the reference's own differential
test pattern: ``client_folder/scripts/test.py:48-72`` re-runs each job
through a sequential local executor and compares order-insensitively
(``test.py:126-139``); here DuckDB plays that local-oracle role.

Conventions (keep, or the driver's value-hash comparison breaks):
- alias every computed column identically in Spark and SQL;
- money sums go through DECIMAL(18,2) then cast to DOUBLE (exact,
  associative arithmetic → bit-identical across engines);
- timestamps are formatted to 'yyyy-MM-dd HH:mm:ss' strings (session
  timezone pinned to UTC to match DuckDB's naive timestamps);
- posting lists / collected sets are emitted as sorted comma-joined
  strings (stable cross-engine representation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_project_spark.session import prep_session
from mapreduce_project_spark.sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle twin) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Import side-effect: each module registers its queries via @query.
from mapreduce_project_spark.plans import core_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import relational_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import events_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import text_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import similarity_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import compat_queries  # noqa: E402,F401
from mapreduce_project_spark.plans import advanced_queries  # noqa: E402,F401
