"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (word count over documents.text) at
sf0.001. ``queries()`` — one named callable per implemented operator
from SURVEY.md §2; each takes ``(spark, sf_dir)`` and returns a
DataFrame. ``oracle_sql()`` — the DuckDB twin of each query (tables are
pre-registered views). Column names/aliases match pairwise so the
driver's sort-columns-by-name value hash compares equal.

Implementation lives in ``mapreduce_project_spark``; this module only
wires names to callables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_project_spark import queries_registry as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return R.QUERIES["word_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(R.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(R.ORACLES)
