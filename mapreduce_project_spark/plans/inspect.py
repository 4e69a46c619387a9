"""Physical-plan inspection helpers — the "explain and iterate" loop as
code, so plan-quality properties (pushdown, pruning, broadcast, partial
aggregation, top-k strategy) are *asserted in tests* instead of eyeballed
once and forgotten.

The reference has no optimizer at all (SURVEY.md §4); on Spark these
properties are what make the same declared query viable at 100 TB, so
regressions here are correctness-of-scale bugs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Parquet-scan PushedFilters entries (non-empty ⇒ predicate
    pushdown reached the scan)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every scan (column pruning check)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def has_node(df: DataFrame, node: str) -> bool:
    """Whether the physical plan contains an operator (e.g.
    'BroadcastHashJoin', 'TakeOrderedAndProject')."""
    return count_node(df, node) > 0


def count_node(df: DataFrame, node: str) -> int:
    """Occurrences of an operator, counted on the formatted plan's
    numbered node headers ('(4) Exchange') so tree and detail sections
    aren't double-counted."""
    return len(re.findall(rf"\(\d+\) {re.escape(node)}", formatted_plan(df)))
