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


def run_with_shuffle_metrics(df: DataFrame) -> dict[str, int]:
    """Execute ``df`` to a noop sink inside a fresh job group and return
    the engine's own byte-level task metrics summed over exactly that
    run's stages: ``{"shuffle_write_bytes", "shuffle_read_bytes",
    "input_bytes", "n_stages"}``.

    This is the measurement half of the explain-and-iterate loop: plan
    SHAPE says a narrow shuffle exists, this says how many bytes it
    actually moved (the number the Spark UI shows, read from
    `AppStatusStore` so it works with the UI disabled).
    `tests/test_shuffle_volume.py` pins the engine's narrow-shuffle
    claims with it; `plans/skew diagnostics` complement it per key.
    """
    import uuid

    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"shufmetrics-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "run_with_shuffle_metrics")
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup("shufmetrics-idle", "idle")
    tracker = sc.statusTracker()
    stage_ids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is not None:
            stage_ids.update(info.stageIds)
    store = sc._jsc.sc().statusStore()  # type: ignore[attr-defined]
    out = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "input_bytes": 0,
           "n_stages": 0}
    for sid in stage_ids:
        try:
            sd = store.lastStageAttempt(sid)
        except Exception:  # a skipped stage may have no stored attempt
            continue
        out["shuffle_write_bytes"] += sd.shuffleWriteBytes()
        out["shuffle_read_bytes"] += sd.shuffleReadBytes()
        out["input_bytes"] += sd.inputBytes()
        out["n_stages"] += 1
    return out
