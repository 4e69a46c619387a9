"""Window-function operators (top-k per group, running aggregates,
lag/lead) — B10's per-group variant plus the analytic surface a
reference user would emulate with a single-reducer sort
(``master.py:257-263`` num_reducers=1 path).

Scale notes: a window partitioned by a key shuffles once on that key
and sorts within partitions — same cost shape as a groupBy on the key.
Never use a global (unpartitioned) window at scale; for global top-k use
``relational.top_k`` (TakeOrderedAndProject) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_project_spark.operators.relational import dec


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order: list[Column], k: int, rank_col: str = "rk"
) -> DataFrame:
    """Top-k rows per group via ``row_number``. ``order`` must include a
    unique tie-breaker for determinism."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_dec_sum(
    df: DataFrame, partition_by: list[str], order: list[Column], value_col: str, alias: str
) -> DataFrame:
    """Running (cumulative) exact sum of a money column per group —
    decimal arithmetic then double, so the prefix sums are deterministic
    and engine-independent."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(dec(value_col)).over(w).cast("double"))


def lag_gap_ms(
    df: DataFrame, partition_by: list[str], ts_col: str, alias: str = "gap_ms"
) -> DataFrame:
    """Milliseconds since the previous row in event-time order (null for
    the first row per partition). Uses ``unix_millis`` ≡ oracle
    ``epoch_ms`` — integer math, no float drift."""
    w = Window.partitionBy(*partition_by).orderBy(F.col(ts_col))
    ms = F.unix_millis(F.col(ts_col))
    return df.withColumn(alias, ms - F.lag(ms).over(w))


def trailing_time_agg(
    df: DataFrame,
    partition_by: list[str],
    ts_col: str,
    lookback_seconds: int,
    **aggs: Column,
) -> DataFrame:
    """Per-row aggregates over the partition's trailing event-time
    interval ``[ts - lookback, ts]`` — "this user's activity in the
    last hour, as of each event" (rate limiting, velocity features,
    rolling health counters). A RANGE frame over integer epoch
    MICROseconds: unlike a ROWS frame, rows land in the frame by TIME
    distance, so irregular event spacing is handled exactly. Micros —
    not ``unix_timestamp``'s truncated whole seconds — because
    truncation silently widens the frame by up to a second at its
    lower edge (an event 3600.4 s back truncates into range), which
    both changes the semantics and diverges from any engine comparing
    at full precision (caught by the sf0.1 differential sweep; oracle
    twin: ``ORDER BY epoch_us(ts) RANGE <secs>*1000000 PRECEDING``).

    Shuffles once on the partition key and sorts within partitions —
    identical cost shape to the other keyed windows here; Spark
    evaluates the sliding frame incrementally (add/remove at the frame
    edges), not per-row-rescan. ``aggs`` are built by the caller over
    the frame (e.g. ``F.count(F.lit(1))``, ``F.sum(dec(...))``)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-lookback_seconds * 1_000_000, 0)
    )
    out = df
    for alias, expr in aggs.items():
        out = out.withColumn(alias, expr.over(w))
    return out
