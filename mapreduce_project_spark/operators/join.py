"""Join operators — B8/B9 (SURVEY.md §2.B).

The reference expresses joins as the classic MR idiom (map tags records
by source table, reduce pairs them per key — mechanism ``design.md:48-49``
over ``worker.py:134-207``); here they are native ``df.join`` and
Catalyst picks broadcast-hash / sort-merge / shuffle-hash.

Scale notes:
- dimension tables (region/nation/supplier and any side < ~32 MB after
  filters) get an explicit ``broadcast()`` hint → no shuffle of the fact
  side at all;
- fact-fact joins shuffle on the join key; with AQE skew-join enabled a
  hot key is split at runtime. For repeated joins on the same key at
  100 TB, bucket both sides on the key at write time
  (``write.bucketBy(n, key)``) to eliminate the exchange entirely;
- semi/anti joins ship only the key column of the right side — prefer
  them over join+filter+distinct for existence checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Generic join; ``broadcast_right`` hints a map-side (broadcast)
    join for small dimensions."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """B9 EXISTS — rows of ``left`` with a match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """B9 NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on, "left_anti")
