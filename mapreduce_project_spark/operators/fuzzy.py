"""Fuzzy string matching — edit-distance-1 pair mining via SymSpell
deletion-neighborhood blocking (Garbe's symmetric-delete scheme).

The naive fuzzy join is a quadratic cross join with a `levenshtein`
filter — unusable beyond ~10^5 strings. The symmetric-delete property
makes it an EQUI-join: two strings within edit distance 1 (insert,
delete or substitute one char) always share a key in each other's
{self} ∪ {one-char-deleted variants} set — a substitution shares the
both-sides-deleted string, an insert/delete shares the shorter string
itself. So: explode each string into its ≤ len+1 deletion keys,
equi-join on the key, verify survivors with the exact `levenshtein`
(key-sharing is necessary, not sufficient: "ab"/"ba" share "a" at
distance 2). Candidate count is bounded by bucket sizes of the
deletion keys — near-uniform for natural vocabularies — never by
|vocab|².

Everything is Column expressions (codegen'd); no Python. The reference
would need a map emitting (deletion_key, token) and a reduce doing the
per-bucket pairing (`design.md:48-49`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column | str) -> Column:
    """``array<string>``: the string itself plus every one-character
    deletion of it (the SymSpell depth-1 key set), deduplicated."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                c.substr(F.lit(1), i - F.lit(1)), c.substr(i + F.lit(1), F.length(c))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(c), dels))


def deletion_neighborhood(col: Column | str, depth: int) -> Column:
    """``array<string>``: the ≤``depth``-deletion neighborhood of the
    string (self included), deduplicated. Depth 2 applies a second
    deletion round to every depth-1 variant — O(len²) keys per string,
    the standard SymSpell trade for edit-distance-2 coverage (key
    count grows, but the join stays an equi-join)."""
    c = F.col(col) if isinstance(col, str) else col
    v1 = deletion_variants(c)
    if depth == 1:
        return v1
    if depth != 2:
        raise ValueError(f"supported depths: 1, 2; got {depth}")
    return F.array_distinct(
        F.flatten(F.transform(v1, lambda x: deletion_variants(x)))
    )


def fuzzy_pairs(df: DataFrame, col: str, max_dist: int = 1) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``df[col]`` within
    levenshtein distance ``max_dist`` (1 or 2), as
    ``(<col>_a, <col>_b, dist)`` with ``_a < _b``.

    Completeness: Garbe's symmetric-delete property — two strings
    within edit distance d always share a member of each other's
    ≤d-deletion neighborhoods — so the blocking equi-join at depth
    ``max_dist`` misses nothing; the exact `levenshtein` verify then
    discards false candidates (key-sharing is necessary, not
    sufficient).

    Plan: distinct → explode deletion keys → self-equi-join on the key
    → distinct candidate pairs → exact `levenshtein` verify. The only
    shuffles key on the deletion keys and the pair ids; nothing is
    ever compared all-pairs."""
    a, b = f"{col}_a", f"{col}_b"
    keyed = (
        df.select(F.col(col).cast("string").alias("_v"))
        .distinct()
        .select(
            "_v",
            F.explode(deletion_neighborhood(F.col("_v"), max_dist)).alias("_k"),
        )
    )
    cand = (
        keyed.alias("l")
        .join(keyed.alias("r"), "_k")
        .filter(F.col("l._v") < F.col("r._v"))
        .select(F.col("l._v").alias(a), F.col("r._v").alias(b))
        .distinct()
    )
    return cand.filter(F.levenshtein(a, b) <= max_dist).select(
        a, b, F.levenshtein(a, b).cast("bigint").alias("dist")
    )
