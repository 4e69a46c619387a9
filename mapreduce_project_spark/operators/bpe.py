"""Iterative BPE merge training — the multi-round generalization of
the single-round candidate scoring in `bpe_merge_pairs`.

Real tokenizer training is an ITERATIVE corpus rewrite: each round
counts adjacent pairs, adopts the most frequent pair as a new vocab
symbol, and rewrites every sequence by greedy leftmost non-overlapping
replacement before the next count. A reference user would chain one
count-reduce plus one rewrite-map job per round; here each round is
one partial-agg count (pair strings only ever shuffle, never
documents) plus one pure-JVM `F.aggregate` fold that rewrites token
arrays in place — no Python in the data path, no shuffle for the
rewrite.

The greedy left-to-right merge is a sequential fold, not a windowed
expression: "a a a" under pair (a,a) must become ["a a", "a"], which
no per-position transform can express. The fold's overlap handling is
structural: a freshly merged symbol ("a b", space-joined) never
textually equals its left constituent, so the next fold step cannot
re-match it — leftmost-first semantics fall out of the accumulator.

Exactness: counts are integers, the per-round winner is picked by the
total order (count DESC, left, right), and the rewrite is a
deterministic fold — so ``k`` rounds are hash-matchable by a k-times
unrolled SQL oracle (DuckDB `list_reduce` replays the same fold; same
discipline as pagerank/kmeans/linear-GD). Driver state per round is
ONE (left, right, count) triple — metadata-scale, like
`pagerank_fixed`'s convergence scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _adjacent_pairs(tok: Column) -> Column:
    """array<struct<l,r>> of adjacent pairs (empty for len<2 — guards
    Spark's DESCENDING sequence(1,0) surprise)."""
    return F.when(
        F.size(tok) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - 1),
            lambda i: F.struct(
                F.element_at(tok, i).alias("l"), F.element_at(tok, i + 1).alias("r")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def merge_pair(tok: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping replacement of the adjacent pair
    (left, right) with the space-joined merged symbol — one pure-JVM
    fold, no UDF. ``F.get`` (NULL out of bounds) keeps the empty-
    accumulator probe safe under ANSI mode."""
    merged = F.lit(f"{left} {right}")
    return F.aggregate(
        tok,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (t == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    docs: DataFrame, text_tokens: Column, rounds: int = 2
) -> DataFrame:
    """Run ``rounds`` BPE merge rounds over the corpus; returns the
    learned merge table (rnd, lhs, rhs, cnt) — the artifact a
    tokenizer ships. Per round: one partial-agg pair count with a
    TakeOrdered(1) winner (deterministic tie-break count DESC, l, r),
    then the fold rewrite; rewritten corpus cached per round and the
    predecessor unpersisted (the iterative-plan discipline of
    `pagerank_fixed`)."""
    spark = docs.sparkSession
    cur = docs.select(text_tokens.alias("tk")).cache()
    retired: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        # this collect is the round's ONLY action: it materializes
        # `cur`'s cache as a side effect, so no separate count() is
        # needed, and the predecessor retired last round can only be
        # unpersisted now (dropping it earlier would force `cur` to
        # recompute from the raw corpus)
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("tk"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if retired is not None:
            retired.unpersist()
            retired = None
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rnd, left, right, cnt))
        if rnd < rounds:
            # the FINAL round's winner needs no corpus rewrite — the
            # rewritten corpus would never be read again
            nxt = cur.select(merge_pair(F.col("tk"), left, right).alias("tk")).cache()
            retired, cur = cur, nxt
    cur.unpersist()
    if retired is not None:
        retired.unpersist()
    return spark.createDataFrame(
        merges, "rnd bigint, lhs string, rhs string, cnt bigint"
    )


def bpe_apply(
    docs: DataFrame,
    text_tokens: Column,
    merges: list[tuple[str, str]],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenizer APPLICATION — encode a corpus with a trained merge
    table: each (lhs, rhs) merge is one greedy leftmost fold rewrite,
    applied in training order (BPE's defining invariant: apply order =
    learn order). k merges = k chained zero-shuffle projections over
    the token arrays; Catalyst collapses them into one generated
    stage, so encoding any corpus with a k-entry merge table is a
    single scan. Returns (*carry, tk array<string>) — the encoded
    sequences plus any carried identifier columns."""
    cur = docs.select(*carry, text_tokens.alias("tk"))
    for lhs, rhs in merges:
        cur = cur.select(*carry, merge_pair(F.col("tk"), lhs, rhs).alias("tk"))
    return cur


__all__ = ["bpe_apply", "bpe_train", "merge_pair"]
