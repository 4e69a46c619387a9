"""Graph operators over edge-list DataFrames — PageRank with
deterministic fixed-point arithmetic.

The reference could express one PageRank ROUND as a map (emit each
node's rank share to its neighbors) plus a reduce (sum inflow)
(`design.md:48-49`); iteration would be the client resubmitting jobs in
a loop. Here each round is two keyed DataFrame joins and the loop is a
driver-side `for` over a scalar round count — never over data.

Determinism contract (same discipline as the k-means fixed-point means,
`operators/similarity.py:label_centroids`): ranks live as BIGINT
micro-units (`scale` = 10^12 of total mass) and every update uses pure
integer ops — `rank div out_degree` contributions, `(85 * inflow) div
100` damping — so Spark and the DuckDB oracle agree bit-for-bit. No
doubles anywhere in the iteration; the final `rank` column is one
division by a power of ten (exactly representable, correctly rounded,
engine-portable).

Scale shape per round: contributions = edges ⋈ ranks on the source
node (one shuffle, both sides node-keyed so AQE reuses the exchange
across rounds), inflow = grouped sum on the destination (map-side
partial agg), new ranks = degree table left ⋈ inflow (node-keyed
again). State per round is one (node, rank) row per node — O(V), never
O(E). Caching follows the connected-components pattern: each round's
ranks are materialized and the previous round unpersisted so lineage
stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PR_SCALE = 10**12


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct undirected edge list (both directions present) — the
    usual preconditioning so PageRank has no dangling nodes (every
    node then has out-degree ≥ 1). One explode, then one distinct."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
                    F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank_fx, rank) after ``n_iter`` damped PageRank rounds
    over a directed edge list in which EVERY source has out-degree ≥ 1
    (run `symmetrize` first if the graph is undirected / has dangling
    nodes — with dangling nodes the lost mass simply damps away, which
    is the "remove dangling mass" convention).

    ``rank_fx`` is the exact BIGINT fixed-point value (micro-units of
    ``10^12`` total mass); ``rank`` is its double rendering. Integer
    division drops sub-unit remainders — that loss is part of the
    deterministic spec, bounded by 1 unit (10^-12) per edge per round.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(F.col("src").alias("node"), "d")
        .cache()
    )
    n_nodes = deg.count()  # scalar only — sizes the init literal
    r0 = _PR_SCALE // n_nodes
    base = (100 - damping_pct) * r0 // 100
    ranks = deg.select("node", F.lit(r0).alias("fx")).cache()
    for _ in range(n_iter):
        rd = ranks.join(deg, "node").select(
            F.col("node").alias("src"), F.expr("fx div d").alias("c")
        )
        inflow = (
            e.join(rd, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("inflow"))
        )
        nxt = (
            deg.select("node")
            .join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(inflow, 0L)) div 100"
                    )
                ).alias("fx"),
            )
        ).cache()
        nxt.count()
        ranks.unpersist()
        ranks = nxt
    deg.unpersist()
    return ranks.select(
        "node",
        F.col("fx").alias("rank_fx"),
        (F.col("fx").cast("double") / F.lit(float(_PR_SCALE))).alias("rank"),
    )
