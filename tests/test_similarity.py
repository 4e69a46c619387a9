"""Similarity operator properties beyond the oracle diff: ANN recall
vs the exact brute-force top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_project_spark.operators.similarity import topk_ann_lsh, topk_bruteforce
from mapreduce_project_spark.sources import load_table
from tests.conftest import SF_DIR


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(emb, queries, "vec_id", "embedding", 5).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_ann_lsh(emb, queries, "vec_id", "embedding", 5).collect()
    }
    assert exact, "brute force should return 50 rows"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.7, f"ANN recall {recall} too low ({len(ann)} rows)"


def test_ann_is_subset_quality(spark):
    # every ANN neighbor's cosine must be <= the exact kth neighbor's
    # cosine for that query (ANN can miss, never invent)
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = topk_bruteforce(emb, queries, "vec_id", "embedding", 5).collect()
    ann = topk_ann_lsh(emb, queries, "vec_id", "embedding", 5).collect()
    best = {}
    for r in exact:
        best[r["query_id"]] = max(best.get(r["query_id"], -2.0), r["cos"])
    for r in ann:
        assert r["cos"] <= best[r["query_id"]] + 1e-12
