"""Planted-fixture tests for the round-12 operators: each test
constructs the specific condition the operator's docstring claims to
handle and pins the exact expected output, so a regression fails with
a diagnosis instead of an opaque oracle hash mismatch."""

from __future__ import annotations

import mapreduce_project_spark.queries_registry as R
from tests.conftest import SF_DIR, rows_of


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


# ---------------------------------------------------------------- D295


def test_tfidf_lsh_finds_planted_near_dup_with_exact_arithmetic(
    spark, tmp_path
):
    # 60 docs ⇒ df cap = max(2, 60 div 50) = 2 and idf = 60 div df.
    # Docs 1/2 share 7 of their 8 trigrams (all df = 2 ⇒ weight 30);
    # each has one private trigram (df = 1 ⇒ weight 60). Closed form:
    # dot = 7·30² = 6300, norm² = 7·900 + 3600 = 9900 each,
    # cos = 6300/9900 ≈ 0.636 ≥ 0.6. Every other doc is vocabulary-
    # disjoint (no shared shingle ⇒ no candidate, no dot). The LSH
    # form must output EXACTLY this one pair — candidate generation
    # included (capped-space J = 7/9, band-hit deterministic under the
    # pinned hash constants).
    base = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [
        (1, base + " kappa", "en", "s0", 60),
        (2, base + " lam", "en", "s0", 60),
    ]
    for i in range(3, 61):
        rows.append(
            (i, f"w{i}a w{i}b w{i}c w{i}d w{i}e", "en", "s0", 30)
        )
    _write_docs(spark, tmp_path, rows)
    got = (
        R.ALL_QUERIES["text_tfidf_cosine_pairs_lsh"](spark, str(tmp_path))
        .toPandas()
    )
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["shared_terms"] == 7
    # r["dot"], not r.dot — .dot is the pandas Series method
    assert r["dot"] == 6300
    assert r["norm_a_sq"] == 9900 and r["norm_b_sq"] == 9900
    assert r["cosine"] == 6300 / (9900**0.5 * 9900**0.5)
    # and the exact Σdf² twin agrees row-for-row on this fixture
    exact = (
        R.ALL_QUERIES["text_tfidf_cosine_pairs"](spark, str(tmp_path))
        .toPandas()
    )
    assert rows_of(got) == rows_of(exact)


def test_tfidf_lsh_real_fixture_recall_vs_exact_twin(spark):
    # On the sf0.001 corpus the LSH form must reproduce the exact
    # twin's full pair set (measured 28/28 — the documented misses
    # only appear at larger SFs on J ≈ 0.02 idf-artifact pairs).
    lsh = R.ALL_QUERIES["text_tfidf_cosine_pairs_lsh"](spark, SF_DIR).toPandas()
    exact = R.ALL_QUERIES["text_tfidf_cosine_pairs"](spark, SF_DIR).toPandas()
    assert len(lsh) == len(exact) == 28
    assert rows_of(lsh) == rows_of(exact)
