"""Planted-fixture tests for the round-11 operators: each test
constructs the specific condition the operator's docstring claims to
handle and pins the exact expected output, so a regression fails with
a diagnosis instead of an opaque oracle hash mismatch."""

from __future__ import annotations

import hashlib

import mapreduce_project_spark.queries_registry as R
from tests.conftest import SF_DIR

# ---------------------------------------------------------------- D285


def _in_sample(i: int) -> bool:
    # the query's pinned predicate: md5 hex prefix of the decimal id
    return hashlib.md5(str(i).encode()).hexdigest()[:8] < "40000000"


def test_sampled_ladder_candidates_equal_exact_twin(spark):
    # Candidate machinery is shared with D221 verbatim: on the real
    # fixture the per-width candidate counts and fractions must be
    # IDENTICAL; only the truth columns may differ (sampled subset).
    exact = (
        R.ALL_QUERIES["lsh_width_ladder"](spark, SF_DIR)
        .toPandas().sort_values("width").reset_index(drop=True)
    )
    samp = (
        R.ALL_QUERIES["lsh_width_ladder_sampled"](spark, SF_DIR)
        .toPandas().sort_values("width").reset_index(drop=True)
    )
    assert list(samp.width) == [8, 12, 16]
    assert list(samp.n_candidates) == list(exact.n_candidates)
    assert list(samp.cand_ppm) == list(exact.cand_ppm)
    # ~25% vector sample ⇒ ~1/16 of pairs: the sampled truth set is a
    # strict subset, and non-vacuous on the fixture
    assert 0 < samp.n_true_sampled.iloc[0] < exact.n_true.iloc[0]
    assert (samp.n_caught_sampled <= samp.n_true_sampled).all()


def test_sampled_ladder_truth_gated_by_md5_sample(spark, tmp_path):
    # Plant two identical-vector pairs (cos = 1): pair A's ids are both
    # INSIDE the md5 sample (6, 19), pair B's both OUTSIDE (0, 1).
    # Background vectors are disjoint one-hots (pairwise cos 0). The
    # sampled variant must count ONLY pair A in its truth set and catch
    # it at every width (identical vectors share every code); the exact
    # twin on the same fixture counts both pairs — proving the sample
    # gates the denominator, not the candidate side.
    assert _in_sample(6) and _in_sample(19)
    assert not _in_sample(0) and not _in_sample(1)
    vec_a = [1.0 if d < 4 else 0.0 for d in range(64)]
    vec_b = [1.0 if 4 <= d < 8 else 0.0 for d in range(64)]
    rows = [(6, vec_a, 0), (19, vec_a, 0), (0, vec_b, 0), (1, vec_b, 0)]
    for k, i in enumerate([2, 3, 4, 5, 7, 8, 21, 23, 24, 27]):
        one_hot = [1.0 if d == 8 + k else 0.0 for d in range(64)]
        rows.append((i, one_hot, 1))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    samp = (
        R.ALL_QUERIES["lsh_width_ladder_sampled"](spark, str(tmp_path))
        .toPandas().sort_values("width").reset_index(drop=True)
    )
    assert list(samp.n_true_sampled) == [1, 1, 1]
    assert list(samp.n_caught_sampled) == [1, 1, 1]
    assert list(samp.recall_ppm) == [1000000, 1000000, 1000000]

    exact = (
        R.ALL_QUERIES["lsh_width_ladder"](spark, str(tmp_path))
        .toPandas().sort_values("width").reset_index(drop=True)
    )
    assert list(exact.n_true) == [2, 2, 2]
    # both identical pairs are candidates at full width on BOTH queries
    assert (samp.n_candidates >= 2).all()
    assert list(samp.n_candidates) == list(exact.n_candidates)
