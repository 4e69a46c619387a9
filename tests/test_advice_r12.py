"""Round-12 ADVICE regressions — each test plants (or reconstructs at
formula level, where planting needs an empty/4-billion-row table) the
condition the round-11 advisor reported and pins the fixed behavior."""

import re
from pathlib import Path

import pytest

import mapreduce_project_spark.queries_registry as R
from tests.conftest import SF_DIR

_PLANS = Path(__file__).resolve().parents[1] / "mapreduce_project_spark" / "plans"
_REL_SRC = (_PLANS / "relational_queries.py").read_text()
_SIM_SRC = (_PLANS / "similarity_queries.py").read_text()


# --- finding 1: partition_layout_advisor divides by zero on an empty
# table (n_rows = 0 ⇒ recommended_partitions = 0 ⇒ n_rows div 0).


def test_layout_advisor_guards_empty_table_both_engines(spark, duck):
    # The exact fixed expression shapes, evaluated at n_rows = 0: both
    # ratios must pin to 0 — not NULL, not a raise.
    tgt = 134217728
    row = spark.createDataFrame(
        [(0, 0)], "n_rows bigint, logical_bytes bigint"
    ).selectExpr(
        "cast(case when n_rows = 0 then 0 else"
        f" n_rows div ((logical_bytes + {tgt - 1}) div {tgt}) end as bigint)"
        " as rows_per_partition",
        "cast(case when n_rows = 0 then 0 else logical_bytes div n_rows end"
        " as bigint) as avg_row_bytes",
    ).collect()[0]
    assert row.rows_per_partition == 0 and row.avg_row_bytes == 0
    # DuckDB twin shape over a genuinely EMPTY relation (COUNT(*) = 0)
    got = duck.sql(
        f"""
        SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE
                 COUNT(*) // ((COALESCE(SUM(x), 0) + {tgt - 1}) // {tgt}) END
               AS BIGINT) AS rows_per_partition,
               CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE
                 COALESCE(SUM(x), 0) // COUNT(*) END AS BIGINT) AS avg_row_bytes
        FROM (SELECT 1 AS x WHERE false)
        """
    ).fetchone()
    assert got == (0, 0)


def test_layout_advisor_source_carries_guard_on_both_sides():
    # the registered query and its oracle both guard n_rows = 0
    assert "case when n_rows = 0 then 0" in _REL_SRC
    oracle = R.ALL_ORACLES["partition_layout_advisor"]
    assert oracle.count("CASE WHEN COUNT(*) = 0 THEN 0 ELSE") == 6  # 2 × 3 tables


# --- finding 2: the KN / G2 headroom guards existed only Spark-side;
# past the threshold one engine raised while the other computed.


def test_kn_oracle_mirrors_guard_constant_and_raises(duck):
    oracle = R.ALL_ORACLES["text_kn_bigram_score"]
    assert "2305843009213" in oracle and "error(" in oracle
    # the oracle's CASE shape fires DuckDB error() inside the band
    with pytest.raises(Exception, match="ppm headroom"):
        duck.sql(
            "SELECT CASE WHEN greatest(10000000000000, 1) > 2305843009213"
            " THEN error('text_kn_bigram_score: bigram counts exceed 64-bit"
            " ppm headroom') ELSE 1 END"
        ).fetchall()


def test_g2_oracle_mirrors_guard_constant_and_raises(duck):
    oracle = R.ALL_ORACLES["text_keyness_g2"]
    assert "150000000000" in oracle and "error(" in oracle
    with pytest.raises(Exception, match="micro-ln headroom"):
        duck.sql(
            "SELECT CASE WHEN 150000000001 > 150000000000"
            " THEN error('text_keyness_g2: corpus token count exceeds 64-bit"
            " micro-ln headroom') ELSE 1 END"
        ).fetchall()


# --- finding 3: nb derived from float log2 on both engines — a 1-ulp
# disagreement near a 2^k boundary could flip nb on one engine only.


def test_nb_integer_formula_matches_ceil_log2_everywhere():
    import math

    for n in list(range(1, 70000)) + [
        2**k + d for k in range(10, 40) for d in (-1, 0, 1)
    ]:
        old = max(8, min(24, math.ceil(math.log2(max(n, 1) / 8 or 1))))
        new = max(8, min(24, ((max(1, n) + 7) // 8 - 1).bit_length()))
        assert old == new, (n, old, new)


def test_nb_duckdb_bin_trick_matches_python(duck):
    # the oracle's length(bin(ceil(N/8) - 1)) IS bit_length for m-1 >= 1,
    # and the m-1 = 0 edge renders '0' (length 1) which clamps to 8
    for n in (1, 7, 8, 9, 2047, 2048, 2049, 65535, 65536, 10**6, 10**9):
        got = duck.sql(
            f"SELECT GREATEST(8, LEAST(24, CAST(length(bin("
            f"(GREATEST(1, {n}) + 7) // 8 - 1)) AS INT)))"
        ).fetchone()[0]
        want = max(8, min(24, ((max(1, n) + 7) // 8 - 1).bit_length()))
        assert got == want, (n, got, want)
    assert "length(bin(" in R.ALL_ORACLES["dedup_semantic_recall_cert"]
    assert "log2" not in R.ALL_ORACLES["dedup_semantic_recall_cert"]
    assert "math.log2" not in _SIM_SRC.split("def q_dedup_semantic_recall_cert")[1].split("def ")[1]


# --- finding 4: at N <= 2048 the auto-rate threshold saturates at
# 'ffffffff' and the < compare excluded md5 prefixes equal to it.


def test_saturated_sample_takes_full_corpus_semantics(duck):
    # planted 'ffffffff' prefix: the saturated branch must include it
    n_kept = duck.sql(
        """
        WITH c AS (SELECT * FROM (VALUES (1, 'ffffffff'), (2, '00000001'))
                   AS t(vec_id, h)),
        w2 AS (SELECT COUNT(*) <= 2048 AS sat, 'ffffffff' AS thr FROM c)
        SELECT COUNT(*) FROM c, w2 WHERE w2.sat OR c.h < w2.thr
        """
    ).fetchone()[0]
    assert n_kept == 2  # without the sat branch the planted row is dropped
    # both registered auto-rate samplers carry the saturated branch
    for name in ("dedup_semantic_recall_cert", "lsh_width_ladder_sampled"):
        oracle = R.ALL_ORACLES[name]
        assert "<= 2048 AS sat" in oracle and "w2.sat OR" in oracle
    assert _SIM_SRC.count("if n_rows <= 2048:") == 2


def test_recall_cert_saturated_fixture_samples_everything(spark):
    # sf0.001 has far fewer than 2048 vectors — r saturates at 1 and the
    # certificate must report n_sampled == n_vectors exactly.
    row = (
        R.ALL_QUERIES["dedup_semantic_recall_cert"](spark, SF_DIR)
        .collect()[0]
    )
    assert row.n_vectors <= 2048
    assert row.n_sampled == row.n_vectors
