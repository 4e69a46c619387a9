"""Round-11 ADVICE regressions — each test plants (or, where the
failure needs ~1e12 planted rows, arithmetically reconstructs) the
condition the round-10 advisor reported and pins the fixed behavior."""

import re
from pathlib import Path

import pytest

import mapreduce_project_spark.queries_registry as R
from tests.conftest import SF_DIR, rows_of

INT64_MAX = (1 << 63) - 1

_TEXT_QUERIES_SRC = (
    Path(__file__).resolve().parents[1]
    / "mapreduce_project_spark"
    / "plans"
    / "text_queries.py"
).read_text()


def _source_constant(pattern: str) -> int:
    m = re.search(pattern, _TEXT_QUERIES_SRC)
    assert m, f"guard constant not found via {pattern!r}"
    return int(m.group(1))


def test_kn_guard_threshold_leaves_no_overflow_band():
    # ADVICE medium: the KN guard constant was 2305843009213693 (~2.3e15),
    # 1000x looser than the safe bound — for c(vw) or N1+(v.) in
    # (2.3e12, 2.3e15] the terms (4*c-3)*1e6 and 3*n1f*pcont_ppm overflow
    # int64 BELOW the guard. Pin the invariant against the constant as
    # committed: at the threshold every product in the else-branch fits
    # int64; the OLD constant must fail this check (the band existed).
    thr = _source_constant(r"greatest\(c, n1f\) > (\d+) then")

    def worst_terms(c):
        # worst case per the expression shape at text_queries.py
        # q_text_kn_bigram_score: pcont_ppm = n1b*1e6 div t <= 1e6
        return max(4 * c * 1_000_000, 3 * c * 1_000_000)

    assert worst_terms(thr) <= INT64_MAX, (
        f"guard admits an overflow band: at c = threshold = {thr} the "
        f"else-branch peaks at {worst_terms(thr)} > int64max"
    )
    # threshold is tight to within 2x (not pointlessly conservative)
    assert worst_terms(2 * thr) > INT64_MAX
    # and the round-10 constant genuinely had the band the advisor found
    assert worst_terms(2305843009213693) > INT64_MAX


def test_kn_guard_raises_cleanly_in_former_overflow_band(spark):
    # Evaluate the guard expression (same shape and threshold as the
    # query plants it — reconstructed here because planting 2.3e12
    # bigram OCCURRENCES is not materializable in a test) at a count
    # inside the FORMER band (1e13): the fixed guard must fire the
    # clean raise_error, not ANSI ARITHMETIC_OVERFLOW and not a silent
    # wrap.
    thr = _source_constant(r"greatest\(c, n1f\) > (\d+) then")
    expr = (
        f"case when greatest(c, n1f) > {thr} then"
        " raise_error('text_kn_bigram_score: bigram counts exceed"
        " 64-bit ppm headroom — widen to DECIMAL(38,0)') "
        "else greatest(1,"
        " (4 * c - 3) * 1000000 div (4 * cv)"
        " + (3 * n1f * (n1b * 1000000 div t)) div (4 * cv)) end"
    )
    df = spark.createDataFrame(
        [(10_000_000_000_000, 10_000_000_000_001, 7, 3, 11)],
        "c bigint, cv bigint, n1f bigint, n1b bigint, t bigint",
    )
    with pytest.raises(Exception, match="64-bit ppm headroom"):
        df.selectExpr(f"{expr} AS p_ppm").collect()
    # just UNDER the threshold the same expression evaluates (no ANSI
    # overflow) — the band is closed from both sides
    ok = spark.createDataFrame(
        [(thr, 4 * thr, thr, 1, 10)],
        "c bigint, cv bigint, n1f bigint, n1b bigint, t bigint",
    )
    assert ok.selectExpr(f"{expr} AS p_ppm").collect()[0][0] >= 1


def test_g2_guard_threshold_covers_left_associated_peak():
    # ADVICE low: the G2 xlnx partial sum peaks near 2*n*uln(n) (d ~ n
    # for rare terms), which fits int64 only for n <= ~1.75e11, but the
    # old guard allowed n up to 3e11. Pin: at the committed threshold
    # the peak fits; at the old 3e11 it did not.
    import math

    thr = _source_constant(r"case when n > (\d+) then")

    def peak(n):
        uln = round(math.log(n) * 1_000_000)
        return 2 * n * uln

    assert peak(thr) <= INT64_MAX, (
        f"G2 guard admits an overflow band: peak({thr}) = {peak(thr)}"
    )
    assert peak(300_000_000_000) > INT64_MAX  # the old constant's band
    assert peak(2 * thr) > INT64_MAX  # tight to within 2x


def test_g2_and_kn_still_hash_match_oracle(spark, duck):
    # The tightened guards must be invisible at any materializable
    # scale: both queries stay hash-equal to their DuckDB twins.
    for name in ("text_keyness_g2", "text_kn_bigram_score"):
        got = R.ALL_QUERIES[name](spark, SF_DIR).toPandas()
        want = duck.sql(R.ALL_ORACLES[name]).df()
        assert len(got) > 0, f"{name}: vacuous fixture"
        assert rows_of(got) == rows_of(want), name


def test_global_prefix_max_rejects_nulls_with_contract_error(spark):
    # ADVICE low: an all-NULL partition skipped the offsets fold, then
    # crashed in astype('int64') with an obscure pandas error. The
    # Arrow pass now raises the contract violation by name.
    from mapreduce_project_spark.operators.windows import global_prefix_max

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k bigint, v bigint"
    )
    with pytest.raises(Exception, match="global_prefix_max.*NULL"):
        global_prefix_max(df, ["k"], "v", "pm").collect()


def test_global_prefix_max_copies_batch_and_matches_window(spark):
    # ADVICE low: global_prefix_max mutated the incoming Arrow batch in
    # place while its sum sibling copies first. Behavioral pin: results
    # equal the single-task window MAX ... ROWS UNBOUNDED PRECEDING on
    # a multi-partition input, and the input DataFrame re-collects
    # unchanged afterwards (no visible side effect).
    from pyspark.sql import functions as F

    from mapreduce_project_spark.operators.windows import global_prefix_max

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).cast("bigint").alias("v"),
    )
    got = {
        r["k"]: r["pm"]
        for r in global_prefix_max(df, ["k"], "v", "pm").collect()
    }
    want = {
        r["k"]: r["pm"]
        for r in df.selectExpr(
            "k", "v", "max(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) pm"
        ).collect()
    }
    assert got == want
    assert df.count() == 1000 and "pm" not in df.columns
