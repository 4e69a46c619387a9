"""Round-13 ADVICE regressions — each test plants the condition the
round-12 advisor reported and pins the fixed behavior."""

import pytest

import mapreduce_project_spark.queries_registry as R

# --- finding 1: merge_join_view_delta — a NULL op evaded the ~isin()
# validator (NULL falls out of the filter) and .otherwise(-1) then
# silently treated the row as a delete.


def test_delta_ivm_rejects_null_op(spark, tmp_path):
    from mapreduce_project_spark.sources.io import merge_join_view_delta

    a = spark.createDataFrame(
        [(1, "x", "insert"), (2, "y", None)],
        "ak bigint, av string, op string",
    )
    with pytest.raises(ValueError, match="unknown op"):
        merge_join_view_delta(spark, str(tmp_path / "s"), 0, a, None, "ak", "bk")


def test_delta_ivm_null_op_never_lands_as_delete(spark, tmp_path):
    # Before the fix the NULL-op batch WROTE a retraction; now the whole
    # batch must be refused, leaving the state dir untouched.
    import os

    from mapreduce_project_spark.sources.io import merge_join_view_delta

    state = str(tmp_path / "s2")
    a0 = spark.createDataFrame([(1, "x", "insert")], "ak bigint, av string, op string")
    b0 = spark.createDataFrame([(1, "y", "insert")], "bk bigint, bv string, op string")
    merge_join_view_delta(spark, state, 0, a0, b0, "ak", "bk")
    a1 = spark.createDataFrame([(1, "x", None)], "ak bigint, av string, op string")
    with pytest.raises(ValueError):
        merge_join_view_delta(spark, state, 1, a1, None, "ak", "bk")
    from mapreduce_project_spark.sources.io import read_join_view_delta

    rows = {
        (r["ak"], r["av"], r["bk"], r["bv"], r["_m"])
        for r in read_join_view_delta(spark, state).collect()
    }
    assert rows == {(1, "x", 1, "y", 1)}  # the join row was NOT retracted
    # and no batch-1 partition ever landed on the a side
    assert not any("_b=1" in d for d in os.listdir(os.path.join(state, "a")))


# --- finding 2: graph_betweenness_sampled — the 3e9 input guard kept
# each ss*st product under int64max but SUM(paths) over up to K*K
# sampled pairs could still wrap Spark-side (ANSI off) while DuckDB
# raised on the HUGEINT->BIGINT cast.


def test_btw_guard_bounds_the_aggregated_score():
    from mapreduce_project_spark.plans.advanced_queries import _BTW_GUARD, _BTW_K

    # worst case: every one of the K*K sampled (s,t) pairs routes through
    # one node with both sigmas at the guard — the summed score must
    # still fit int64 in BOTH engines.
    assert _BTW_K * _BTW_K * _BTW_GUARD * _BTW_GUARD <= 2**63 - 1


def test_btw_guard_same_constant_both_engines():
    from mapreduce_project_spark.plans.advanced_queries import _BTW_GUARD

    oracle = R.ALL_ORACLES["graph_betweenness_sampled"]
    assert f"> {_BTW_GUARD} THEN" in oracle


def test_btw_oracle_sum_at_guard_no_longer_overflows(duck):
    # 16 products of exactly GUARD^2 summed: the old 3e9 guard made this
    # cast raise in DuckDB (HUGEINT out of BIGINT range); the new guard
    # must let it through as a plain BIGINT.
    from mapreduce_project_spark.plans.advanced_queries import _BTW_GUARD, _BTW_K

    total = duck.sql(
        f"""
        SELECT CAST(SUM(p) AS BIGINT) FROM (
          SELECT CAST({_BTW_GUARD} AS BIGINT) * {_BTW_GUARD} AS p
          FROM range({_BTW_K * _BTW_K})
        )
        """
    ).fetchone()[0]
    assert total == _BTW_K * _BTW_K * _BTW_GUARD * _BTW_GUARD


# --- finding 3: text_tfidf_cosine_pairs_lsh — the 2^53 exact-double
# headroom raise existed only Spark-side; the DuckDB oracle computed
# silently past it.


def test_tflsh_oracle_mirrors_headroom_guard():
    oracle = R.ALL_ORACLES["text_tfidf_cosine_pairs_lsh"]
    assert "9007199254740992" in oracle
    assert "error(" in oracle


def test_tflsh_oracle_guard_raises_past_headroom(duck):
    oracle = R.ALL_ORACLES["text_tfidf_cosine_pairs_lsh"]
    # lift the exact guarded CASE shape and evaluate it at dot = 2^53:
    # the oracle must raise, exactly like the Spark raise_error branch.
    with pytest.raises(Exception, match="exact-double range"):
        duck.sql(
            """
            SELECT CASE WHEN greatest(dot, na, nb) >= 9007199254740992
              THEN error('text_tfidf_cosine_pairs_lsh: sums exceed'
                         || ' exact-double range — rescale idf before'
                         || ' trusting cosine')
              ELSE CAST(dot AS DOUBLE) END
            FROM (SELECT 9007199254740992 AS dot, 1 AS na, 1 AS nb)
            """
        ).fetchall()
    assert "exact-double range" in oracle


# --- finding 4: read_ivf_tree last-writer-wins ordered only by
# src_batch desc — duplicate ids within one micro-batch tied and
# row_number picked a partition-order-dependent row.


def test_read_ivf_tree_intra_batch_tie_is_deterministic(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapreduce_project_spark.streaming.events import read_ivf_tree

    tree = str(tmp_path / "tree")
    dup = spark.createDataFrame(
        [(1, [1.0, 0.0], 3, 5), (1, [2.0, 0.0], 7, 5), (2, [9.0, 1.0], 0, 5)],
        "id bigint, v array<double>, cell int, src_batch bigint",
    )
    dup.write.parquet(f"{tree}/batch-5")
    expected_cell = (
        dup.filter("id = 1")
        .orderBy(F.xxhash64("v").desc(), F.col("cell").desc())
        .collect()[0]["cell"]
    )
    picks = set()
    for parts in (1, 8):
        got = {
            r["id"]: (r["v"], r["cell"])
            for r in read_ivf_tree(spark, tree)
            .repartition(parts)
            .collect()
        }
        assert set(got) == {1, 2}
        picks.add(got[1][1])
    assert picks == {expected_cell}  # same winner at every partitioning


def test_read_ivf_tree_cross_batch_lww_still_wins(spark, tmp_path):
    # the secondary key must never outrank src_batch: a newer batch's
    # row wins even when the older row hashes higher.
    from mapreduce_project_spark.streaming.events import read_ivf_tree

    tree = str(tmp_path / "tree2")
    spark.createDataFrame(
        [(1, [5.0], 2, 3)], "id bigint, v array<double>, cell int, src_batch bigint"
    ).write.parquet(f"{tree}/batch-3")
    spark.createDataFrame(
        [(1, [6.0], 9, 4)], "id bigint, v array<double>, cell int, src_batch bigint"
    ).write.parquet(f"{tree}/batch-4")
    rows = read_ivf_tree(spark, tree).collect()
    assert len(rows) == 1 and rows[0]["cell"] == 9 and rows[0]["v"] == [6.0]


# --- task 6 pin: bench_trend_report replay (artifact files, metadata
# scale — the D298 discipline: a pure-python replay of the committed
# ledger must equal the engine's answer cell for cell).


def test_bench_trend_replay_matches_committed_ledger(spark):
    import glob
    import re as _re

    from mapreduce_project_spark.queries_registry import ALL_QUERIES

    got = {
        r["round"]: (
            r["panel_total_us"], r["cpu_probe_us"], r["host_ratio_ppm"],
            r["panel_norm_us"], r["delta_vs_prev_ppm"],
        )
        for r in ALL_QUERIES["bench_trend_report"](spark, "unused").collect()
    }

    def micros(s):
        if not s:
            return None
        ip, _, fp = s.partition(".")
        return int(ip) * 1_000_000 + int((fp or "0").ljust(6, "0")[:6])

    num = r'\\?"{f}\\?":\s*([0-9]+\.?[0-9]*)'
    rows = {}
    for path in glob.glob("/root/repo/BENCH_r*.json"):
        # one record per round: only the bare BENCH_r<digits>.json
        # driver artifact (VERDICT r13 item 1) — suffixed twins
        # (_builder, _opt, _final, _c8) are excluded by exact match
        if not _re.search(r"BENCH_r\d+\.json$", path):
            continue
        txt = open(path, encoding="utf-8").read()
        rnd = int(_re.search(r"BENCH_r(\d+)", path).group(1))
        p = _re.search(num.format(f="panel_total"), txt)
        if not p:
            continue
        c = _re.search(num.format(f="cpu_probe_sec"), txt)
        rows[rnd] = (micros(p.group(1)), micros(c.group(1)) if c else None)
    assert rows, "vacuous: no parseable BENCH artifacts"
    probed = [r for r in sorted(rows) if rows[r][1] is not None]
    ref_cpu = rows[probed[0]][1] if probed else None
    prev = None
    for rnd in sorted(rows):
        pus, cus = rows[rnd]
        host = cus * 1_000_000 // ref_cpu if cus is not None else None
        norm = pus * ref_cpu // cus if cus is not None else None
        if prev is None:
            delta = None
        elif pus >= prev:
            delta = (pus - prev) * 1_000_000 // prev
        else:
            delta = -((prev - pus) * 1_000_000 // prev)
        assert got[rnd] == (pus, cus, host, norm, delta), f"round {rnd}"
        prev = pus
    assert set(got) == set(rows)
