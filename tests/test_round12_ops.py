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


# ---------------------------------------------------------------- D296


def _write_graph(spark, tmp_path, edges):
    # one order per edge, two lineitems (the co-supply construction),
    # dated inside the query's pinned [1995-01-01, 1995-01-15) window
    import datetime

    orders = [
        (1000 + i, datetime.date(1995, 1, 5)) for i in range(len(edges))
    ]
    lis = []
    for i, (a, b) in enumerate(edges):
        lis += [(1000 + i, a), (1000 + i, b)]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lis, "l_orderkey bigint, l_suppkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_betweenness_path_graph_closed_form(spark, tmp_path):
    # Path 1-2-3-4-5: sources {1,2,3,4}, target {5} (the 4 largest
    # minus the sources). All σ = 1; score(v) = number of sampled
    # pairs whose unique shortest path crosses v: node 4 → 3 pairs,
    # node 3 → 2, node 2 → 1; (4,5) are adjacent so node 4 gains
    # nothing from it. pairs_counted = 4.
    _write_graph(spark, tmp_path, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = (
        R.ALL_QUERIES["graph_betweenness_sampled"](spark, str(tmp_path))
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert [
        (r["rank"], r["node"], r["score"], r["n_pairs"], r["pairs_counted"])
        for _, r in got.iterrows()
    ] == [(1, 4, 3, 3, 4), (2, 3, 2, 2, 4), (3, 2, 1, 1, 4)]


def test_betweenness_multiplies_path_counts(spark, tmp_path):
    # Diamond 1-2-8, 1-3-8 plus tail 8-9: σ_1(8) = 2, so the pair
    # (1,9) contributes 2 paths THROUGH node 8 (σ_s·σ_t product, not
    # a flag): score(8) = 2 + 1 + 1 from pairs (1,9),(2,9),(3,9);
    # nodes 2 and 3 carry one path each for (1,9).
    _write_graph(spark, tmp_path, [(1, 2), (1, 3), (2, 8), (3, 8), (8, 9)])
    got = {
        (r["node"], r["score"], r["n_pairs"])
        for _, r in R.ALL_QUERIES["graph_betweenness_sampled"](
            spark, str(tmp_path)
        ).toPandas().iterrows()
    }
    assert got == {(8, 4, 3), (2, 1, 1), (3, 1, 1)}


# ---------------------------------------------------------------- D298


def test_correctness_trend_replays_artifacts_exactly(spark):
    # Pure-python replay of the committed CORRECTNESS_r*.json ledger —
    # an oracle-independent pin of the whole aggregation (counts,
    # first-timer attribution, cumulative coverage, truncating ppm).
    import glob
    import json
    import re

    recs = {}
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", p).group(1))
        recs[rnd] = json.load(open(p))
    assert len(recs) >= 11
    first = {}
    for rnd in sorted(recs):
        for q in recs[rnd]:
            first.setdefault(q, rnd)
    want, cum = [], 0
    for rnd in sorted(recs):
        d = recs[rnd]
        nh = sum(1 for v in d.values() if v.get("hash_match"))
        nr = sum(1 for v in d.values() if v.get("rows_match"))
        nf = sum(1 for q, fr in first.items() if fr == rnd)
        cum += nf
        want.append(
            (rnd, len(d), nh, nr, nf, cum, nh * 1000000 // len(d))
        )
    got = [
        tuple(r)
        for r in R.ALL_QUERIES["correctness_trend_report"](spark, SF_DIR)
        .orderBy("round")
        .collect()
    ]
    assert got == want
    # the round-11 row is the 50/50 driver-green round
    r11 = [w for w in want if w[0] == 11][0]
    assert r11[1] == 50 and r11[6] == 1000000


# -------------------------------------------- bench calibration gate


def test_bench_relative_gate_separates_host_speed_from_regression(tmp_path):
    # VERDICT r11 task 6: panel_total judged RELATIVE to the pinned
    # CPU/shuffle probes. A 2x-slower host with a 2x panel passes; the
    # same panel growth on an UNCHANGED host fails.
    import importlib.util
    import json
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "check_artifacts", "/root/repo/scripts/check_artifacts.py"
    )
    mod = importlib.util.module_from_spec(spec)
    _sys.modules["check_artifacts"] = mod
    spec.loader.exec_module(mod)

    prev = {
        "panel_total": 15.0, "cpu_probe_sec": 1.0, "shuffle_probe_sec": 0.2,
        "loadavg_1m_start": 0.1,
    }
    (tmp_path / "BENCH_r12.json").write_text(json.dumps(prev))

    def check(cur):
        p = tmp_path / "BENCH_r13.json"
        p.write_text(json.dumps(cur))
        return mod.check_bench_relative(
            str(tmp_path), str(p), 13, cur
        )

    slow_host = dict(prev, panel_total=30.0, cpu_probe_sec=2.0,
                     shuffle_probe_sec=0.4)
    assert check(slow_host) is True
    regression = dict(prev, panel_total=30.0)  # probes unchanged
    assert check(regression) is False
    within_margin = dict(prev, panel_total=19.0)  # +27% < 30% margin
    assert check(within_margin) is True
    # a probe-less BENCH at round >= 12 fails the gate outright
    assert check({"panel_total": 15.0}) is False
    # and the first probed BENCH (no probed predecessor) just records
    (tmp_path / "BENCH_r12.json").write_text(json.dumps({"panel_total": 14.0}))
    assert check(slow_host) is True
