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


# ---------------------------------------------------------------- D299


def test_delta_ivm_with_deletes_matches_full_recompute(spark, tmp_path):
    # Counting-algebra IVM: after every batch (inserts AND deletes on
    # both sides, staggered), the materialized view must equal the
    # from-scratch net(A) ⋈ net(B); a replayed batch is a no-op; a
    # delete meeting a delete exercises the +1 inclusion-exclusion
    # term insert-only IVM lacks.
    from mapreduce_project_spark.sources.io import (
        merge_join_view_delta,
        read_join_view_delta,
    )

    state = str(tmp_path / "ivm")

    def adf(rows):
        return spark.createDataFrame(rows, "ak bigint, av string, op string")

    def bdf(rows):
        return spark.createDataFrame(rows, "bk bigint, bv string, op string")

    a_net: dict = {}
    b_net: dict = {}

    def apply_net(net, rows):
        for k, v, op in rows:
            net[(k, v)] = net.get((k, v), 0) + (1 if op == "insert" else -1)

    def expect():
        want = {}
        for (ak, av), ma in a_net.items():
            for (bk, bv), mb in b_net.items():
                if ak == bk:
                    key = (ak, av, bk, bv)
                    want[key] = want.get(key, 0) + ma * mb
        return {k + (m,) for k, m in want.items() if m > 0}

    def got():
        return {
            (r["ak"], r["av"], r["bk"], r["bv"], r["_m"])
            for r in read_join_view_delta(spark, state).collect()
        }

    batches = [
        # batch 0: seed both sides
        ([(1, "a1", "insert"), (2, "a2", "insert")],
         [(1, "b1", "insert"), (2, "b2", "insert"), (2, "b2x", "insert")]),
        # batch 1: a-only (staggered) — new A row joins old B
        ([(2, "a2b", "insert")], None),
        # batch 2: delete an A row -> retracts its join rows
        ([(2, "a2", "delete")], None),
        # batch 3: delete on BOTH sides of the same key — the ΔA⋈ΔB
        # (-1)·(-1) term must add back what the two old-side terms
        # double-retracted
        ([(1, "a1", "delete")], [(1, "b1", "delete")]),
        # batch 4: re-insert after delete — the row must reappear
        ([(1, "a1", "insert")], [(1, "b1", "insert")]),
    ]
    for i, (ab, bb) in enumerate(batches):
        merge_join_view_delta(
            spark, state, i,
            adf(ab) if ab is not None else None,
            bdf(bb) if bb is not None else None,
            "ak", "bk",
        )
        if ab:
            apply_net(a_net, ab)
        if bb:
            apply_net(b_net, bb)
        assert got() == expect(), f"divergence after batch {i}"

    final = got()
    assert final, "vacuous: empty final view"
    # the net-zero key-1 pair existed, vanished at batch 3, and is back
    assert (1, "a1", 1, "b1", 1) in final
    # replaying batches 2 and 4 (post-crash retries) changes nothing
    merge_join_view_delta(spark, state, 2, adf(batches[2][0]), None, "ak", "bk")
    merge_join_view_delta(
        spark, state, 4, adf(batches[4][0]), bdf(batches[4][1]), "ak", "bk"
    )
    assert got() == final


def test_delta_ivm_rejects_bad_ops_and_overlap(spark, tmp_path):
    import pytest as _pytest

    from mapreduce_project_spark.sources.io import merge_join_view_delta

    a = spark.createDataFrame([(1, "x", "upsert")], "ak bigint, av string, op string")
    with _pytest.raises(ValueError, match="unknown op"):
        merge_join_view_delta(spark, str(tmp_path / "s1"), 0, a, None, "ak", "bk")
    a2 = spark.createDataFrame([(1, "x", "insert")], "k bigint, v string, op string")
    b2 = spark.createDataFrame([(1, "y", "insert")], "k bigint, v string, op string")
    with _pytest.raises(ValueError, match="disjoint"):
        merge_join_view_delta(spark, str(tmp_path / "s2"), 0, a2, b2, "k", "k")


# ---------------------------------------------------------------- D300


def test_mips_prunes_low_norm_octaves_and_stays_exact(spark, tmp_path):
    # Skewed-norm corpus (the regime norm pruning exists for): 8 unit
    # one-hot queries, per query ≥10 "heavy" half-norm vectors on its
    # dim GUARANTEED inside the md5 pilot sample (ids chosen by
    # hashing, the D285 discipline), and a sea of low-norm noise on
    # disjoint dims. The pilot k-th is then 500·1000 per query, so the
    # noise octave is provably prunable — and the exact top-10 is the
    # 10 smallest heavy ids of the query's dim at dot 500000.
    import hashlib

    n = 400
    thr = format(min(0xFFFFFFFF, (256 << 32) // n), "08x")

    def sampled(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:8] < thr

    rows = []
    for qd in range(8):  # queries: ids 1..8, one-hot dims 0..7
        v = [0.0] * 64
        v[qd] = 1.0
        rows.append((qd + 1, v, 0))
    # heavies: for each query dim, 10 in-sample ids + 5 out-of-sample
    pool_in = [i for i in range(100, 5000) if sampled(i)]
    pool_out = [i for i in range(100, 5000) if not sampled(i)]
    heavy = {}
    ii = oo = 0
    for qd in range(8):
        ids = pool_in[ii : ii + 10] + pool_out[oo : oo + 5]
        ii += 10
        oo += 5
        heavy[qd] = sorted(ids)
        for k, i in enumerate(ids):
            v = [0.0] * 64
            v[qd] = 0.5
            v[8 + (k % 8)] = 0.25
            rows.append((i, v, 1))
    used = {r[0] for r in rows}
    noise_ids = [i for i in range(10000, 20000) if i not in used]
    k = 0
    while len(rows) < n:
        v = [0.0] * 64
        v[16 + (k % 48)] = 0.25
        rows.append((noise_ids[k], v, 2))
        k += 1
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = R.ALL_QUERIES["similarity_topk_mips"](spark, str(tmp_path)).toPandas()
    assert len(got) == 80  # 8 queries x top-10
    # buckets: noise vn2=62500 (bitlen 16), heavy 312500 (19),
    # query 1e6 (20) — exactly the noise octave is prunable
    assert set(got.n_buckets_total) == {3}
    assert set(got.n_buckets_pruned) == {1}
    # scanned = heavies (120) + queries (8) - self
    assert set(got.n_scanned) == {127}
    for qd in range(8):
        sub = got[got.query_id == qd + 1].sort_values("rank")
        assert list(sub.vec_id) == heavy[qd][:10]
        assert set(sub.dot_milli2) == {1000 * 500}


def test_mips_real_fixture_matches_brute_force(spark):
    # On the ~equal-norm fixture pruning honestly does nothing — and
    # the result must still equal the brute-force integer-dot top-10
    # (exactness is unconditional, not a pruning side-effect).
    got = R.ALL_QUERIES["similarity_topk_mips"](spark, SF_DIR).toPandas()
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    brute = con.sql("""
        WITH e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
                     x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS vm
                   FROM embeddings),
        q AS (SELECT vec_id AS qid, vm AS qm FROM e ORDER BY vec_id LIMIT 8)
        SELECT qid, vec_id, dot FROM (
          SELECT q.qid, e.vec_id,
                 list_reduce(list_transform(generate_series(1, 64),
                   i -> q.qm[i] * e.vm[i]), (x, y) -> x + y) AS dot,
                 row_number() OVER (PARTITION BY q.qid ORDER BY
                   list_reduce(list_transform(generate_series(1, 64),
                     i -> q.qm[i] * e.vm[i]), (x, y) -> x + y) DESC,
                   e.vec_id) AS rk
          FROM q JOIN e ON e.vec_id <> q.qid
        ) WHERE rk <= 10
    """).fetchall()
    want = {(r[0], r[1], r[2]) for r in brute}
    assert {
        (r["query_id"], r["vec_id"], r["dot_milli2"])
        for _, r in got.iterrows()
    } == want


# ---------------------------------------------------------------- D301


def test_hits_star_fixture_closed_form(spark, tmp_path):
    # Customers 1..5 all order from supplier 101; customer 1 also from
    # 102. Python replay of the exact 4-round integer recursion pins
    # every score (101 dominates authorities; customer 1 the hubs).
    import datetime

    edges = [(c, 101) for c in range(1, 6)] + [(1, 102)]
    orders, lis = [], []
    for i, (c, s) in enumerate(edges):
        orders.append((5000 + i, c, datetime.date(1995, 1, 7)))
        lis.append((5000 + i, s))
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lis, "l_orderkey bigint, l_suppkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    h = {c: 1000 for c in range(1, 6)}
    a = {}
    for _ in range(4):
        raw_a = {}
        for c, s in edges:
            raw_a[s] = raw_a.get(s, 0) + h[c]
        m = max(raw_a.values())
        a = {s: r * 1000 // m for s, r in raw_a.items()}
        raw_h = {}
        for c, s in edges:
            raw_h[c] = raw_h.get(c, 0) + a[s]
        m = max(raw_h.values())
        h = {c: r * 1000 // m for c, r in raw_h.items()}

    def rank(d):
        return {
            (i + 1, node, score)
            for i, (node, score) in enumerate(
                sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }

    got = R.ALL_QUERIES["graph_hits_bipartite"](spark, str(tmp_path)).collect()
    got_a = {(r["rank"], r["node"], r["score_milli"])
             for r in got if r["kind"] == "authority"}
    got_h = {(r["rank"], r["node"], r["score_milli"])
             for r in got if r["kind"] == "hub"}
    assert got_a == rank(a)
    assert got_h == rank(h)
    assert (1, 101, 1000) in got_a  # the endorsed supplier
    assert (1, 1, 1000) in got_h    # the concentrating customer
