"""Continuation-batch operators: bloom decontamination audit (D175),
exact-register HLL (D176), DP noisy counts (D177).  Each is
oracle-checked by tests/test_oracle.py; these tests pin the SEMANTICS
against independent pure-Python (hashlib/math) reimplementations."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import mapreduce_project_spark.queries_registry as R  # noqa: F401 — must precede plans.*
from tests.conftest import SF_DIR


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _grams(text: str, n: int = 3) -> set[str]:
    toks = re.findall(r"[a-z]+", text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _bloom_pos(gram: str, j: int, m: int = 262144) -> int:
    return int(_md5hex(f"{gram}#{j}")[:8], 16) % m


def test_bloom_audit_matches_pure_python(spark):
    from mapreduce_project_spark.sources import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    is_test = {d: _md5hex(str(d))[:8] < "20000000" for d in docs}
    bench_grams = set().union(
        *(_grams(t) for d, t in docs.items() if is_test[d])
    ) or set()
    bits = {_bloom_pos(g, j) for g in bench_grams for j in range(3)}
    got = {
        r["doc_id"]: r
        for r in R.ALL_QUERIES["decontam_bloom_audit"](spark, SF_DIR).collect()
    }
    train_ids = [d for d in docs if not is_test[d] and _grams(docs[d])]
    assert set(got) == set(train_ids)
    fp_total = 0
    for d in train_ids:
        gs = _grams(docs[d])
        flagged = {g for g in gs if all(_bloom_pos(g, j) in bits for j in range(3))}
        true_hits = gs & bench_grams
        r = got[d]
        assert r["n_grams"] == len(gs)
        assert r["n_flagged"] == len(flagged)
        assert r["n_true_hits"] == len(true_hits)
        # a bloom filter has no false negatives, ever
        assert true_hits <= flagged
        fp_total += len(flagged) - len(true_hits)
    # the audit's raison d'etre: the FP mass column is exactly
    # n_flagged - n_true_hits (>= 0 per doc; may be 0 at tiny SF)
    assert all(r["n_flagged"] >= r["n_true_hits"] for r in got.values())
    assert fp_total >= 0


def _hll_rho(w: int) -> int:
    return 53 if w == 0 else 53 - w.bit_length()


def _hll_estimate(z_scaled: int, n_regs: int) -> float:
    """The two-branch HLL estimator (raw + small-range LinearCounting),
    the independent model the query must match bit-for-bit."""
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 65536.0 * 9007199254740992.0 / float(z_scaled)
    if raw <= 640.0 and n_regs < 256:
        return 256.0 * math.log(256.0 / float(256 - n_regs))
    return raw


def test_hll_registers_match_pure_python(spark):
    from mapreduce_project_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    users: dict[str, set[int]] = defaultdict(set)
    for r in ev:
        hv = int(_md5hex(str(r["user_id"]))[:15], 16)
        reg, w = hv % 256, hv // 256
        rho = _hll_rho(w)
        regs[r["event_type"]][reg] = max(regs[r["event_type"]].get(reg, 0), rho)
        users[r["event_type"]].add(r["user_id"])
    got = {
        r["event_type"]: r
        for r in R.ALL_QUERIES["sketch_hll_registers_exact"](spark, SF_DIR).collect()
    }
    assert set(got) == set(regs)
    for et, rmap in regs.items():
        z = sum(1 << (53 - m) for m in rmap.values()) + (256 - len(rmap)) * (1 << 53)
        r = got[et]
        assert r["z_scaled"] == z
        assert r["n_regs"] == len(rmap)
        assert r["n_exact"] == len(users[et])
        want = _hll_estimate(z, len(rmap))
        assert abs(r["hll_est"] - want) <= abs(want) * 1e-12
        # estimator sanity: within a wide envelope of exact (m=256
        # HLL RSE is ~6.5%; allow 4 sigma for the fixture's one draw)
        assert abs(r["hll_est"] / r["n_exact"] - 1.0) < 0.3


def test_hll_small_range_linear_counting(spark, tmp_path):
    # Regression for the round-6 bug: with most registers empty the raw
    # Flajolet estimator degenerates to ~alpha*m (~190 for m=256), so a
    # planted 15-distinct-user group MUST take the LinearCounting branch.
    import datetime

    rows = [
        ("tiny", uid, datetime.datetime(2024, 1, 1, 0, 0, uid % 60))
        for uid in range(1, 16)
        for _ in range(3)  # duplicates must not change the estimate
    ]
    spark.createDataFrame(rows, "event_type string, user_id bigint, ts timestamp") \
        .write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = R.ALL_QUERIES["sketch_hll_registers_exact"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_exact"] == 15
    assert r["n_regs"] <= 15
    want = _hll_estimate(r["z_scaled"], r["n_regs"])
    assert abs(r["hll_est"] - want) <= abs(want) * 1e-12
    # the LC branch fired: the estimate is near 15, nowhere near alpha*m
    assert abs(r["hll_est"] / 15.0 - 1.0) < 0.3
    assert r["hll_est"] < 100.0


def test_hll_register_table_is_mergeable(spark):
    # the mergeability CONTRACT: registers of A ∪ B = elementwise max
    # of A's and B's registers — proven on the pure-python model the
    # query's registers were just shown to equal
    from mapreduce_project_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id").collect()
    uids = [r["user_id"] for r in ev]
    half = len(uids) // 2

    def reg_table(us):
        t: dict[int, int] = {}
        for u in us:
            hv = int(_md5hex(str(u))[:15], 16)
            t[hv % 256] = max(t.get(hv % 256, 0), _hll_rho(hv // 256))
        return t

    a, b, full = reg_table(uids[:half]), reg_table(uids[half:]), reg_table(uids)
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == full


def test_dp_noise_matches_pure_python_and_is_bounded(spark):
    rows = R.ALL_QUERIES["dp_noisy_source_counts"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        u = (int(_md5hex(f"dp1:{r['source']}:{r['lang']}")[:8], 16) + 0.5) / 4294967296.0
        lap = -math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
        noise_micro = round(lap * 1e6)
        n = (r["noisy_count_micro"] - noise_micro) / 1_000_000
        assert n == int(n) and n >= 1  # residual is an exact whole count
        assert r["epsilon_micro"] == 1_000_000
        # Laplace(b=1) noise from a 32-bit seeded uniform is bounded by
        # ln(2^32) ≈ 22.18
        assert abs(noise_micro) <= 22_200_000
    # determinism: the seeded release is reproducible run-to-run
    again = R.ALL_QUERIES["dp_noisy_source_counts"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dp_epsilon_calibrates_noise_scale(spark):
    # The Laplace mechanism's defining calibration: scale b = 1/epsilon,
    # so with the SAME seeded uniform, doubling epsilon halves the noise
    # (exactly, pre-quantization; +-1 micro after independent rounding).
    # This pins that epsilon actually reaches the mechanism — a release
    # that ignored epsilon would pass the distribution checks above.
    from mapreduce_project_spark.plans.relational_queries import (
        dp_noisy_source_counts,
    )

    e1 = {
        (r["source"], r["lang"]): r
        for r in dp_noisy_source_counts(spark, SF_DIR, epsilon=1.0).collect()
    }
    e2 = {
        (r["source"], r["lang"]): r
        for r in dp_noisy_source_counts(spark, SF_DIR, epsilon=2.0).collect()
    }
    assert set(e1) == set(e2) and e1
    saw_nonzero = False
    for (source, lang), r1 in e1.items():
        r2 = e2[(source, lang)]
        assert r1["epsilon_micro"] == 1_000_000
        assert r2["epsilon_micro"] == 2_000_000
        # replay the seeded draw: the noise is deterministic, so the
        # true count is recoverable and must agree across both releases
        u = (int(_md5hex(f"dp1:{source}:{lang}")[:8], 16) + 0.5) / 4294967296.0
        lap = -math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
        n1 = (r1["noisy_count_micro"] - round(lap * 1e6)) / 1_000_000
        n2 = (r2["noisy_count_micro"] - round(lap / 2.0 * 1e6)) / 1_000_000
        assert n1 == int(n1) and n1 >= 1
        assert n1 == n2  # same true count under both epsilons
        saw_nonzero = saw_nonzero or round(lap * 1e6) != 0
    assert saw_nonzero


def test_hll_rolling_window_semantics_and_accuracy(spark):
    # D180: the rolling 7-day sketch must equal the register merge of
    # its days — proven indirectly by recomputing the window's exact
    # distinct set in pure python and checking (a) n_exact equality,
    # (b) estimator accuracy envelope on every window.
    from mapreduce_project_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    by_day: dict = defaultdict(set)
    for r in ev:
        by_day[r["ts"].date()].add(r["user_id"])
    got = {
        r["day"]: r
        for r in R.ALL_QUERIES["sketch_hll_rolling_7d"](spark, SF_DIR).collect()
    }
    assert set(got) == {d.isoformat() for d in by_day}
    for d, users in by_day.items():
        window = set()
        for dd, uu in by_day.items():
            if 0 <= (d - dd).days <= 6:
                window |= uu
        r = got[d.isoformat()]
        assert r["n_exact"] == len(window)
        # m=256 HLL RSE ~6.5%; 4-sigma envelope
        assert abs(r["hll_est"] / r["n_exact"] - 1.0) < 0.3


def test_cms_never_underestimates_and_matches_pure_python(spark):
    # CMS's defining one-sided error: est >= exact for EVERY probed key
    # (each cell upper-bounds the key's count); registers replayed in
    # pure python so the cell derivation itself is pinned.
    rows = R.ALL_QUERIES["sketch_cms_registers_exact"](spark, SF_DIR).collect()
    assert len(rows) == 10
    from mapreduce_project_spark.sources import load_table

    ev = [r["user_id"] for r in load_table(spark, SF_DIR, "events").collect()]
    cells: dict = defaultdict(int)
    counts: dict = defaultdict(int)
    for u in ev:
        counts[u] += 1
        for j in range(4):
            cells[(j, int(_md5hex(f"cms{j}:{u}")[:8], 16) % 256)] += 1
    for r in rows:
        u = r["user_id"]
        assert r["n_exact"] == counts[u]
        want = min(cells[(j, int(_md5hex(f"cms{j}:{u}")[:8], 16) % 256)] for j in range(4))
        assert r["cms_est"] == want
        assert r["cms_est"] >= r["n_exact"]  # never underestimates
