"""Round-6 operator batch: hybrid RRF retrieval (D167), span-corruption
pair building (D168), water-filling token allocation (D169).  Each is
oracle-checked by tests/test_oracle.py; these tests pin the SEMANTICS
against independent pure-Python reimplementations and invariants."""

from __future__ import annotations

import hashlib
import re

import mapreduce_project_spark.queries_registry as R  # noqa: F401 — must precede plans.*
from tests.conftest import SF_DIR


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z]+", text.lower())


def test_hybrid_rrf_fusion_invariants(spark):
    out = R.ALL_QUERIES["search_hybrid_rrf"](spark, SF_DIR).collect()
    assert len(out) == 10
    prev = None
    for r in out:
        rl, rd = r["rank_lex"], r["rank_dense"]
        assert rl >= 0 and rd >= 0 and (rl > 0 or rd > 0)
        # rrf is exactly the two-term fusion of the integer ranks
        # (0 = absent from that ranking, contributes nothing)
        want = (1.0 / (60 + rl) if rl else 0.0) + (1.0 / (60 + rd) if rd else 0.0)
        assert r["rrf"] == want
        if prev is not None:  # ordered by rrf desc, doc_id asc
            assert r["rrf"] < prev["rrf"] or (
                r["rrf"] == prev["rrf"] and r["doc_id"] > prev["doc_id"]
            )
        prev = r
    # the fusion is genuinely hybrid on the fixture: both rankings
    # contribute members to the top-10
    assert any(r["rank_lex"] > 0 for r in out)
    assert any(r["rank_dense"] > 0 for r in out)


def _flag(doc_id: int, i: int) -> bool:
    h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
    return int(h[:8], 16) % 100 < 15


def test_span_corruption_matches_pure_python(spark):
    # independent reimplementation (hashlib + lists) of the T5-style
    # span corruption for a handful of fixture docs — catches any
    # drift in the md5 seeding, run-collapse or render logic
    from mapreduce_project_spark.sources import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .filter("doc_id < 20")
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in R.ALL_QUERIES["denoise_span_corruption_pairs"](spark, SF_DIR)
        .filter("doc_id < 20")
        .collect()
    }
    checked = 0
    for did, text in docs.items():
        tk = _toks(text)
        if len(tk) < 8:
            assert did not in got
            continue
        f = [_flag(did, i) for i in range(1, len(tk) + 1)]
        corrupted, target, n_spans = [], [], 0
        for i, (tok, fi) in enumerate(zip(tk, f)):
            start = fi and (i == 0 or not f[i - 1])
            if not fi:
                corrupted.append(tok)
            elif start:
                corrupted.append("<x>")
            if fi:
                if start:
                    target.append("<x>")
                    n_spans += 1
                target.append(tok)
        r = got[did]
        assert r["n_tokens"] == len(tk)
        assert r["n_dropped"] == sum(f)
        assert r["n_spans"] == n_spans
        assert r["corrupted_text"] == " ".join(corrupted)
        assert r["target_text"] == " ".join(target)
        checked += 1
    assert checked >= 10


def test_water_filling_allocation_exact(spark):
    from mapreduce_project_spark.sources import load_table

    out = R.ALL_QUERIES["source_token_allocation"](spark, SF_DIR).collect()
    total = sum(r["tokens_available"] for r in out)
    budget = total // 2
    # the budget is spent EXACTLY, no allocation exceeds its cap
    assert sum(r["tokens_allocated"] for r in out) == budget
    for r in out:
        assert 0 <= r["tokens_allocated"] <= r["cap"] == 2 * r["tokens_available"]
        assert r["epochs_milli"] == r["tokens_allocated"] * 1000 // r["tokens_available"]
    # independent water-fill: greedy ascending-cap reference
    caps = sorted((r["cap"], r["source"]) for r in out)
    alloc = {}
    rem, cnt = budget, len(caps)
    clipped_at = None
    for idx, (cap, srcname) in enumerate(caps):
        if clipped_at is None and cap * (cnt - idx) <= rem:
            alloc[srcname] = cap
            rem -= cap
        else:
            if clipped_at is None:
                clipped_at = idx
                base, extra = rem // (cnt - idx), rem % (cnt - idx)
            alloc[srcname] = base + (1 if idx - clipped_at < extra else 0)
    got = {r["source"]: r["tokens_allocated"] for r in out}
    assert got == alloc


def test_source_overlap_matrix_invariants(spark):
    out = R.ALL_QUERIES["source_overlap_matrix"](spark, SF_DIR).collect()
    assert out  # the fixture plants near-dups, so cells exist
    diag = [r for r in out if r["src_a"] == r["src_b"]]
    assert diag  # internal duplication shows on the diagonal
    for r in out:
        assert r["src_a"] <= r["src_b"]
        assert 1 <= r["n_docs"] <= 2 * r["n_pairs"]


def test_matryoshka_recall_curve_shape(spark):
    out = {r["dim_prefix"]: r for r in
           R.ALL_QUERIES["matryoshka_recall_curve"](spark, SF_DIR).collect()}
    assert sorted(out) == [8, 16, 32]  # zero-hit prefixes still emit
    for d, r in out.items():
        assert r["n_possible"] == 50
        assert 0 <= r["n_hits"] <= 50
        assert r["recall"] == r["n_hits"] / 50.0
    # more dimensions can only help on this fixture (noise-like
    # embeddings: the 32-dim prefix must beat or match the 8-dim one)
    assert out[32]["n_hits"] >= out[8]["n_hits"]



def test_trigram_backoff_matches_pure_python(spark, tmp_path):
    # Planted corpus pinning all three backoff levels against an
    # independent pure-Python Stupid-Backoff replay:
    #  doc 1: "a b c" x4   -> every trigram count >= 2 (level 3)
    #  doc 2: "a c b z z q" -> novel trigrams over pruned bigrams,
    #                          falls through to level 1 (unigram)
    #  doc 3: "b c x b c x y" -> own repeats give level 3 AND a final
    #                          level-2 ("x y" unseen, "c x"... ) mix
    import math

    texts = {
        1: "a b c a b c a b c a b c",
        2: "a c b z z q",
        3: "b c x b c x y",
    }
    spark.createDataFrame(
        [(i, s, "en", "plant", len(s)) for i, s in texts.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def toks(s):
        return re.findall(r"[a-z]+", s.lower())

    uni, big, tri, n_total = {}, {}, {}, 0
    for s in texts.values():
        t = toks(s)
        n_total += len(t)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(t) - 1):
            big[(t[i], t[i + 1])] = big.get((t[i], t[i + 1]), 0) + 1
        for i in range(len(t) - 2):
            k = (t[i], t[i + 1], t[i + 2])
            tri[k] = tri.get(k, 0) + 1
    big = {k: v for k, v in big.items() if v >= 2}
    tri = {k: v for k, v in tri.items() if v >= 2}
    LN04 = round(math.log(0.4) * 1e6)

    def lnm(n):
        return round(math.log(n) * 1e6)

    want = {}
    for doc_id, s in texts.items():
        t = toks(s)
        n, ssum, h3, h2, h1 = 0, 0, 0, 0, 0
        for i in range(len(t) - 2):
            w1, w2, w3 = t[i], t[i + 1], t[i + 2]
            if (w1, w2, w3) in tri:
                sc, lvl = lnm(tri[(w1, w2, w3)]) - lnm(big[(w1, w2)]), 3
            elif (w2, w3) in big:
                sc, lvl = LN04 + lnm(big[(w2, w3)]) - lnm(uni[w2]), 2
            else:
                sc, lvl = 2 * LN04 + lnm(uni[w3]) - lnm(n_total), 1
            n += 1
            ssum += sc
            h3 += lvl == 3
            h2 += lvl == 2
            h1 += lvl == 1
        want[doc_id] = (n, ssum, h3, h2, h1)

    got = {
        r["doc_id"]: r
        for r in R.ALL_QUERIES["text_trigram_backoff_score"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == set(want)
    saw_levels = set()
    for doc_id, (n, ssum, h3, h2, h1) in want.items():
        g = got[doc_id]
        assert g["n_tri"] == n
        assert g["sum_score_micro"] == ssum
        # truncation toward zero, as Spark div / DuckDB // do on BIGINT
        tz = -((-ssum) // n) if ssum < 0 else ssum // n
        assert g["avg_score_micro"] == tz
        assert (g["n_hit3"], g["n_hit2"], g["n_hit1"]) == (h3, h2, h1)
        for lvl, h in ((3, h3), (2, h2), (1, h1)):
            if h:
                saw_levels.add(lvl)
    # the fixture genuinely exercises all three backoff levels
    assert saw_levels == {1, 2, 3}


def test_token_entropy_planted_corners(spark, tmp_path):
    # source "uni": 4 types x 3 tokens each -> H = ln(12) - ln(3)
    #   exactly, in micro-log arithmetic; evenness vs ln(4)
    # source "mono": one type repeated -> H = 0, evenness pinned to 0
    import math

    docs = [
        (1, "a b c d a b c d a b c d", "en", "uni", 23),
        (2, "z z z z z", "en", "mono", 9),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in R.ALL_QUERIES["token_entropy_by_source"](
            spark, str(tmp_path)
        ).collect()
    }

    def lnm(n):
        return round(math.log(n) * 1e6)

    u = got["uni"]
    assert u["n_tokens"] == 12 and u["n_types"] == 4
    assert u["sum_c_lnc"] == 4 * 3 * lnm(3)
    want_h = lnm(12) - (4 * 3 * lnm(3)) // 12
    assert u["entropy_micro"] == want_h
    assert u["evenness_micro"] == want_h * 1000000 // lnm(4)
    m = got["mono"]
    assert m["n_tokens"] == 5 and m["n_types"] == 1
    assert m["entropy_micro"] == lnm(5) - (5 * lnm(5)) // 5
    assert m["evenness_micro"] == 0


def test_proximity_window_and_order_edges(spark, tmp_path):
    # D213: both orders count, the window is <= 3, and docs missing a
    # term emit nothing.
    import mapreduce_project_spark.queries_registry as R

    docs = [
        (1, "hash join filler filler"),              # dist 1
        (2, "hash aa bb cc join"),                   # dist 4 -> excluded
        (3, "join zz hash"),                         # dist 2, reversed
        (4, "hash only here"),                       # missing 'join'
        (5, "hash a join b hash"),                   # two pairs: 2 and 2? (0,2)=2,(4,2)=2
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["best_dist"], r["n_matches"])
        for r in R.ALL_QUERIES["search_proximity"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 1), 3: (2, 1), 5: (2, 2)}
