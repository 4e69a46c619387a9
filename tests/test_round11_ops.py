"""Planted-fixture tests for the round-11 operators: each test
constructs the specific condition the operator's docstring claims to
handle and pins the exact expected output, so a regression fails with
a diagnosis instead of an opaque oracle hash mismatch."""

from __future__ import annotations

import hashlib

import mapreduce_project_spark.queries_registry as R
from tests.conftest import SF_DIR, rows_of

# ---------------------------------------------------------------- D285


def _auto_thr(n: int, target: int = 2048) -> str:
    # the round-12 auto-rate predicate (D286 convention): r=min(1,
    # target/N) rendered as floor(r*2^32) hex; N <= target saturates
    return format(min(0xFFFFFFFF, (target << 32) // max(1, n)), "08x")


def _in_auto_sample(i: int, n: int) -> bool:
    return n <= 2048 or (
        hashlib.md5(str(i).encode()).hexdigest()[:8] < _auto_thr(n)
    )


def test_sampled_ladder_candidates_equal_exact_twin(spark):
    # Candidate machinery is shared with D221 verbatim: on the real
    # fixture the per-width candidate counts and fractions must be
    # IDENTICAL. Round-12 re-pin: the truth sample is AUTO-RATE
    # (r = min(1, 2048/N)); the sf0.001 fixture is far below 2048
    # vectors, so r saturates at 1 and the truth columns must equal
    # the exact twin EXACTLY (full-corpus sample, no md5 filter).
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
    assert samp.n_true_sampled.iloc[0] > 0
    assert list(samp.n_true_sampled) == list(exact.n_true)
    assert list(samp.n_caught_sampled) == list(exact.n_caught)


def test_sampled_ladder_truth_gated_by_auto_rate_sample(spark, tmp_path):
    # Above saturation the md5 gate must cut the truth denominator.
    # 2400 deterministic ±1 vectors (> 2048 ⇒ r = 2048/2400 < 1): ±1
    # components make every dot an exact small integer in float32/64
    # (any summation order), norms are exactly 64, and cos ≥ 0.3 ⟺
    # dot ≥ 20 (19.2 is not an integer — no boundary ambiguity), so a
    # numpy twin predicts the engine's sampled truth count EXACTLY.
    import numpy as np

    n = 2400
    thr = _auto_thr(n)
    ids = list(range(100, 100 + n))
    rng = np.random.default_rng(7)
    mat = (rng.integers(0, 2, size=(n, 64)) * 2 - 1).astype(np.float64)
    # plant one identical pair INSIDE the sample (cos = 1 ⇒ truth) and
    # one pair straddling the gate (must NOT reach the truth set)
    in_ids = [i for i in ids if _in_auto_sample(i, n)]
    out_ids = [i for i in ids if not _in_auto_sample(i, n)]
    assert len(out_ids) > 0, "auto-rate gate vacuous at n=2400"
    pos = {v: k for k, v in enumerate(ids)}
    a1, a2 = in_ids[0], in_ids[1]
    b1, b2 = in_ids[2], out_ids[0]
    mat[pos[a2]] = mat[pos[a1]]
    mat[pos[b2]] = mat[pos[b1]]

    spark.createDataFrame(
        [(i, [float(x) for x in mat[pos[i]]], 0) for i in ids],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    # numpy twin of the sampled truth set
    s_idx = [pos[i] for i in sorted(in_ids)]
    sub = mat[s_idx]
    dots = sub @ sub.T
    want_true = int((np.triu(dots, 1) >= 19.2).sum())
    full = mat @ mat.T
    full_true = int((np.triu(full, 1) >= 19.2).sum())

    samp = (
        R.ALL_QUERIES["lsh_width_ladder_sampled"](spark, str(tmp_path))
        .toPandas().sort_values("width").reset_index(drop=True)
    )
    assert list(samp.n_true_sampled) == [want_true] * 3
    # the gate genuinely cut the denominator (pair b1-b2 among others)
    assert want_true < full_true
    assert (samp.n_caught_sampled <= samp.n_true_sampled).all()
    # recall arithmetic is the pinned truncating ppm
    for _, r in samp.iterrows():
        assert r.recall_ppm == r.n_caught_sampled * 1000000 // want_true


# ---------------------------------------------------------------- D286


def _in_half_sample(i: int) -> bool:
    return hashlib.md5(str(i).encode()).hexdigest()[:8] < "80000000"


def test_recall_cert_certifies_planted_high_cosine_corpus(spark, tmp_path):
    # On a TRUE near-dup corpus the certificate must pass: plant two
    # identical-vector pairs with all four ids inside the 50% md5
    # sample (6, 9) and (11, 17) — identical vectors share every LSH
    # code, so both pairs are caught at any width -> recall 1e6,
    # certified = 1. Background = disjoint one-hots (pairwise cos 0).
    for i in (6, 9, 11, 17):
        assert _in_half_sample(i)
    vec_a = [1.0 if d < 4 else 0.0 for d in range(64)]
    vec_b = [1.0 if 4 <= d < 8 else 0.0 for d in range(64)]
    rows = [(6, vec_a, 0), (9, vec_a, 0), (11, vec_b, 0), (17, vec_b, 0)]
    for k, i in enumerate([0, 1, 2, 3, 4, 5, 7, 8, 10, 12]):
        rows.append((i, [1.0 if d == 8 + k else 0.0 for d in range(64)], 1))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = R.ALL_QUERIES["dedup_semantic_recall_cert"](
        spark, str(tmp_path)
    ).collect()[0]
    assert got["n_true_sampled"] == 2
    assert got["n_caught_sampled"] == 2
    assert got["recall_ppm"] == 1000000
    assert got["certified"] == 1
    assert got["nb"] == 8  # clamp floor at this corpus size


def test_recall_cert_honestly_fails_near_orthogonal_fixture(spark, duck):
    # The fixture's qualifying regime (cos >= 0.3, max pair ~0.51) is
    # the documented cannot-prune zone for sign-LSH: the certificate
    # must be NON-vacuous and must NOT certify — the pre-release
    # answer that stops a lossy-config ship.
    got = R.ALL_QUERIES["dedup_semantic_recall_cert"](spark, SF_DIR).collect()[0]
    assert got["n_true_sampled"] > 0, "vacuous certificate"
    assert 0 < got["n_caught_sampled"] < got["n_true_sampled"]
    assert got["certified"] == 0


# ---------------------------------------------------------------- D287


def test_v8_drop_attribution_per_modality_gate(spark, tmp_path):
    # 12 docs, one source: 9 with valid identical-norm embeddings
    # (pass), one NULL embedding (invalid), one wrong-dim (invalid),
    # one with a 100x-norm embedding (outlier via the zero-IQR fence),
    # and one doc with NO embedding row (missing). The release must
    # ship exactly the 9 passing docs (p90 edge at n=9 keeps all) and
    # the manifest must attribute every drop to its gate.
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",
        "alpha beta gamma delta epsilon theta",
        "alpha beta gamma delta epsilon iota",
        "alpha beta gamma delta epsilon kappa",
        "alpha beta gamma delta epsilon lam",
        "alpha beta gamma delta epsilon mu",
        "alpha beta gamma delta epsilon nu",
        "alpha beta gamma delta epsilon xi",
        "alpha beta gamma delta epsilon omicron",  # null embedding
        "alpha beta gamma delta epsilon pi",       # wrong-dim
        "alpha beta gamma delta epsilon rho",      # outlier norm
        "alpha beta gamma delta epsilon sigma",    # missing row
    ]
    docs = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    good = [0.1] * 64
    emb = [(i, good, 0) for i in range(9)]
    emb.append((9, None, 0))
    emb.append((10, [1.0, 2.0], 0))
    emb.append((11, [10.0] * 64, 0))
    # doc 12 has no embedding row at all
    spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = R.ALL_QUERIES["assemble_training_set_v8"](spark, str(tmp_path)).toPandas()
    assert int(got.n_docs.sum()) == 9
    drops = set(
        zip(
            got.n_dropped_vec_missing,
            got.n_dropped_vec_invalid,
            got.n_dropped_vec_outlier,
            got.n_dropped_kn,
        )
    )
    assert drops == {(1, 2, 1, 0)}, drops


def test_v8_matches_oracle_on_planted_fixture(spark, tmp_path):
    # Same planted fixture shape, hash-compared against the nested
    # oracle (flagship parity transitively re-verifies the KN,
    # readability and hygiene sub-oracles on the poison classes).
    test_v8_drop_attribution_per_modality_gate(spark, tmp_path)
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    got = R.ALL_QUERIES["assemble_training_set_v8"](spark, str(tmp_path)).toPandas()
    want = con.sql(R.ALL_ORACLES["assemble_training_set_v8"]).df()
    assert rows_of(got) == rows_of(want)


# ---------------------------------------------------------------- D288


def test_join_order_advisor_predictions_equal_actual_join_sizes(spark, duck):
    # The advisor's numbers are EXACT counts, not estimates: audit by
    # running the actual filtered joins and comparing row counts.
    from pyspark.sql import functions as F

    got = {
        r["join_order"]: r
        for r in R.ALL_QUERIES["join_order_advisor"](spark, SF_DIR).collect()
    }
    assert set(got) == {"customer_orders_first", "orders_lineitem_first"}
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    i1 = cu.join(od, cu["c_custkey"] == od["o_custkey"]).count()
    i2 = od.join(li, od["o_orderkey"] == li["l_orderkey"]).count()
    fin = (
        cu.join(od, cu["c_custkey"] == od["o_custkey"])
        .join(li, od["o_orderkey"] == li["l_orderkey"])
        .count()
    )
    assert got["customer_orders_first"]["intermediate_rows"] == i1
    assert got["orders_lineitem_first"]["intermediate_rows"] == i2
    assert got["customer_orders_first"]["final_rows"] == fin
    assert got["orders_lineitem_first"]["final_rows"] == fin
    # the chosen order is the provable minimum
    chosen = [r for r in got.values() if r["chosen"] == 1]
    assert len(chosen) == 1
    assert chosen[0]["intermediate_rows"] == min(i1, i2)
    ranks = sorted(r["rank"] for r in got.values())
    assert ranks == [1, 2]


# ---------------------------------------------------------------- D289


def test_sketch_preflight_planted_overlap(spark, tmp_path):
    # suppliers {1..5}, lineitem suppkeys {3..8}: common = {3,4,5};
    # lineitem has 2 rows per suppkey -> predicted = 3 keys * 2 * 1.
    # Inside theta's exactness window the sketch MUST equal exact.
    sup = [(k, f"s{k}") for k in range(1, 6)]
    li = [(i, k) for i, k in enumerate([3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8])]
    spark.createDataFrame(sup, "s_suppkey long, s_name string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(li, "l_orderkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    got = R.ALL_QUERIES["join_preflight_sketch_audit"](
        spark, str(tmp_path)
    ).collect()[0]
    assert got["n_keys_left"] == 6 and got["n_keys_right"] == 5
    assert got["n_keys_common"] == 3
    assert got["n_common_sketch"] == 3
    assert got["sketch_err_ppm"] == 0
    assert got["predicted_rows"] == 6


# ---------------------------------------------------------------- D290


def test_layout_advisor_planted_row_bytes(spark, tmp_path):
    # events fixed width = 8*3 + 8 + 4*2 = 40; two rows with 2-byte
    # event_type and 2-byte props -> 44 B/row, 88 B total, 1 partition.
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 10, "ab", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 11, "cd", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    # the advisor also reads lineitem/orders; give it tiny ones
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", dt.datetime(2024, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["table_name"]: r
        for r in R.ALL_QUERIES["partition_layout_advisor"](
            spark, str(tmp_path)
        ).collect()
    }
    ev = got["events"]
    assert ev["n_rows"] == 2
    assert ev["logical_bytes"] == 88
    assert ev["recommended_partitions"] == 1
    assert ev["rows_per_partition"] == 2
    assert ev["avg_row_bytes"] == 44
    # lineitem: fixed 8*3+4+8*4+8+4*2 = 76 + 1 + 1 = 78
    assert got["lineitem"]["logical_bytes"] == 78
    # orders: fixed 8+8+8+8+4*2 = 40 + 1 + 8 = 49
    assert got["orders"]["logical_bytes"] == 49


# ---------------------------------------------------------------- D291


def test_clustering_coefficient_triangle_vs_star(spark, tmp_path):
    # Co-supply fixture: order 1 supplied by {1,2,3} (a triangle —
    # each node deg 2, cc = 1e6); orders 2-4 form a star around
    # supplier 4 (deg 3, zero triangles -> cc 0; leaves deg 1 -> 0).
    import datetime as dt

    d = dt.datetime(1995, 2, 1)
    orders = [(k, k, "O", 1.0, d, "1-URGENT") for k in range(1, 5)]
    lines = [(1, 1), (1, 2), (1, 3), (2, 4), (2, 5), (3, 4), (3, 6), (4, 4), (4, 7)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["cc_ppm"])
        for r in R.ALL_QUERIES["graph_clustering_coefficient"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (2, 1, 1000000)
    assert got[2] == (2, 1, 1000000)
    assert got[3] == (2, 1, 1000000)
    assert got[4] == (3, 0, 0)  # the star center: high degree, cc 0
    assert got[5] == (1, 0, 0) and got[6] == (1, 0, 0) and got[7] == (1, 0, 0)


# ---------------------------------------------------------------- D292


def test_query_likelihood_replays_closed_form(spark, tmp_path):
    # Three docs: one with all three query terms, one with one term,
    # one with none. Replay the exact integer Dirichlet arithmetic in
    # Python and pin scores AND order.
    import math

    texts = {
        0: "spark shuffle vector spark pipeline",
        1: "shuffle only here with filler words",
        2: "nothing relevant at all whatsoever",
    }
    docs = [(i, t2, "en", "s", len(t2)) for i, t2 in texts.items()]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["dlen"], r["score_micro"], r["rank"])
        for r in R.ALL_QUERIES["search_query_likelihood"](
            spark, str(tmp_path)
        ).collect()
    }
    toks = {i: t2.split() for i, t2 in texts.items()}
    T = sum(len(v) for v in toks.values())
    cf = {
        q: sum(v.count(q) for v in toks.values())
        for q in ("spark", "shuffle", "vector")
    }

    def uln(x):
        return round(math.log(x) * 1000000)

    want = {}
    for i, v in toks.items():
        dlen = len(v)
        s = 0
        for q in ("spark", "shuffle", "vector"):
            a = max(1, v.count(q) * T + 2000 * cf[q])
            s += uln(a) - uln((dlen + 2000) * T)
        want[i] = (dlen, s)
    for i in texts:
        assert got[i][0] == want[i][0] and got[i][1] == want[i][1], (i, got[i], want[i])
    ranks = {i: got[i][2] for i in texts}
    assert ranks[0] == 1  # all three terms
    assert ranks[1] == 2  # one term
    assert ranks[2] == 3  # none


# ---------------------------------------------------------------- D293


def test_conformal_intervals_cover_and_partition(spark, duck):
    # Properties on the real fixture: the three md5 splits partition
    # each type's events; intervals are symmetric around the point
    # prediction; empirical test coverage sits near the 90% target
    # (binomial noise band) — the conformal guarantee as a number.
    rows = R.ALL_QUERIES["conformal_value_intervals"](spark, SF_DIR).collect()
    assert rows, "no event types scored"
    totals = {
        r[0]: r[1]
        for r in duck.sql(
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) FROM events GROUP BY 1"
        ).fetchall()
    }
    for r in rows:
        assert r["n_train"] + r["n_cal"] + r["n_test"] == totals[r["event_type"]]
        assert r["lo_cents"] == r["pred_cents"] - r["qhat_cents"]
        assert r["hi_cents"] == r["pred_cents"] + r["qhat_cents"]
        assert 800000 <= r["coverage_ppm"] <= 1000000, (
            r["event_type"], r["coverage_ppm"],
        )


# ---------------------------------------------------------------- D294


def test_zipf_slope_planted_power_law(spark, tmp_path):
    # Plant an exact power law f(rk) = 640 // rk over 8 distinct terms
    # in one source: the log-log fit must recover slope ~= -1000
    # (alpha = 1) with near-perfect r2; a flat source (all terms equal
    # frequency) must fit slope 0.
    words = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    text_zipf = " ".join(
        " ".join([w] * (640 // (i + 1))) for i, w in enumerate(words)
    )
    text_flat = " ".join(" ".join([w] * 10) for w in words)
    docs = [
        (0, text_zipf, "en", "zipf", len(text_zipf)),
        (1, text_flat, "en", "flat", len(text_flat)),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in R.ALL_QUERIES["source_zipf_slope"](spark, str(tmp_path)).collect()
    }
    z = got["zipf"]
    assert z["n_terms"] == 8
    # 640//rk deviates from the ideal power law only by floor rounding
    assert -1050 <= z["slope_milli"] <= -950, z["slope_milli"]
    assert z["r2_ppm"] > 990000, z["r2_ppm"]
    f = got["flat"]
    assert f["slope_milli"] == 0 and f["r2_ppm"] == 0
