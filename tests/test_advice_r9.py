"""Round-9 ADVICE regressions — each test PLANTS the failure condition
the round-8 advisor reported and pins the fixed behavior."""

import duckdb
import numpy as np
import pytest

import mapreduce_project_spark.queries_registry as R
from tests.conftest import rows_of


def test_merge_join_view_validates_staggered_batches(spark, tmp_path):
    # ADVICE low: the disjoint-column guard only ran when BOTH batches
    # arrived in the same call; an a-only (or b-only) call joined the
    # incoming batch against the on-disk other side unvalidated and
    # still hit the duplicate-column parquet-writer failure. Plant it:
    # batch 0 establishes disjoint state, batch 1 arrives one-sided
    # with a column that collides with the persisted other side.
    from mapreduce_project_spark.sources.io import merge_join_view

    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1, "y")], "bk bigint, w string")
    merge_join_view(spark, str(tmp_path / "s"), 0, a, b, "k", "bk")

    # b-only batch carrying 'v' collides with persisted A(k, v)
    b_bad = spark.createDataFrame([(1, "z")], "bk bigint, v string")
    with pytest.raises(ValueError, match="disjoint.*'?v'?"):
        merge_join_view(spark, str(tmp_path / "s"), 1, None, b_bad, "k", "bk")
    # a-only batch carrying 'w' collides with persisted B(bk, w)
    a_bad = spark.createDataFrame([(2, "q")], "k bigint, w string")
    with pytest.raises(ValueError, match="disjoint.*'?w'?"):
        merge_join_view(spark, str(tmp_path / "s"), 1, a_bad, None, "k", "bk")
    # clean staggered batches still work end-to-end
    a2 = spark.createDataFrame([(2, "x2")], "k bigint, v string")
    merge_join_view(spark, str(tmp_path / "s"), 1, a2, None, "k", "bk")
    b2 = spark.createDataFrame([(2, "y2")], "bk bigint, w string")
    merge_join_view(spark, str(tmp_path / "s"), 2, None, b2, "k", "bk")
    out = {
        (r["k"], r["v"], r["w"])
        for r in spark.read.parquet(str(tmp_path / "s/j")).collect()
    }
    assert out == {(1, "x", "y"), (2, "x2", "y2")}


def test_lsh_signs_validated_and_auto_count_skipped(spark, tmp_path):
    # ADVICE low: signs=[] used to IndexError at signs[0]; ragged or
    # wrong-dim planes surfaced as opaque numpy broadcast errors inside
    # the executor UDF; and n_bits='auto' ran a df.count() whose result
    # was discarded when signs was provided.
    from mapreduce_project_spark.operators.dedup import (
        embedding_dedup_clusters_lsh,
    )
    from mapreduce_project_spark.operators.similarity import rademacher_signs_pc

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    with pytest.raises(ValueError, match="non-empty"):
        embedding_dedup_clusters_lsh(df, "vec_id", "embedding", 0.9, signs=[])
    with pytest.raises(ValueError, match="non-empty"):
        embedding_dedup_clusters_lsh(df, "vec_id", "embedding", 0.9, signs=[[]])
    ragged = [[[1, -1, 1, -1]] * 4, [[1, -1, 1, -1]] * 3]
    with pytest.raises(ValueError, match="bit width"):
        embedding_dedup_clusters_lsh(df, "vec_id", "embedding", 0.9, signs=ragged)
    wrong_dim = [[[1, -1, 1]] * 4]  # planes of length 3, dim=4 vectors
    with pytest.raises(ValueError, match="plane length"):
        embedding_dedup_clusters_lsh(
            df, "vec_id", "embedding", 0.9, dim=4, signs=wrong_dim
        )

    # explicit signs + n_bits='auto' must NOT run the auto-width COUNT
    df.count = lambda: (_ for _ in ()).throw(
        AssertionError("auto-width count must be skipped when signs is given")
    )
    out = embedding_dedup_clusters_lsh(
        df, "vec_id", "embedding", 0.9, n_bits="auto",
        dim=4, signs=rademacher_signs_pc(8, 4, 4),
    ).collect()
    # vectors 0 and 1 are near-identical -> one 2-cluster
    assert {(r["vec_id"], r["rep_id"], r["cluster_size"]) for r in out} == {
        (0, 0, 2),
        (1, 0, 2),
    }


def test_rademacher_pc_prefix_consistency():
    # ADVICE low (part a): the K-bit family must be EXACTLY the first K
    # planes per table of the 24-bit family, across widths and tables —
    # the property the auto-width oracle masking depends on.
    from mapreduce_project_spark.operators.similarity import rademacher_signs_pc

    full = rademacher_signs_pc(5, 24, 16)
    for k in (1, 4, 8, 12, 24):
        narrow = rademacher_signs_pc(5, k, 16)
        assert narrow == [table[:k] for table in full]
    # distinct tables / bits actually decorrelate (not one repeated plane)
    flat = [tuple(p) for tab in full for p in tab]
    assert len(set(flat)) > 100


def test_duck_code_exprs_match_spark_cumsum_kernel():
    # ADVICE low (part b): the DuckDB unrolled signed-addition chain
    # must be bit-exact to the Spark-side numpy cumsum kernel on random
    # vectors (including components near zero where an ulp flips a bit).
    from mapreduce_project_spark.operators.similarity import (
        duck_code_exprs_for_signs,
        rademacher_signs_pc,
    )

    rng = np.random.default_rng(7)
    dim, n_tables, n_bits = 16, 3, 24
    vecs = rng.normal(scale=1e-3, size=(64, dim))  # tiny scale -> dots near 0
    signs = rademacher_signs_pc(n_tables, n_bits, dim)

    # the exact operation sequence of the executor UDF in
    # dedup.embedding_dedup_clusters_lsh: cumsum of v * (+/-1) planes
    pmat = np.array(
        [plane for table in signs for plane in table], dtype=np.float64
    )
    bitw = np.array(
        [1 << b for _ in range(n_tables) for b in range(n_bits)], dtype=np.int64
    )
    signed = vecs[:, None, :] * pmat[None, :, :]
    dots = np.cumsum(signed, axis=2)[:, :, -1]
    want = (
        ((dots > 0) * bitw).reshape(len(vecs), n_tables, n_bits).sum(axis=2)
    ).astype(np.int64)

    con = duckdb.connect()
    con.execute("CREATE TABLE vecs(i INT, v DOUBLE[])")
    for i, v in enumerate(vecs):
        con.execute("INSERT INTO vecs VALUES (?, ?)", [i, list(map(float, v))])
    exprs = ", ".join(duck_code_exprs_for_signs(signs))
    got = con.sql(f"SELECT {exprs} FROM vecs ORDER BY i").fetchnumpy()
    got_m = np.stack([got[c] for c in got], axis=1).astype(np.int64)
    assert (got_m == want).all()


def test_approx_quantiles_cents_midpoint_exact(spark, tmp_path, duck):
    # ADVICE low: the old interpolate-then-quantize form put the
    # even-count p50 on a half-CENT midpoint of an interpolated double,
    # where a 1-ulp cross-engine difference flips the output cent.
    # Plant exactly that boundary: two rows per group whose cents
    # midpoint is X.5 — pre-quantized integer inputs make it an exact
    # IEEE .5 on both engines, so floor(x + 0.5) agrees by construction.
    rows = [
        ("A", 10.00), ("A", 10.01),   # cents 1000/1001 -> median 1000.5
        ("B", 99.98), ("B", 99.99),   # cents 9998/9999 -> median 9998.5
        ("C", 5.55), ("C", 5.56), ("C", 5.57), ("C", 5.58),  # 556.5
    ]
    spark.createDataFrame(
        rows, "o_orderstatus string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = R.ALL_QUERIES["approx_quantiles_price"](spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = con.sql(R.ALL_ORACLES["approx_quantiles_price"]).df()
    assert rows_of(got) == rows_of(want)
    by_status = {r["o_orderstatus"]: r["p50_cents"] for _, r in got.iterrows()}
    # half-cent midpoints round UP deterministically
    assert by_status == {"A": 1001, "B": 9999, "C": 557}
