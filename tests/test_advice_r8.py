"""Round-8 ADVICE regressions — each test PLANTS the failure condition
the round-7 advisor reported and pins the fixed behavior."""

import numpy as np
import pytest

import mapreduce_project_spark.queries_registry as R


def test_phrase_positions_short_docs_do_not_crash(spark, tmp_path):
    # ADVICE high: sequence(1, size-2) descends to [1, 0] for <3-token
    # docs, so tk[i+1] indexed out of bounds under ANSI (pyspark 4.1.2
    # default). Plant 0/1/2-token docs next to real ones: the query
    # must run and must emit NO rows for the short docs (DuckDB's
    # oracle emits none — a 2-token doc has no trigram).
    rows = [
        (1, "alpha beta gamma delta alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, ""),            # 0 tokens
        (4, "alpha"),        # 1 token
        (5, "alpha beta"),   # 2 tokens
        (6, None),           # null text
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = R.ALL_QUERIES["search_phrase_positions"](spark, str(tmp_path)).collect()
    assert out, "phrase query must still match the long docs"
    assert {r["doc_id"] for r in out} <= {1, 2}
    assert all(r["phrase"].count(" ") == 2 for r in out)
    # doc 1 holds the winning trigram twice ("alpha beta gamma")
    d1 = next(r for r in out if r["doc_id"] == 1)
    assert d1["phrase"] == "alpha beta gamma"
    assert d1["n_matches"] == 2 and d1["first_pos"] == 1


def test_logmel_rate_is_read_positionally(spark):
    # ADVICE low: the old per-row rate lookup scanned the batch by id
    # (O(n^2)) and took the FIRST match — wrong rate when a batch holds
    # duplicate ids. Plant two rows with the SAME id and different
    # sample rates; each row's features must match the independent
    # reference computed with ITS OWN rate.
    from mapreduce_project_spark.operators.multimodal import (
        _mel_filterbank,
        logmel_features,
    )

    n_fft, hop, n_mels = 256, 128, 16

    def ref_energy_q(x16, sr):
        x = x16.astype(np.float64) / 32768.0
        win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
        frames = np.stack(
            [x[s : s + n_fft] * win for s in range(0, len(x) - n_fft + 1, hop)]
        )
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        ref = np.log10(power @ _mel_filterbank(n_mels, n_fft, sr).T + 1e-10)
        return int(round(float(ref.sum()) * 1e6))

    t = np.arange(4000)
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t / 8000.0) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [
            (7, bytearray(tone.tobytes()), 8000),
            (7, bytearray(tone.tobytes()), 16000),
        ],
        "id long, data binary, sample_rate_hz long",
    ).coalesce(1)  # one batch => both duplicate-id rows seen together
    got = sorted(
        r["energy_q"]
        for r in logmel_features(
            df, "id", "data", "sample_rate_hz", n_fft, hop, n_mels
        ).collect()
    )
    want = sorted([ref_energy_q(tone, 8000), ref_energy_q(tone, 16000)])
    assert want[0] != want[1], "fixture must distinguish the two rates"
    assert got == want


def test_merge_join_view_rejects_overlapping_columns(spark, tmp_path):
    # ADVICE low: overlapping column names (incl. a_key == b_key) used
    # to surface as a deep parquet-writer duplicate-column failure.
    from mapreduce_project_spark.sources.io import merge_join_view

    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1, "y")], "k bigint, w string")
    with pytest.raises(ValueError, match="disjoint.*'?k'?"):
        merge_join_view(spark, str(tmp_path / "s"), 0, a, b, "k", "k")
    b2 = spark.createDataFrame([(1, "y")], "bk bigint, _b string")
    with pytest.raises(ValueError, match="_b"):
        merge_join_view(spark, str(tmp_path / "s2"), 0, a, b2, "k", "bk")
    # disjoint names still work end-to-end
    b3 = spark.createDataFrame([(1, "y")], "bk bigint, w string")
    merge_join_view(spark, str(tmp_path / "s3"), 0, a, b3, "k", "bk")
    out = spark.read.parquet(str(tmp_path / "s3/j")).collect()
    assert len(out) == 1 and out[0]["v"] == "x" and out[0]["w"] == "y"


def test_mmr_rerank_tiny_corpus_returns_short_ranking(spark, tmp_path):
    # ADVICE low: < 10 non-query candidates used to KeyError on
    # rel_map[None] once `remaining` drained. Plant 3 vectors: the
    # query + 2 candidates -> exactly 2 ranked rows, ordered.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = R.ALL_QUERIES["similarity_mmr_rerank"](spark, str(tmp_path)).collect()
    ranks = sorted((r["rank"], r["vec_id"]) for r in out)
    assert ranks == [(1, 1), (2, 2)]
