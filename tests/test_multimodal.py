"""Multimodal plumbing tests: byte features recomputed in pure Python,
and the decode stub's contract."""

from __future__ import annotations

import pytest

from mapreduce_project_spark.operators.multimodal import (
    attach_payload,
    byte_features,
    decode_media,
)
from mapreduce_project_spark.sources import load_table
from tests.conftest import SF_DIR


def test_byte_features_match_python(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = {r["doc_id"]: r for r in byte_features(attach_payload(docs)).collect()}
    sample = docs.select("doc_id", "text").limit(50).collect()
    assert len(feats) == docs.count()
    for row in sample:
        b = row["text"].encode("utf-8")
        got = feats[row["doc_id"]]
        assert got["n_bytes"] == len(b)
        assert got["byte_sum"] == sum(b)
        assert got["mean_byte"] == sum(b) / len(b)
        assert got["n_frames"] == (len(b) + 255) // 256


def test_frame_sample_matches_python(spark):
    from mapreduce_project_spark.operators.multimodal import frame_sample

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    got: dict[tuple, bytes] = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame"])
        for r in frame_sample(attach_payload(docs), frame_size=256, every=4).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        b = row["text"].encode("utf-8")
        n_frames = (len(b) + 255) // 256
        expect_idx = list(range(0, n_frames, 4))
        mine = [k for k in got if k[0] == row["doc_id"]]
        assert sorted(k[1] for k in mine) == expect_idx
        for fi in expect_idx:
            assert got[(row["doc_id"], fi)] == b[fi * 256 : (fi + 1) * 256]


def test_decode_stub_raises_cleanly(spark):
    docs = attach_payload(load_table(spark, SF_DIR, "documents").limit(2))
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError|media decode"):
        decode_media(docs).collect()
