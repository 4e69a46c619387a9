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


def test_decode_stub_raises_cleanly(spark):
    docs = attach_payload(load_table(spark, SF_DIR, "documents").limit(2))
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError|media decode"):
        decode_media(docs).collect()
