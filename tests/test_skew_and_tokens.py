"""Salted-join equivalence under skew, and tokenizer parity with the
reference's Python tokenizer on edge-case inputs."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mapreduce_project_spark.functions import tokens
from mapreduce_project_spark.operators.join import salted_join

EDGE_TEXTS = [
    "",
    "   ",
    "UPPER lower MiXeD",
    "digits 123 mix3d t0kens",
    "punct,comma.dot;semi--dash_underscore",
    "unicode café naïve über straße 中文",
    "a",
    "the the the",
    "tabs\tand\nnewlines\r\nhere",
    "emoji \U0001f600 mixed",
]


def test_tokenizer_matches_reference_python(spark):
    # ≡ re.findall(r"[a-z]+", text.lower()) — word_count.py:38
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, text string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens("text").alias("toks")).collect()
    }
    for i, text in enumerate(EDGE_TEXTS):
        want = re.findall(r"[a-z]+", text.lower())
        assert got[i] == want, (text, got[i], want)


def test_salted_join_equals_plain_join(spark):
    # one hot key (90% of rows) + a long tail
    left = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (19, "cold"), (29, "cold2")], "k long, rv string"
    )
    plain = {tuple(r) for r in left.join(right, "k").collect()}
    salted = {tuple(r) for r in salted_join(left, right, "k", n_salt=8).collect()}
    assert salted == plain
    assert len(plain) == 9000 + 2  # hot key rows + two tail matches


def test_redact_pii_literals(spark):
    from mapreduce_project_spark.operators.text import redact_pii

    rows = [
        ("mail me at jo.doe+x@sub.example.org today", "mail me at <EMAIL> today"),
        ("server 192.168.001.42 is up", "server <IP> is up"),
        ("call +44 20 7946 0958 now", "call <PHONE> now"),
        ("no pii here 12 monkeys v1.2", "no pii here 12 monkeys v1.2"),
        ("a@b.co and 8.8.8.8 and +1-202-555-0143", "<EMAIL> and <IP> and <PHONE>"),
    ]
    df = spark.createDataFrame(rows, ["raw", "want"]).select(
        "want", redact_pii("raw").alias("got")
    )
    for r in df.collect():
        assert r["got"] == r["want"], r
