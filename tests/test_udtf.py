"""Python UDTF tests — the reference's ``iterator_fn`` contract as a
lateral table function (`functions/udtfs.py`), pinned against the
equivalent JVM expressions and the reference's line-iterator semantics
(``worker.py:141-145``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_project_spark.functions.udtfs import register_udtfs
from mapreduce_project_spark.sources import load_table
from tests.conftest import SF_DIR


def test_token_records_matches_jvm_twin(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.token "
            "FROM _udtf_docs d, LATERAL token_records(d.text) t"
        ).collect()
    }
    raw = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("p", "raw"),
        )
        .select(
            "doc_id", "p", F.regexp_replace("raw", r"[^0-9a-z]", "").alias("token")
        )
        .filter(F.col("token") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    want = {
        tuple(r)
        for r in raw.select(
            "doc_id", (F.row_number().over(w) - 1).alias("pos"), "token"
        ).collect()
    }
    assert got == want and got


def test_line_records_matches_reference_default_iterator(spark):
    register_udtfs(spark)
    # the reference's default iterator: enumerate(splitlines())
    payload = "first\nsecond\n\nfourth"
    got = spark.sql(
        "SELECT t.line_no, t.line FROM (SELECT :p AS c) s, "
        "LATERAL line_records(s.c) t",
        args={"p": payload},
    ).collect()
    assert [(r["line_no"], r["line"]) for r in got] == list(
        enumerate(payload.splitlines())
    )


def test_line_records_null_payload_yields_nothing(spark):
    register_udtfs(spark)
    got = spark.sql(
        "SELECT t.* FROM (SELECT CAST(NULL AS STRING) AS c) s, "
        "LATERAL line_records(s.c) t"
    ).collect()
    assert got == []


def test_props_columns_polymorphic_schema(spark):
    # analyze() fixes the output schema from the constant key list —
    # different literals, different column sets, same UDTF
    from mapreduce_project_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    from mapreduce_project_spark.sources import register_tables
    from tests.conftest import SF_DIR as _SF

    register_tables(spark, _SF, ["events"])
    one = spark.sql(
        "SELECT e.event_id, p.k FROM events e, LATERAL props_columns(e.props, 'k') p"
    )
    assert one.columns == ["event_id", "k"]
    # the extracted column equals the declarative JSON path on every row
    twin = spark.sql(
        "SELECT event_id, get_json_object(props, '$.k') AS k FROM events"
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, twin.collect()))

    two = spark.sql(
        "SELECT p.* FROM events e, LATERAL props_columns(e.props, 'k, missing') p"
    )
    assert two.columns == ["k", "missing"]
    rows = two.collect()
    assert rows and all(r["missing"] is None for r in rows)

    import pytest as _p
    from pyspark.errors import AnalysisException

    with _p.raises(AnalysisException):
        spark.sql(
            "SELECT p.* FROM events e, LATERAL props_columns(e.props, e.props) p"
        ).collect()


def test_pii_spans_reproduce_redaction(spark):
    # cutting exactly the reported spans (right to left) and inserting
    # the category placeholder must equal redact_pii's output — the
    # span report and the rewriter cannot disagree
    from mapreduce_project_spark.functions.udtfs import PiiSpans, register_udtfs
    from mapreduce_project_spark.operators.text import PII_PATTERNS, redact_pii

    register_udtfs(spark)
    rows = [
        (1, "mail me at a.b+c@test.org or call +1 415 555 0000 now"),
        (2, "server 10.0.0.1 hosts bob@x.io and 192.168.1.254"),
        (3, "no pii here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("pii_docs")
    spans = spark.sql(
        "SELECT d.doc_id, s.* FROM pii_docs d, LATERAL pii_spans(d.text) s"
    ).collect()
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    placeholder = {name: repl for name, _, repl in PII_PATTERNS}
    redacted = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", redact_pii("text").alias("red")).collect()
    }
    for doc_id, text in rows:
        if text is None:
            assert doc_id not in by_doc
            continue
        rebuilt = text
        for r in sorted(by_doc.get(doc_id, []), key=lambda r: -r["start"]):
            assert rebuilt[r["start"] : r["start"] + r["length"]] == r["span"]
            rebuilt = (
                rebuilt[: r["start"]]
                + placeholder[r["pii_type"]]
                + rebuilt[r["start"] + r["length"] :]
            )
        assert rebuilt == redacted[doc_id], (doc_id, rebuilt, redacted[doc_id])
    assert {r["pii_type"] for r in by_doc[1]} == {"email", "phone"}
    assert {r["pii_type"] for r in by_doc[2]} == {"email", "ip"}
    assert 3 not in by_doc
