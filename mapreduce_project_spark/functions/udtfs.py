"""Python UDTFs (Spark 4 ``pyspark.sql.functions.udtf``) — the
reference's user ``iterator_fn`` contract (``worker.py:123,131-138``:
whole payload in, iterable of records out) as a first-class TABLE
function, usable from SQL with ``LATERAL`` and from the DataFrame API.

Three ways this engine exposes user record-splitting, by binding time:
- source-level: the ``linefile`` Python DataSource (`sources/custom.py`)
  — splitting IS the scan, one partition per file;
- query-level (this module): a UDTF laterally applied to any string
  column mid-plan — the iterator as a relational operator;
- facade-level: ``run_job(iterator_fn=...)`` (`mapreduce.py`) for
  unchanged reference-style job files.

Scale notes: UDTF rows stream through the Python worker batch-wise
(Arrow-encoded both ways); the expansion is a narrow op — no shuffle,
pipelined with the enclosing stage. Prefer the JVM ``explode(split())``
when the splitting rule is expressible as a Column expression; the UDTF
is for genuinely imperative iterators (stateful scanners, format
sniffers) — exactly the cases the reference needed ``iterator_fn`` for.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="line_no int, line string")
class LineRecords:
    """The reference's DEFAULT iterator (``worker.py:141-145``): one
    record per line, key = 0-based line number. ``eval`` receives one
    payload per input row; yielded tuples become output rows joined
    laterally to that row."""

    def eval(self, content: str):  # noqa: D102 - contract above
        if content is None:
            return
        for i, line in enumerate(content.splitlines()):
            yield i, line


@udtf(returnType="pos int, token string")
class TokenRecords:
    """Imperative tokenizer UDTF — the word_count job's iterator+map
    fused (``client_folder/jobs/word_count.py:10-41``): lowercase,
    strip non-alphanumerics, emit (position, token). The JVM twin is
    ``posexplode(split(lower(text), ...))``; tests pin them equal."""

    def eval(self, text: str):  # noqa: D102 - contract above
        if text is None:
            return
        pos = 0
        for raw in text.lower().split():
            tok = "".join(ch for ch in raw if ch.isalnum())
            if tok:
                yield pos, tok
                pos += 1


def register_udtfs(spark) -> None:
    """Register both UDTFs for SQL use:
    ``SELECT d.doc_id, t.pos, t.token
      FROM documents d, LATERAL token_records(d.text) t``."""
    spark.udtf.register("line_records", LineRecords)
    spark.udtf.register("token_records", TokenRecords)
    spark.udtf.register("props_columns", PropsColumns)
    spark.udtf.register("pii_spans", PiiSpans)


# Polymorphic UDTF: output schema decided AT ANALYSIS TIME from a
# constant argument (Spark 4 `analyze` static method). The props column
# on `events` is a JSON object string; callers name the keys they want
# and each becomes a real typed COLUMN in the plan — imperative
# schema-on-read projection (the declarative twin is D52's VARIANT
# path), and downstream pruning and predicates work on the extracted
# columns like any other.
from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
from pyspark.sql.types import StringType, StructType as _StructType


@udtf
class PropsColumns:
    """``props_columns(props, 'k1,k2')`` → columns ``k1 string,
    k2 string`` (missing keys → NULL; scalar values rendered as their
    JSON text). The key list must be a literal: `analyze` runs on the
    driver at plan time and fixes the schema the executors must
    produce."""

    @staticmethod
    def analyze(props: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
        if not keys.isConstantExpression or not isinstance(keys.value, str):
            raise ValueError("props_columns requires a constant key-list string")
        schema = _StructType()
        for k in keys.value.split(","):
            schema = schema.add(k.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, props: str, keys: str):  # noqa: D102 - contract above
        import json

        wanted = [k.strip() for k in keys.split(",")]
        try:
            parsed = json.loads(props) if props else {}
        except ValueError:
            parsed = {}
        out = []
        for k in wanted:
            v = parsed.get(k)
            out.append(None if v is None else str(v))
        yield tuple(out)


@udtf(returnType="pii_type string, start int, length int, span string")
class PiiSpans:
    """Span-level PII detection: one row per match with its 0-based
    character offset — the audit/annotation twin of `text.redact_pii`
    (which only rewrites): offset spans feed human review queues,
    span-level masking in token space, and per-span provenance. Uses
    the SAME `PII_PATTERNS` (order included: earlier categories consume
    their spans so an email's digits are never re-reported as a phone),
    so redacting exactly the reported spans reproduces `redact_pii`'s
    output — pinned in tests."""

    def eval(self, text: str):  # noqa: D102 - contract above
        import re

        from mapreduce_project_spark.operators.text import PII_PATTERNS

        if not text:
            return
        taken: list[tuple[int, int]] = []
        for name, pat, _ in PII_PATTERNS:
            for m in re.finditer(pat, text):
                s, e = m.span()
                if any(s < te and ts < e for ts, te in taken):
                    continue  # earlier category already owns this span
                taken.append((s, e))
                yield name, s, e - s, m.group()
