"""Python UDTFs (Spark 4 table functions) — the SQL-callable 1-row →
N-rows escape hatch (SURVEY §2.11).

The DataFrame-native flatMap surface (`api/environment.py`) and the
all-JVM chunkers (`queries/text.py`) remain the fast paths; a UDTF is
the right tool when a SQL user needs lateral row-generating logic that
has no built-in equivalent: ``SELECT d.doc_id, s.* FROM documents d,
LATERAL split_passages(d.text, 50) s``. Python-worker execution — same
cost model as any Python UDF, so keep it off 100 TB hot paths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="passage: string, idx: int, n_words: int")
class SplitPassages:
    """Word-window passage splitter: yields consecutive ``n``-word
    passages of ``text`` with their index — the lateral-join twin of
    the chunking queries (boundaries on words, not tokens)."""

    def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract
        words = (text or "").split()
        step = max(int(n), 1)
        for i in range(0, len(words), step):
            chunk = words[i : i + step]
            yield " ".join(chunk), i // step, len(chunk)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("split_passages", SplitPassages)
    spark.udtf.register("extract_fields", ExtractFields)


@udtf
class ExtractFields:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()``): output schema computed
    from the call site's constant arguments — ``SELECT f.* FROM t,
    LATERAL extract_fields(t.props, 'k', 'tag')`` yields one STRING
    column PER REQUESTED KEY, a different schema per call. This is the
    dynamic-schema table-function surface (the static-returnType form
    above can't express it); the JSON walk itself stays a plain
    json.loads per row.
    """

    @staticmethod
    def analyze(payload, *keys):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not keys:
            raise ValueError("extract_fields needs at least one key argument")
        bad = [k for k in keys if not k.isConstantExpression or not isinstance(k.value, str)]
        if bad:
            raise ValueError("extract_fields keys must be constant strings")
        schema = StructType()
        for k in keys:
            schema = schema.add(k.value, StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, payload: str, *keys: str):  # noqa: D102 — UDTF contract
        import json

        try:
            obj = json.loads(payload) if payload else {}
        except ValueError:
            obj = {}
        if not isinstance(obj, dict):
            # valid JSON that isn't an object ('[1,2]', '"x"', '42')
            # gets the same all-null row as malformed JSON — one error
            # policy, never an AttributeError out of a SQL call site
            obj = {}
        yield tuple(None if obj.get(k) is None else str(obj.get(k)) for k in keys)
