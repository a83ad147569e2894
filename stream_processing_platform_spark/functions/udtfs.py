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
