"""Golden gate: every registered query with an oracle must hash-match
duckdb on the smoke tables — the same comparison the driver runs at
sf0.01. Queries without an oracle get a rows-runnable smoke check.
"""

from __future__ import annotations

import pytest

from stream_processing_platform_spark.registry import REGISTRY, queries

queries()  # force registration


_WITH_ORACLE = sorted(n for n, rq in REGISTRY.items() if rq.oracle is not None)
_NO_ORACLE = sorted(n for n, rq in REGISTRY.items() if rq.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    rq = REGISTRY[name]
    df = rq.fn(spark, sf_dir)
    assert_matches_oracle(df, duck, rq.oracle)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_query_runs(name, spark, sf_dir):
    rq = REGISTRY[name]
    df = rq.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_bench_query_names_exist_in_registry():
    """bench.py times queries by registry name — a rename there must
    fail CI, not the nightly bench run."""
    import ast
    import os

    from stream_processing_platform_spark.registry import queries

    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    import re

    names = {
        n.value
        for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.Constant) and isinstance(n.value, str)
        and re.fullmatch(r"q[_0-9][a-z0-9_]*", n.value)
    }
    qs = queries()
    missing = sorted(n for n in names if n not in qs)
    assert not missing, f"bench.py references unregistered queries: {missing}"
