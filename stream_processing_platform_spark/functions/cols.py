"""Column-argument normalization shared by operator entry points.

Public operators take ``list[str] | list[Column]`` column arguments;
a bare string splatted with ``*`` silently becomes per-CHARACTER column
references (``*"doc_id"`` → columns d, o, c, …), which either fails
with a confusing unresolved-column error or — worse — resolves by
accident. Normalize once at the API edge.
"""

from __future__ import annotations

from pyspark.sql import Column


def as_col_list(cols) -> list:
    """Wrap a bare str/Column into a 1-element list; pass lists through."""
    if isinstance(cols, (str, Column)):
        return [cols]
    return list(cols)
