"""Fuzzy string matching — edit-distance pairs with blocked candidate
generation (the record-linkage / typo-normalization primitive: vocab
cleanup before token statistics, near-identical entity names before a
dimension merge).

Scale shape: a pair can be within Levenshtein distance d only if the
lengths differ by at most d — so candidates meet through ``d+1``
EQUI-joins on (length, length+offset), never a cartesian product. The
verify is Spark's built-in ``levenshtein`` (JVM, codegen; identical DP
semantics to duckdb's, which is what makes the oracle hashable). Each
length band bounds its own candidate quadratic; for corpora where one
band dominates, pre-filtering (min length, frequency floor) bounds it
the same way the LSH posting caps do in ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    values: DataFrame,
    col: str,
    max_distance: int = 1,
    min_length: int = 2,
) -> DataFrame:
    """All unordered pairs of distinct ``col`` values within
    ``max_distance`` edits, each pair exactly once as (tok_a < tok_b).

    Length-band blocking: the off=0 join (equal lengths, ``a < b``
    dedupes) plus one join per offset 1..d (shorter joins longer — the
    pair's length gap fixes which join finds it, so no cross-join
    duplicates and no distinct needed).
    """
    v = (
        values.select(F.col(col).cast("string").alias("a"))
        .where(F.length("a") >= min_length)
        .distinct()
        .withColumn("_l", F.length("a"))
    )
    parts = []
    for off in range(max_distance + 1):
        left = v.select(F.col("a").alias("_x"), F.col("_l").alias("_lx"))
        right = v.select(F.col("a").alias("_y"), F.col("_l").alias("_ly"))
        cond = left["_lx"] == right["_ly"] - off
        pairs = left.join(right, cond)
        if off == 0:
            pairs = pairs.where(F.col("_x") < F.col("_y"))
        parts.append(
            pairs.select(
                F.least("_x", "_y").alias("tok_a"),
                F.greatest("_x", "_y").alias("tok_b"),
                F.levenshtein("_x", "_y").alias("distance"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("distance") <= max_distance)
