"""Privacy operators — keyed pseudonymization and k-anonymity
suppression, the release-gate transforms a data pipeline runs before
sharing derived tables.

Scale shapes:
- :func:`pseudonymize` is a pure column expression (sha2 over a salted
  key) — embarrassingly parallel, no shuffle, codegen'd JVM-side.
  Consistent (same input → same pseudonym, so joins still line up) and
  one-way for a secret salt; NOT encryption — rotate the salt to break
  linkage across releases.
- :func:`k_anonymize` needs each row's quasi-identifier group size: one
  window count over the quasi columns (a single keyed shuffle — same
  cost as the groupBy it replaces, without a join back). Groups smaller
  than ``k`` get their quasi values SUPPRESSED (replaced by ``'*'``),
  the standard generalize-or-suppress fallback; the caller picks quasi
  columns already generalized to the granularity they can afford
  (bucketed balances, truncated zips).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pseudonymize(id_col: Column | str, salt: str) -> Column:
    """Consistent keyed pseudonym: sha2-256 hex of ``salt|id``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.sha2(F.concat(F.lit(salt + "|"), c.cast("string")), 256)


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str] | str,
    k: int,
    group_col: str = "group_n",
) -> DataFrame:
    """Suppress quasi-identifier values of rows whose quasi group has
    fewer than ``k`` members. Output: input columns with each quasi
    column replaced by its suppressed form, plus ``group_col`` (the
    group size for released rows, −1 for suppressed ones — the size of
    a too-small group is itself identifying)."""
    if k < 2:
        raise ValueError("k-anonymity needs k >= 2")
    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    w = Window.partitionBy(*quasi_cols)
    out = df.withColumn("_gn", F.count("*").over(w))
    kept = F.col("_gn") >= k  # bind the materialized count, not a
    # second copy of the window expression (Column exprs are trees)
    for q in quasi_cols:
        out = out.withColumn(q, F.when(kept, F.col(q).cast("string")).otherwise("*"))
    return out.withColumn(
        group_col, F.when(kept, F.col("_gn")).otherwise(F.lit(-1)).cast("long")
    ).drop("_gn")
