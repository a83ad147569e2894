"""Data-layout operators: Z-order (Morton) clustering for multi-column
min/max pruning.

Reference parity: the reference has no storage-layout tooling; this is
100 TB-scale surface (SCALE.md): a table laid out in Z-order over two or
more filter columns gives parquet row-group/file skipping on EVERY one
of those columns at once, where a plain sort prunes only its leading
column. The operator set mirrors what Delta/Iceberg `OPTIMIZE ZORDER BY`
does, expressed as pure DataFrame transforms:

- ``normalize_to_bits``   — rescale a numeric column to an integer in
  ``[0, 2^bits)`` (rank-free linear scaling; exact integer arithmetic).
- ``zorder_value``        — bit-interleave the normalized columns into a
  single Morton key (JVM-side shift/mask expression tree, codegen-able;
  no UDF).
- ``zorder_repartition``  — range-partition + sort by the Morton key:
  the write layout that makes parquet stats selective on all dims.

Everything is deterministic integer math, so the Morton key itself is
DuckDB-oracle-checkable (q_zorder_events); the pruning benefit is pinned
by tests/test_layout.py, which writes the same rows Z-ordered vs shuffled
and counts row groups whose stats survive a 2-D box predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, lo: Column | int, hi: Column | int, bits: int) -> Column:
    """Map ``col`` in ``[lo, hi]`` to an integer in ``[0, 2^bits)``.

    Uses floor((col - lo) * (2^bits - 1) / (hi - lo)) with the inputs
    cast to double once; the quotient is floored (pure IEEE, engine-
    portable) and clamped so out-of-range values land on the edges.
    """
    lo_c = F.lit(lo).cast("double") if not isinstance(lo, Column) else lo.cast("double")
    hi_c = F.lit(hi).cast("double") if not isinstance(hi, Column) else hi.cast("double")
    top = F.lit((1 << bits) - 1).cast("double")
    scaled = F.floor((col.cast("double") - lo_c) * top / (hi_c - lo_c)).cast("long")
    # degenerate range (constant column): 0/0 is NaN — pin to bucket 0
    scaled = F.when(hi_c == lo_c, F.lit(0).cast("long")).otherwise(scaled)
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit((1 << bits) - 1).cast("long"), scaled))


def zorder_value(norm_cols: list[Column], bits: int) -> Column:
    """Morton key: bit-interleave ``norm_cols`` (each already in
    ``[0, 2^bits)``). Column i's bit b lands at position
    ``b * len(norm_cols) + i``. Total width ``bits * len(norm_cols)``
    must stay under 63. Pure shift/mask expression tree — whole-stage
    codegen keeps it JVM-side."""
    n = len(norm_cols)
    if bits * n >= 63:
        raise ValueError(f"zorder key would need {bits * n} bits; max 62")
    terms = []
    for i, c in enumerate(norm_cols):
        lc = c.cast("long")
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(lc, b).bitwiseAND(F.lit(1)), b * n + i))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_value_sql(norm_exprs: list[str], bits: int) -> str:
    """The DuckDB twin of :func:`zorder_value` as a SQL fragment, built
    from the same shift/mask terms so both engines compute the identical
    Morton key."""
    n = len(norm_exprs)
    terms = [
        f"((({e} >> {b}) & 1) << {b * n + i})"
        for i, e in enumerate(norm_exprs)
        for b in range(bits)
    ]
    return " | ".join(terms)


def zorder_repartition(
    df: DataFrame, zcol: Column, num_partitions: int, key_name: str = "_zorder"
) -> DataFrame:
    """Layout transform for writes: range-partition on the Morton key and
    sort within partitions, so each output file/row-group covers a small
    Z-curve segment → tight min/max stats on every interleaved column.
    The key column is dropped before write."""
    return (
        df.withColumn(key_name, zcol)
        .repartitionByRange(num_partitions, F.col(key_name))
        .sortWithinPartitions(key_name)
        .drop(key_name)
    )
