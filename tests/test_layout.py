"""Z-order layout: the Morton key must actually buy multi-column
row-group pruning, not just compute a number."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from stream_processing_platform_spark.operators import layout


def _touched_row_groups(path: str, xlo, xhi, ylo, yhi) -> tuple[int, int]:
    """(row groups whose min/max stats intersect the box, total groups)."""
    f = pq.ParquetFile(path)
    cols = {c: i for i, c in enumerate(f.schema_arrow.names)}
    touched = 0
    for g in range(f.metadata.num_row_groups):
        rg = f.metadata.row_group(g)
        sx = rg.column(cols["x"]).statistics
        sy = rg.column(cols["y"]).statistics
        if sx.min <= xhi and sx.max >= xlo and sy.min <= yhi and sy.max >= ylo:
            touched += 1
    return touched, f.metadata.num_row_groups


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Same 40k rows, two layouts, one 2-D box predicate: the Z-ordered
    file must skip most row groups on min/max stats alone while the
    hash-shuffled file touches nearly all of them. This is the property
    that makes `zorder_repartition` worth a write at 100 TB: file- and
    row-group-level skipping on EVERY interleaved column, where a plain
    sort helps only its leading column."""
    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64(F.col("id")) % 1024).cast("long").alias("xr"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 1024).cast("long").alias("yr"),
    ).select(
        ((F.col("xr") + 1024) % 1024).alias("x"), ((F.col("yr") + 1024) % 1024).alias("y")
    )
    z = layout.zorder_value(
        [
            layout.normalize_to_bits(F.col("x"), 0, 1023, 10),
            layout.normalize_to_bits(F.col("y"), 0, 1023, 10),
        ],
        10,
    )
    pdf = df.withColumn("zval", z).toPandas()

    zsorted = pdf.sort_values("zval", kind="stable")[["x", "y"]]
    shuffled = pdf[["x", "y"]]  # hash order ≈ random layout

    zpath, rpath = str(tmp_path / "z.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(pa.Table.from_pandas(zsorted, preserve_index=False), zpath, row_group_size=1000)
    pq.write_table(pa.Table.from_pandas(shuffled, preserve_index=False), rpath, row_group_size=1000)

    # ~10% × 10% box
    z_touched, z_total = _touched_row_groups(zpath, 100, 200, 300, 400)
    r_touched, r_total = _touched_row_groups(rpath, 100, 200, 300, 400)
    assert z_total == r_total == 40
    assert r_touched >= z_total * 9 // 10  # random layout: stats useless
    assert z_touched <= z_total // 4  # Z-order: most groups skipped

    # And the layout transform itself keeps every row.
    relaid = layout.zorder_repartition(df, z, 8)
    assert relaid.count() == n
    assert relaid.columns == ["x", "y"]
