"""Multimodal columns for the LLM-data-pipeline surface.

Design (100 TB): media payloads are opaque ``binary`` columns carried
next to a typed metadata struct; all heavy work happens in Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through Python
row objects, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning guidance:
repartition by a content-hash bucket before decode so skewed file sizes
spread across executors.

The actual codec work (JPEG decode, audio resample, video frame
extraction) requires libraries not present in this container — those
calls are STUBBED: ``decode_media`` raises ``NotImplementedError``
unless the deterministic fake decoder is selected, which synthesizes
pixel/sample features from the payload bytes (stable, testable, same
schema and batch shape as a real decoder).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)


def read_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content)
    via the binaryFile source — the multimodal twin of the parquet scan."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach the typed metadata struct + content hash/size columns that
    every downstream stage keys on (dedup by content_hash, size-bucketed
    repartition before decode)."""
    mime = (
        F.when(F.col("path").endswith(".jpg") | F.col("path").endswith(".jpeg"), "image/jpeg")
        .when(F.col("path").endswith(".png"), "image/png")
        .when(F.col("path").endswith(".wav"), "audio/wav")
        .when(F.col("path").endswith(".mp4"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.withColumns(
        {
            "media_meta": F.struct(
                mime.alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
                F.lit(None).cast("string").alias("codec"),
            ),
            "content_hash": F.sha2(F.col(content_col), 256),
            "content_size": F.length(F.col(content_col)).cast("long"),
        }
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for codec decode + feature extraction:
    expands the payload's sha256 into ``dim`` floats in [0, 1). Stable
    across runs/executors — this is the STUB layer; swap with a real
    decoder (PIL/torchvision/ffmpeg) where available."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b""
    block = b""
    for i in range(dim):
        if i % 8 == 0:
            block = hashlib.sha256(h + i.to_bytes(4, "little")).digest()
        out[i] = int.from_bytes(block[(i % 8) * 4 : (i % 8) * 4 + 4], "little") / 2**32
    return out


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 64,
    decoder: str = "fake",
    batch_hash_col: str = "content_hash",
) -> DataFrame:
    """Decode + feature-extract media payloads via Arrow-batched
    mapInPandas. ``decoder="fake"`` runs the deterministic stub;
    ``decoder="image"``/``"audio"``/``"video"`` mark where real codecs
    plug in and raise ``NotImplementedError`` in this container."""
    if decoder != "fake":
        raise NotImplementedError(
            f"{decoder!r} decoding needs codec libraries not present in this "
            "container; the Spark-side plumbing is identical to decoder='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(bytes(p) if p is not None else b"", dim)
                for p in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "content_hash": pdf[batch_hash_col],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[content_col]],
                }
            )

    return df.mapInPandas(run, _FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: raises until an imaging library is
    available; signature/batch shape match extract_features."""
    raise NotImplementedError("image resize requires PIL/opencv (not in container)")


def sample_video_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling stage — STUB (needs ffmpeg)."""
    raise NotImplementedError("frame sampling requires ffmpeg (not in container)")
