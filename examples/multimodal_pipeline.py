"""Multimodal curation pipeline over binary media columns:

    synthesize PNG / BMP / baseline-JPEG / WAV payloads (own codecs)
      → binary ingest + typed metadata
      → REAL decode (pixels/samples) → resize → feature vectors
      → pairwise cosine between images → near-dup report.

Every stage is the Spark-side plumbing used at scale (binary columns,
Arrow mapInPandas with explicit schemas, no driver loops); the codecs
are the repo's dependency-free decoders (multimodal/imagecodec.py +
jpegcodec.py). Self-checking: the JPEG re-encode of an image must land
nearest to its PNG-encoded source (lossy but close), and the audio
path must produce real non-zero RMS features.

Run:

    python examples/multimodal_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from stream_processing_platform_spark.multimodal import imagecodec as ic
from stream_processing_platform_spark.multimodal.codecs import (
    extract_features,
    read_binary_files,
    resize_images,
    with_media_metadata,
)
from stream_processing_platform_spark.multimodal.jpegcodec import encode_jpeg
from stream_processing_platform_spark.session import get_spark


def _make_media_dir() -> str:
    d = tempfile.mkdtemp(prefix="spp_example_media_")
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:48, 0:64]
    gradient = np.stack([x * 4 % 256, y * 5 % 256, (x + y) * 3 % 256], 2).astype(np.uint8)
    blocks = np.kron(rng.integers(0, 255, (6, 8, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    # the same gradient as lossless PNG and lossy-but-close JPEG, plus an
    # unrelated image and an audio tone
    with open(os.path.join(d, "gradient.png"), "wb") as f:
        f.write(ic.encode_png(gradient))
    with open(os.path.join(d, "gradient.jpg"), "wb") as f:
        f.write(encode_jpeg(gradient, 90))
    with open(os.path.join(d, "blocks.bmp"), "wb") as f:
        f.write(ic.encode_bmp(blocks))
    t = np.arange(8000) / 16000
    tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    with open(os.path.join(d, "tone.wav"), "wb") as f:
        f.write(ic.encode_wav(tone, 16000))
    return d


def main() -> None:
    spark = get_spark(app_name="multimodal-pipeline")
    d = _make_media_dir()

    media = with_media_metadata(read_binary_files(spark, d))
    print("ingested:")
    media.select("path", F.col("media_meta.mime").alias("mime"), "content_size").show(
        truncate=False
    )

    images = media.where(F.col("media_meta.mime").startswith("image/"))
    resized = resize_images(images, 16, 16, decoder="image")
    rows = extract_features(resized, dim=64, decoder="image").collect()
    vecs = {r.content_hash: np.array(r.feature) for r in rows}

    print("pairwise cosine (16x16 luma features of the resized images):")
    sims = {}
    keys = sorted(vecs)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            va, vb = vecs[a], vecs[b]
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
            print(f"  {a[:10]}… × {b[:10]}… = {cos:.4f}")
            sims[(a, b)] = cos

    # self-check 1: exactly one near-dup pair — the PNG/JPEG encodings of
    # the same gradient — and it dominates every cross-image pair
    ranked = sorted(sims.values(), reverse=True)
    assert ranked[0] > 0.999 and (len(ranked) == 1 or ranked[1] < 0.999), sims
    print("near-dup pair found across PNG/JPEG encodings ✔")

    # self-check 2: audio path produces real (non-zero) RMS features
    audio = media.where(F.col("media_meta.mime").startswith("audio/"))
    af = extract_features(audio, dim=16, decoder="audio").collect()
    assert len(af) == 1 and max(af[0].feature) > 0.2
    print("audio RMS envelope decoded ✔")

    spark.stop()


if __name__ == "__main__":
    main()
