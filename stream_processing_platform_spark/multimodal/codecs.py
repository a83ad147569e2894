"""Multimodal columns for the LLM-data-pipeline surface.

Design (100 TB): media payloads are opaque ``binary`` columns carried
next to a typed metadata struct; all heavy work happens in Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through Python
row objects, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning guidance:
repartition by a content-hash bucket before decode so skewed file sizes
spread across executors.

Decoder tiers:

- ``decoder="image"`` / ``decoder="audio"`` — REAL decode via the
  dependency-free codecs in :mod:`imagecodec` (netpbm P5/P6,
  uncompressed BMP, PNG via stdlib zlib, baseline AND progressive
  JPEG at any integral subsampling via the from-scratch
  :mod:`jpegcodec`, animated GIF via :mod:`gifcodec`, PCM WAV):
  actual pixels/samples drive resize, feature extraction, AND frame
  sampling (``sample_video_frames(decoder="image")`` walks the GIF
  delay timeline). MP4 (and arithmetic/12-bit JPEG) still need codec
  libraries not present in this container and raise with a clear
  message.
- ``decoder="fake"`` — deterministic stub that synthesizes features
  from the payload's sha256 (stable, testable, same schema and batch
  shape as a real decoder); the default so pipelines over arbitrary
  binary payloads stay runnable.
- ``decoder="video"``-style MP4 frame sampling remains STUBBED
  (ffmpeg required); GIF frame sampling is real.
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
    DoubleType,
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
        .when(F.col("path").endswith(".ppm") | F.col("path").endswith(".pgm"), "image/x-portable-pixmap")
        .when(F.col("path").endswith(".bmp"), "image/bmp")
        .when(F.col("path").endswith(".wav"), "audio/wav")
        .when(F.col("path").endswith(".flac"), "audio/flac")
        .when(F.col("path").endswith(".gif"), "image/gif")
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
    decoder (PIL/torchvision/ffmpeg) where available.

    Expansion stays in the HEX-STRING domain (seed = hex digest of the
    payload; per-8-dim block = sha256 of ``seed|i`` as text) so the
    q_multimodal_features duckdb oracle can replicate it exactly —
    duckdb's sha256 takes VARCHAR only, and the hex seed sidesteps
    NUL-byte round-trips for arbitrary binary payloads."""
    out = np.empty(dim, dtype=np.float32)
    seed = hashlib.sha256(payload or b"").hexdigest()
    block = b""
    for i in range(dim):
        if i % 8 == 0:
            block = hashlib.sha256(f"{seed}|{i}".encode()).digest()
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
    mapInPandas. ``decoder="image"`` decodes real pixels (PPM/PGM/BMP/PNG →
    Rec. 601 luma grid, :mod:`imagecodec`), ``decoder="audio"`` real
    samples (PCM WAV → RMS energy envelope); ``decoder="fake"`` runs
    the deterministic stub; ``decoder="video"`` still requires ffmpeg
    and raises ``NotImplementedError``."""
    if decoder == "fake":
        extract = _fake_decode_features
    elif decoder == "image":
        from stream_processing_platform_spark.multimodal import imagecodec

        def extract(payload: bytes, d: int) -> np.ndarray:
            return imagecodec.image_features(imagecodec.decode_image(payload), d)

    elif decoder == "audio":
        from stream_processing_platform_spark.multimodal import imagecodec

        def extract(payload: bytes, d: int) -> np.ndarray:
            return imagecodec.audio_features(imagecodec.decode_wav(payload)[1], d)

    else:
        raise NotImplementedError(
            f"{decoder!r} decoding needs codec libraries not present in this "
            "container; the Spark-side plumbing is identical to decoder='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                extract(bytes(p) if p is not None else b"", dim) for p in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "content_hash": pdf[batch_hash_col],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[content_col]],
                }
            )

    return df.mapInPandas(run, _FEATURE_SCHEMA)


_RESIZED_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """Image resize stage: Arrow-batched mapInPandas, binary in → binary
    out + final dimensions. ``decoder="image"`` does REAL pixel work:
    decode (PPM/PGM/BMP, :mod:`imagecodec`) → nearest-neighbor resize →
    re-encode as binary PPM. ``decoder="fake"`` emits a deterministic
    width*height-byte payload derived from the input hash (same schema
    and batch shape)."""
    if decoder == "image":
        from stream_processing_platform_spark.multimodal import imagecodec

        def resize_one(p) -> bytes:
            img = imagecodec.decode_image(bytes(p) if p is not None else b"")
            return imagecodec.encode_ppm(imagecodec.resize_nearest(img, width, height))

    elif decoder == "fake":

        def resize_one(p) -> bytes:
            return (
                _fake_decode_features(
                    # ceil(w*h/4) float32s = at least w*h bytes, then trim
                    # (w*h//4 under-produced when w*h wasn't divisible by 4)
                    bytes(p) if p is not None else b"", max(1, (width * height + 3) // 4)
                )
                .view(np.uint8)
                .tobytes()[: width * height]
            )

    else:
        raise NotImplementedError(
            "decoder must be 'image' (PPM/PGM/BMP/PNG/baseline-JPEG) or 'fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [resize_one(p) for p in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "content_hash": pdf["content_hash"],
                    "content": payloads,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                }
            )

    return df.mapInPandas(run, _RESIZED_SCHEMA)


_FRAMES_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int,
    content_col: str = "content",
    duration_col: str = "content_size",
    decoder: str = "fake",
    on_foreign: str = "error",
) -> DataFrame:
    """Video frame-sampling stage: 1 input row → N frame rows via
    Arrow-batched mapInPandas (the fan-out shape a real ffmpeg sampler
    needs — per-frame rows, not an array column, so frames repartition
    independently downstream).

    ``decoder="image"`` runs a REAL decode for animated GIF payloads
    (:mod:`gifcodec`) and Motion-JPEG MP4 (:mod:`mp4codec` container
    tables + :mod:`jpegcodec` sample decode): frames compose on the
    per-frame delay / stts timeline and the frame shown at each
    ``every_ms`` tick is emitted as a PNG payload (``frame_ts_ms`` =
    the tick). AVC/HEVC-in-MP4 parses (sample offsets/keyframes) but
    cannot entropy-decode — such payloads follow ``on_foreign``.
    ``on_foreign`` controls undecodable payloads in a mixed corpus:
    ``"error"`` (default) fails the job — callers pre-filter by magic
    bytes; ``"skip"`` emits zero frame rows for that payload so one
    foreign file can't kill a full-corpus sampling job.
    ``decoder="fake"`` (default) treats ``duration_col`` (bytes) as
    milliseconds and derives payloads deterministically from
    (hash, frame_idx)."""
    if on_foreign not in ("error", "skip"):
        raise ValueError(f"on_foreign must be 'error' or 'skip', got {on_foreign!r}")
    if decoder == "image":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: dict[str, list] = {
                    "content_hash": [],
                    "frame_idx": [],
                    "frame_ts_ms": [],
                    "frame": [],
                }
                for h, payload in zip(pdf["content_hash"], pdf[content_col]):
                    raw = bytes(payload) if payload is not None else b""
                    try:
                        sampled = sample_frames_from_payload(raw, every_ms)
                    except NotImplementedError:
                        if on_foreign == "skip":
                            continue
                        raise
                    for i, ts, png in sampled:
                        out["content_hash"].append(h)
                        out["frame_idx"].append(i)
                        out["frame_ts_ms"].append(ts)
                        out["frame"].append(png)
                yield pd.DataFrame(
                    {
                        "content_hash": out["content_hash"],
                        "frame_idx": np.array(out["frame_idx"], dtype=np.int32),
                        "frame_ts_ms": np.array(out["frame_ts_ms"], dtype=np.int64),
                        "frame": out["frame"],
                    }
                )

        return df.mapInPandas(run, _FRAMES_SCHEMA)
    if decoder != "fake":
        raise NotImplementedError(
            "frame sampling beyond GIF requires ffmpeg (not in container); "
            "plumbing is identical to decoder='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "content_hash": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame": [],
            }
            for h, payload, dur in zip(
                pdf["content_hash"], pdf[content_col], pdf[duration_col]
            ):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(1, int(dur or 0) // every_ms)
                for i in range(n_frames):
                    out["content_hash"].append(h)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        _fake_decode_features(raw + i.to_bytes(4, "little"), 8)
                        .view(np.uint8)
                        .tobytes()
                    )
            yield pd.DataFrame(
                {
                    "content_hash": out["content_hash"],
                    "frame_idx": np.array(out["frame_idx"], dtype=np.int32),
                    "frame_ts_ms": np.array(out["frame_ts_ms"], dtype=np.int64),
                    "frame": out["frame"],
                }
            )

    return df.mapInPandas(run, _FRAMES_SCHEMA)


_SEGMENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
    ]
)


def decode_frame_timeline(raw: bytes) -> tuple[list[np.ndarray], list[int]]:
    """(frames, start_ms per frame boundary) for any supported moving-
    image container — animated GIF (delay timeline) or MJPEG MP4 (stts
    timeline). Raises NotImplementedError for undecodable codecs."""
    from stream_processing_platform_spark.multimodal import mp4codec
    from stream_processing_platform_spark.multimodal.gifcodec import decode_gif
    from stream_processing_platform_spark.multimodal.jpegcodec import decode_jpeg

    if raw[:6] in (b"GIF87a", b"GIF89a"):
        frames, delays = decode_gif(raw)
        starts = np.concatenate(([0], np.cumsum(delays)))
        return frames, [int(s) for s in starts]
    if mp4codec.is_mp4(raw):
        f = mp4codec.parse_mp4(raw)
        for t in f.video_tracks():
            if t.codec in ("jpeg", "mjpa") and t.n_samples:
                samples = mp4codec.extract_samples(raw, t)
                frames = [decode_jpeg(p) for _, _, p, _ in samples]
                starts = [ts for _, ts, _, _ in samples] + [t.duration_ms()]
                return frames, starts
            if t.codec == "avc1" and t.n_samples:
                # r10: real H.264 baseline entropy decode (CAVLC) —
                # from-scratch avccodec. IDR keyframes AND P frames
                # (quarter-pel MC, P_Skip/P_L0_16x16, intra-in-P)
                # decode; B slices stay honestly gated inside
                # decode_stream.
                from stream_processing_platform_spark.multimodal import avccodec

                if t.avcc is None:
                    raise ValueError("avc1 track without avcC record")
                sps_l, pps_l, ls = avccodec.parse_avcc(t.avcc)
                samples = mp4codec.extract_samples(raw, t)
                if not samples[0][3]:
                    raise ValueError("AVC track does not start at a sync sample")
                nals = list(sps_l) + list(pps_l)
                for _, _, payload, _ in samples:
                    nals += avccodec.from_avcc_sample(payload, ls)
                frames = [f[0] for f in avccodec.decode_stream(nals)]
                starts = [ts for _, ts, _, _ in samples] + [t.duration_ms()]
                return frames, starts
        raise NotImplementedError(
            "MP4 parsed but no decodable video track (HEVC and AVC "
            "inter frames are out of scope; MJPEG and all-IDR AVC "
            "decode to pixels)"
        )
    raise NotImplementedError(
        "real frame sampling supports animated GIF and MJPEG MP4 "
        "(other codecs need ffmpeg, not in container)"
    )


def sample_frames_from_payload(
    raw: bytes, every_ms: int
) -> list[tuple[int, int, bytes]]:
    """The per-payload core of :func:`sample_video_frames` as a pure
    function — (frame_idx, tick_ms, PNG payload) for the frame ON
    SCREEN at each ``every_ms`` tick (frame k shows during
    [start_k, start_{k+1})). Shared by the Arrow UDF and the
    q_video_frame_sample oracle generator (sequential-replay doctrine)."""
    from stream_processing_platform_spark.multimodal.imagecodec import encode_png

    frames, starts = decode_frame_timeline(raw)
    total = int(starts[-1])
    out: list[tuple[int, int, bytes]] = []
    k = 0
    for i, ts in enumerate(range(0, max(total, 1), every_ms)):
        while k + 1 < len(frames) and starts[k + 1] <= ts:
            k += 1
        out.append((i, ts, encode_png(frames[k])))
    return out


def segment_audio(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    frame_ms: int = 20,
    threshold: float = 0.05,
    min_frames: int = 2,
    codec: str = "wav",
) -> DataFrame:
    """Silence-split PCM audio payloads into voiced segments — the audio
    analog of document chunking (operators/mixture.py), 1-in-N-out
    through Arrow-batched ``mapInPandas``.

    ``codec``: 'wav' (RIFF PCM via :mod:`imagecodec`) or 'flac'
    (compressed — the from-scratch Rice+LPC decoder in
    :mod:`flaccodec`, r10); FLAC samples are normalized to the same
    [-1, 1] float range as the WAV path so the segmentation core sees
    identical semantics.

    Per payload: real WAV decode (:mod:`imagecodec`), per-frame RMS over
    ``frame_ms`` windows (vectorized cumsum — no Python loop over
    samples), frames above ``threshold`` are voiced, and contiguous
    voiced runs of at least ``min_frames`` frames become segments.
    Output: (media_id, seg_idx, start_ms, end_ms, n_samples, rms) —
    rms rounded to 6 decimals for cross-run determinism.

    Scale shape: pure map over partitions (no shuffle); one input row
    fans out to its segments inside the same task, so a 100 TB audio
    corpus segments at scan speed. Decode errors propagate (fail-fast,
    the engine-wide UDF error policy — SURVEY.md §7 risk 4).
    """
    from stream_processing_platform_spark.multimodal import imagecodec

    if codec == "mp3":
        # Honest gate, not an oversight: a conformant MPEG-1 Layer III
        # decoder requires the 34 spectral Huffman code tables (ISO
        # 11172-3 Table B.7) and the 512-tap synthesis window (Table
        # 3-B.3) — large numeric spec tables with no closed form. This
        # container has no copy of the spec or any codec library to
        # take them from, and inventing the values would yield a
        # decoder that only reads its own output while claiming MP3
        # support. WAV (PCM + G.711/ADPCM) and FLAC are the real,
        # fully-tested compressed-audio paths.
        # The metadata half IS implemented (r12): multimodal/mp3probe.py
        # walks the frame chain (ID3v2 skip, Xing/VBR, duration/bitrate
        # stats, q_mp3_probe full oracle) — probing needs only the
        # exactly-published header structure, not the PCM tables.
        raise NotImplementedError(
            "segment_audio: MP3 (MPEG-1 Layer III) decode requires the "
            "ISO 11172-3 Huffman and synthesis-window tables, which are "
            "not available in this environment; use codec='wav' or "
            "'flac' (frame/metadata probing is available via "
            "multimodal/mp3probe.parse_mp3)"
        )
    if codec not in ("wav", "flac"):
        raise ValueError(f"segment_audio: unknown codec {codec!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in _SEGMENT_SCHEMA.fields}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                if codec == "flac":
                    rate, samples = decode_flac_normalized(bytes(payload))
                else:
                    rate, samples = imagecodec.decode_wav(bytes(payload))
                for seg_idx, s_ms, e_ms, n, rms in segment_pcm(
                    rate, samples, frame_ms, threshold, min_frames
                ):
                    out["media_id"].append(int(mid))
                    out["seg_idx"].append(seg_idx)
                    out["start_ms"].append(s_ms)
                    out["end_ms"].append(e_ms)
                    out["n_samples"].append(n)
                    out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, _SEGMENT_SCHEMA)


def decode_flac_normalized(payload: bytes) -> tuple[int, np.ndarray]:
    """FLAC → (rate, float32 mono samples in [-1, 1]) — the exact scale
    contract of :func:`imagecodec.decode_wav`, so :func:`segment_pcm`
    (and its sequential-replay oracles) see identical semantics for
    both codecs. Multichannel is mean-downmixed like the WAV path."""
    from stream_processing_platform_spark.multimodal.flaccodec import decode_flac

    rate, pcm = decode_flac(payload)
    if pcm.dtype != np.int16:
        raise NotImplementedError(
            "decode_flac_normalized: only 16-bit streams have a defined "
            "[-1, 1] normalization here (WAV-path parity)"
        )
    x = pcm.astype(np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    return rate, x / 32768.0


def segment_pcm(
    rate: int,
    samples: np.ndarray,
    frame_ms: int,
    threshold: float,
    min_frames: int,
) -> list[tuple[int, int, int, int, float]]:
    """The per-payload segmentation core of :func:`segment_audio` as a
    pure function — (seg_idx, start_ms, end_ms, n_samples, rms) per
    voiced run — so the q_audio_segments oracle generator can replay
    the EXACT same numpy path sequentially on the driver (the
    sequential-replay doctrine; any drift between the UDF and the
    oracle would be a code path, not a copy)."""
    spf = max(1, rate * frame_ms // 1000)  # samples per frame
    n_frames = len(samples) // spf
    if n_frames == 0:
        return []
    x = samples[: n_frames * spf].astype(np.float64).reshape(n_frames, spf)
    rms = np.sqrt((x * x).mean(axis=1))
    voiced = rms > threshold
    # run boundaries: transitions in the voiced mask
    edges = np.flatnonzero(np.diff(np.concatenate(([0], voiced.view(np.int8), [0]))))
    out: list[tuple[int, int, int, int, float]] = []
    seg_idx = 0
    for f0, f1 in zip(edges[::2], edges[1::2]):
        if f1 - f0 < min_frames:
            continue
        seg = samples[f0 * spf : f1 * spf].astype(np.float64)
        out.append(
            (
                seg_idx,
                int(f0 * spf * 1000 // rate),
                int(f1 * spf * 1000 // rate),
                int(len(seg)),
                round(float(np.sqrt((seg * seg).mean())), 6),
            )
        )
        seg_idx += 1
    return out
