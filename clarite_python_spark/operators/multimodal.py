"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Decoding dispatches on magic bytes: BMP (24-bit ``BI_RGB``) and binary
PPM/PGM payloads are REALLY decoded by the pure-numpy codec in
``functions.imagecodec`` — real pixels in, real pixel-derived features /
nearest-neighbor resizes out. Every other MIME type falls back to the
clearly-marked deterministic STUBS (``_fake_features``/``_fake_resize``;
JPEG/PNG/audio codec libraries are not in this container), so the Spark
plumbing — schema, batch shape, partition sizing, UDF signature — is
identical for both paths and the codec is swappable per format.

Scale notes:
- binary payloads ride in parquet BYTE_ARRAY pages; keep them OUT of
  shuffles (process in place with mapInPandas, join results by id);
- ``spark.sql.files.maxPartitionBytes`` governs batch memory: with ~MB
  payloads keep partitions ≤128 MB so an Arrow batch of rows fits
  comfortably in the Python worker.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clarite_python_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
    resample_nearest,
)
from clarite_python_spark.functions.imagecodec import (
    decode_image,
    encode_bmp,
    encode_ppm,
    resize_nearest,
)
from clarite_python_spark.functions.videocodec import decode_avi, wrap_dib_as_bmp

__all__ = [
    "with_media_metadata",
    "decode_image_features",
    "resize_images",
    "sample_frames",
    "decode_audio_features",
    "resample_audio",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata columns computable without decoding: byte size and a
    content hash (JVM-side)."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "content_sha", F.sha2(F.col(payload_col), 256)
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """STUB: deterministic stand-in for codecs we can't decode here
    (JPEG/PNG/...). Feature i is big-endian uint32 i of the (chained)
    SHA-256 of the payload, scaled to [0, 1) — hash-direct rather than
    seeding an RNG so the derivation is reproducible anywhere (incl. the
    DuckDB oracle). Replace with (e.g.) PIL/torchvision in a real
    deployment."""
    buf = b""
    h = hashlib.sha256(payload or b"").digest()
    while len(buf) < 4 * dim:
        buf += h
        h = hashlib.sha256(h).digest()
    return np.asarray(
        [int.from_bytes(buf[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]
    )


def _pixel_features(arr: np.ndarray, dim: int) -> np.ndarray:
    """REAL pixel-derived features for decoded images: per-channel mean
    and std (scaled to [0, 1]), then a normalized grayscale histogram
    filling the remaining dimensions."""
    flat = arr.reshape(-1, 3).astype(np.float64)
    stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)]) / 255.0
    if dim <= 6:
        return stats[:dim]
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=dim - 6, range=(0.0, 255.0))
    return np.concatenate([stats, hist / gray.size])


def decode_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", dim: int = 16
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    BMP/PPM/PGM payloads are really decoded (``imagecodec.decode_image``)
    and yield true pixel statistics (``_pixel_features``); other formats
    fall back to the ``_fake_features`` stub. The per-batch loop is the
    production shape either way (Arrow batches in, feature arrays out)."""
    # double features: the pixel statistics are exact double math, so a
    # SQL oracle can reproduce them bit-for-bit (float32 would round)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = decode_image(p)
                feats.append(
                    (_pixel_features(arr, dim) if arr is not None else _fake_features(p, dim)).tolist()
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB: deterministic stand-in for decode -> resize -> re-encode
    (no codec libs in this container). Output length scales with the
    target pixel count so batch-memory behavior is realistic; content is
    a keyed hash-stream of the input, so it is deterministic and
    distinct per (payload, size). Replace with PIL ``Image.resize`` in a
    real deployment."""
    n_out = max(1, min(width * height, 1 << 16))
    out = bytearray()
    counter = 0
    seed = hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()
    while len(out) < n_out:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:n_out])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` (binary in, binary out).

    BMP/PPM/PGM payloads are really decoded, nearest-neighbor resized,
    and re-encoded in their own format family (BMP stays BMP, P6/P5
    becomes P6); other formats fall back to the ``_fake_resize`` stub.
    The Spark shape is the production one either way: payloads stay in
    place (no shuffle — the stage is a map over the scan), output rows
    carry the resized payload plus target dims so a sink or downstream
    decode stage can validate."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize_one(p: bytes | None) -> bytes:
        arr = decode_image(p)
        if arr is None:
            return _fake_resize(p, width, height)
        out = resize_nearest(arr, width, height)
        return encode_bmp(out) if bytes(p[:2]) == b"BM" else encode_ppm(out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode + feature-extract audio via ``mapInPandas``.

    RIFF/WAVE PCM payloads are really decoded (``audiocodec.decode_wav``)
    and yield exact sample statistics — frame count, duration, RMS, peak
    amplitude, and zero-crossing rate (fraction of adjacent same-channel
    frame pairs whose product is negative, averaged over channels) — in
    raw centered sample units so a SQL oracle can recompute them
    byte-for-byte. Non-WAV payloads yield ``decoded = false`` with null
    stats (honest fallback; swap in soundfile/librosa in a deployment
    with codec libraries). Payloads never shuffle: the stage is a map
    over the scan, results join back by id.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("decoded", T.BooleanType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.LongType()),
            T.StructField("zcr", T.DoubleType()),
        ]
    )

    def _stats(p: bytes | None) -> tuple:
        dec = decode_wav(p)
        if dec is None:
            return (False, None, None, None, None, None, None, None)
        rate, samples = dec
        x = samples.astype(np.float64)
        frames, channels = samples.shape
        rms = float(np.sqrt(np.mean(x * x)))
        peak = int(np.max(np.abs(samples)))
        if frames > 1:
            zcr = float(np.mean((x[:-1] * x[1:] < 0).sum(axis=0) / (frames - 1)))
        else:
            zcr = 0.0
        return (True, rate, channels, frames, frames * 1000.0 / rate, rms, peak, zcr)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_stats(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "decoded", "sample_rate", "n_channels", "n_frames",
                    "duration_ms", "rms", "peak", "zcr",
                ],
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resample_audio(
    df: DataFrame,
    dst_rate: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    bits: int = 16,
) -> DataFrame:
    """Resample WAV payloads to ``dst_rate`` via ``mapInPandas`` (binary
    in, binary out — the audio twin of ``resize_images``). Non-WAV
    payloads pass through unchanged with ``resampled = false``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("resampled", T.BooleanType()),
        ]
    )

    def _one(p: bytes | None) -> tuple:
        dec = decode_wav(p)
        if dec is None:
            return (p, None, False)
        rate, samples = dec
        out = resample_nearest(samples, rate, dst_rate)
        return (encode_wav(out, dst_rate, bits=bits), dst_rate, True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(rows, columns=["payload", "sample_rate", "resampled"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling for video payloads: emits (media_id, frame_idx,
    frame_payload) rows.

    RIFF/AVI payloads are REALLY demuxed (``videocodec.decode_avi``):
    every ``every_n``-th frame chunk is taken up to ``max_frames``, and
    24-bit DIB frames are re-wrapped as standalone BMPs so a downstream
    ``decode_image_features`` stage decodes real pixels — an actual
    demux -> decode chain. Other payloads keep the documented stub
    (deterministic byte slices; ffmpeg-class codecs aren't in this
    container). ``frame_idx`` is the frame's index in the source stream
    for the real path, the sample ordinal for the stub."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def _frames_of(payload: bytes | None) -> list[tuple[int, bytes]]:
        dec = decode_avi(payload)
        if dec is not None:
            width, height, bpp, frames = dec
            picked = list(range(0, len(frames), max(1, every_n)))[:max_frames]
            if bpp == 24 and width > 0 and height > 0:
                return [(i, wrap_dib_as_bmp(frames[i], width, height)) for i in picked]
            return [(i, frames[i]) for i in picked]
        payload = payload or b""
        out = []
        for i in range(max_frames):
            start = i * every_n
            if start >= len(payload):
                break
            out.append((i, bytes(payload[start : start + every_n])))
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, fp in _frames_of(payload):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(fp)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_payload": payloads})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
