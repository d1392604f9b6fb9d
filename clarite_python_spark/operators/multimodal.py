"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED (image/audio codec libraries are not in
this container): ``decode_image`` produces a deterministic fake feature
vector derived from the bytes' hash, clearly marked, so the Spark-side
plumbing — schema, batch shape, partition sizing, UDF signature — is real
and tested while the codec is swappable.

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

__all__ = [
    "with_media_metadata",
    "decode_image_features",
    "resize_images",
    "sample_frames",
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
    """STUB: deterministic stand-in for a real image decoder + feature
    extractor. Derives ``dim`` floats from the SHA-256 of the payload.
    Replace with (e.g.) PIL/torchvision decode in a real deployment."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.rand(dim).astype(np.float32)


def decode_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", dim: int = 16
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    The per-batch loop is the real production shape (Arrow batches in,
    feature arrays out); only ``_fake_features`` is a stub."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p, dim).tolist() for p in pdf[payload_col]]
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

    The Spark shape is the production one: payloads stay in place (no
    shuffle — the stage is a map over the scan), output rows carry the
    resized payload plus target dims so a sink or downstream decode
    stage can validate. Only ``_fake_resize`` is a stub."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_fake_resize(p, width, height) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, frame_payload) rows. The decoder is stubbed — frames are
    deterministic byte slices — but the explode shape, schema, and
    batch-memory behavior match a real ffmpeg-backed implementation."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                for i in range(max_frames):
                    start = i * every_n
                    if start >= len(payload):
                        break
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(bytes(payload[start : start + every_n]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_payload": payloads})

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
