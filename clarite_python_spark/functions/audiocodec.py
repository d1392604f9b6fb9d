"""Pure-numpy WAV (RIFF/PCM) codec for the multimodal audio stages — no
codec library needed (none is available in this environment).

Real decode/encode for the canonical uncompressed WAV variants:

- RIFF/WAVE container with ``fmt `` + ``data`` chunks (any extra chunks
  — ``LIST``, ``fact``, ... — are skipped; chunks are word-aligned per
  the RIFF spec);
- PCM (``wFormatTag == 1``): unsigned 8-bit and signed little-endian
  16-bit samples, any channel count (interleaved frames).

Payloads that are not RIFF/WAVE PCM return ``None`` from
:func:`decode_wav` so callers can fall back to their stub path — the
same dispatch contract ``operators.multimodal`` uses for images.

Format facts are public (RIFF/WAVE specification); the reference engine
(HallLab/clarite-python) has no media handling — this module backs the
LLM-pipeline extension surface only.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_wav",
    "encode_wav",
    "resample_nearest",
]


def decode_wav(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """RIFF/WAVE PCM payload -> ``(sample_rate, samples)`` where samples
    is ``(n_frames, n_channels)`` int32 centered at 0 (8-bit unsigned is
    re-centered by -128; 16-bit is native). ``None`` for anything the
    codec does not cover."""
    if not payload or len(payload) < 12:
        return None
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or channels < 1 or rate <= 0 or bits not in (8, 16):
        return None
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        usable = len(data) - (len(data) % 2)
        samples = np.frombuffer(data, dtype="<i2", count=usable // 2).astype(np.int32)
    frames = samples.size // channels
    if frames == 0:
        return None
    return rate, samples[: frames * channels].reshape(frames, channels)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """``(n_frames, n_channels)`` (or 1-D mono) int array centered at 0
    -> canonical 44-byte-header PCM WAV bytes."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if bits == 8:
        body = (np.clip(arr, -128, 127) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = np.clip(arr, -32768, 32767).astype("<i2").tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resample_nearest(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Nearest-neighbor resample along the frame axis — the same
    pixel-center mapping as ``imagecodec.resize_nearest`` applied to
    time (``floor((i + 0.5) * src/dst)``)."""
    src_n = samples.shape[0]
    dst_n = max(1, int(round(src_n * dst_rate / src_rate)))
    idx = np.minimum(((np.arange(dst_n) + 0.5) * src_n / dst_n).astype(np.int64), src_n - 1)
    return samples[idx]
