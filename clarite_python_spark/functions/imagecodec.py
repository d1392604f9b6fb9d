"""Pure-numpy image codec for the multimodal stages — no codec library
needed (none is available in this environment).

Real decode/encode for two public, uncompressed formats:

- **BMP** (Windows device-independent bitmap): 24-bit ``BI_RGB``
  with the standard 54-byte ``BITMAPFILEHEADER`` + ``BITMAPINFOHEADER``,
  rows bottom-up (or top-down when height is negative), BGR byte order,
  rows padded to 4-byte boundaries. That single variant is what every
  "save as BMP" path emits by default.
- **PPM/PGM** (netpbm): binary ``P6`` (RGB) and ``P5`` (grayscale),
  maxval <= 255, with ``#`` comment handling in the header.

Payloads whose magic bytes match neither format return ``None`` from
:func:`decode_image` so callers can fall back to their stub path — the
dispatch contract used by ``operators.multimodal``.

Format facts are public (BMP file format / netpbm specifications); the
reference engine (HallLab/clarite-python) has no media handling at all —
this module backs the LLM-pipeline extension surface only.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_image",
    "encode_bmp",
    "encode_ppm",
    "resize_nearest",
]


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB, or None if the
    payload is some other BMP variant (compressed, paletted, 32-bit)."""
    if len(payload) < 54:
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:  # BITMAPCOREHEADER etc. — not supported
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_offset + stride * height
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=data_offset)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit ``BI_RGB`` BMP bytes (bottom-up)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB -> BGR
    pixel_bytes = padded.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return file_header + dib + pixel_bytes


# --------------------------------------------------------------------------
# PPM / PGM (netpbm binary forms)
# --------------------------------------------------------------------------


def _pnm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int] | None:
    """Read ``n_tokens`` whitespace-separated integers after the magic,
    skipping ``#`` comments; returns (tokens, offset_of_pixel_data)."""
    pos = 2  # past magic
    tokens: list[int] = []
    n = len(payload)
    while len(tokens) < n_tokens:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            return None
        try:
            tokens.append(int(payload[start:pos]))
        except ValueError:
            return None
    return tokens, pos + 1  # exactly one whitespace byte after maxval


def _decode_pnm(payload: bytes) -> np.ndarray | None:
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    parsed = _pnm_header_tokens(payload, 3)
    if parsed is None:
        return None
    (w, h, maxval), offset = parsed
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    need = w * h * channels
    if len(payload) < offset + need:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=offset).reshape(
        h, w, channels
    )
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr.copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary ``P6`` bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# --------------------------------------------------------------------------
# dispatch + resize
# --------------------------------------------------------------------------


def decode_image(payload: bytes | None) -> np.ndarray | None:
    """Decode a BMP/PPM/PGM payload to (H, W, 3) uint8 RGB; ``None`` for
    anything else (caller falls back to its stub)."""
    if not payload or len(payload) < 2:
        return None
    magic = bytes(payload[:2])
    if magic == b"BM":
        return _decode_bmp(bytes(payload))
    if magic in (b"P6", b"P5"):
        return _decode_pnm(bytes(payload))
    return None


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — the pixel-center
    mapping (``floor((i + 0.5) * src/dst)``) used by standard decoders."""
    src_h, src_w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return arr[rows][:, cols]
