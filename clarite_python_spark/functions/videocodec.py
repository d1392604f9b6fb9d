"""Pure-python AVI (RIFF) video demuxer for the multimodal stages — no
codec library needed (none is available in this environment).

Real container handling for the canonical uncompressed AVI layout:

- RIFF/AVI  with ``LIST hdrl`` (``avih`` main header, ``LIST strl`` with
  ``strh``/``strf`` stream headers) and ``LIST movi`` holding the frame
  chunks (``..db`` uncompressed DIB / ``..dc`` compressed), including
  frames nested in ``rec `` LISTs; chunks are word-aligned per RIFF.
- Frames are returned as raw chunk payloads. For 24-bit uncompressed
  streams a frame payload IS the BMP pixel array (bottom-up, BGR, rows
  padded to 4 bytes), so :func:`wrap_dib_as_bmp` turns one into a
  standalone BMP that ``imagecodec.decode_image`` decodes — a real
  demux -> decode chain.

Payloads that are not RIFF/AVI return ``None`` from :func:`decode_avi`
so callers can fall back to their stub path (the dispatch contract used
by ``operators.multimodal``).

Format facts are public (AVI RIFF specification); the reference engine
(HallLab/clarite-python) has no media handling — this module backs the
LLM-pipeline extension surface only.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_avi",
    "encode_avi",
    "wrap_dib_as_bmp",
]


def _walk_frames(payload: bytes, pos: int, end: int, frames: list[bytes]) -> None:
    """Collect ``..db``/``..dc`` chunk payloads between pos and end,
    descending into nested ``rec `` LISTs."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        if cid == b"LIST":
            if payload[body_start : body_start + 4] == b"rec ":
                _walk_frames(payload, body_start + 4, body_start + size, frames)
        elif cid[2:4] in (b"db", b"dc"):
            frames.append(payload[body_start : body_start + size])
        pos = body_start + size + (size & 1)


def decode_avi(payload: bytes | None) -> tuple[int, int, int, list[bytes]] | None:
    """RIFF/AVI payload -> ``(width, height, bits_per_pixel, frames)``
    with frames as raw chunk payloads; ``None`` for anything else."""
    if not payload or len(payload) < 12:
        return None
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    width = height = bpp = 0
    frames: list[bytes] = []
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        if cid == b"LIST":
            subtype = payload[body_start : body_start + 4]
            if subtype == b"movi":
                _walk_frames(payload, body_start + 4, body_start + size, frames)
            elif subtype in (b"hdrl", b"strl"):
                # descend: hdrl holds avih + strl; strl holds strh/strf
                inner = body_start + 4
                inner_end = body_start + size
                while inner + 8 <= inner_end:
                    icid = payload[inner : inner + 4]
                    isize = struct.unpack_from("<I", payload, inner + 4)[0]
                    ibody = inner + 8
                    if icid == b"LIST" and payload[ibody : ibody + 4] == b"strl":
                        jnner = ibody + 4
                        jend = ibody + isize
                        while jnner + 8 <= jend:
                            jcid = payload[jnner : jnner + 4]
                            jsize = struct.unpack_from("<I", payload, jnner + 4)[0]
                            if jcid == b"strf" and jsize >= 16:
                                width, height = struct.unpack_from(
                                    "<ii", payload, jnner + 8 + 4
                                )
                                bpp = struct.unpack_from("<H", payload, jnner + 8 + 14)[0]
                            jnner += 8 + jsize + (jsize & 1)
                    inner += 8 + isize + (isize & 1)
        pos = body_start + size + (size & 1)
    if not frames:
        return None
    return width, abs(height), bpp, frames


def _dib_bytes(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> bottom-up BGR DIB pixel bytes, rows padded
    to 4 bytes (the layout both BMP and 24-bit AVI ``00db`` frames use)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    return padded.tobytes()


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """List of (H, W, 3) uint8 RGB frames -> minimal standard AVI bytes
    (``hdrl`` with avih + vids strl, 24-bit DIB ``00db`` frames)."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    dibs = [_dib_bytes(f) for f in frames]
    frame_size = len(dibs[0])

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per sec
        0, 0x10,           # padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), frame_size, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wrap_dib_as_bmp(dib: bytes, width: int, height: int) -> bytes:
    """Raw 24-bit DIB pixel bytes (as stored in a ``00db`` frame) -> a
    standalone BMP payload ``imagecodec.decode_image`` understands."""
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(dib), 0, 0, 54)
    dib_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(dib), 2835, 2835, 0, 0
    )
    return file_header + dib_header + dib
