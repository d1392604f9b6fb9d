"""Multimodal plumbing: schemas, batch shapes, and determinism of the
mapInPandas stages. BMP/PPM payloads exercise the REAL pure-numpy codec
(functions/imagecodec.py); other payloads hit the honest stub path."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from clarite_python_spark.operators.multimodal import (
    decode_image_features,
    resize_images,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(10)) * (i + 1)) for i in range(8)]
    return spark.createDataFrame(rows, "media_id: long, payload: binary")


def test_metadata_columns(media):
    out = with_media_metadata(media)
    row = out.where(F.col("media_id") == 1).first()
    assert row["n_bytes"] == 20
    assert len(row["content_sha"]) == 64


def test_decode_features_shape_and_determinism(media):
    a = {r["media_id"]: r["features"] for r in decode_image_features(media, dim=8).collect()}
    b = {r["media_id"]: r["features"] for r in decode_image_features(media, dim=8).collect()}
    assert set(a) == set(range(8))
    assert all(len(v) == 8 for v in a.values())
    assert a == b  # deterministic per payload


def test_resize_images_schema_and_size(media):
    out = resize_images(media, width=4, height=3)
    rows = out.collect()
    assert out.columns == ["media_id", "payload", "width", "height"]
    assert len(rows) == 8
    for r in rows:
        assert (r["width"], r["height"]) == (4, 3)
        assert len(r["payload"]) == 12  # output scales with target pixels
    # deterministic and size-keyed: a different target size changes bytes
    other = {r["media_id"]: r["payload"] for r in resize_images(media, 3, 4).collect()}
    same = {r["media_id"]: r["payload"] for r in resize_images(media, 4, 3).collect()}
    byid = {r["media_id"]: r["payload"] for r in rows}
    assert same == byid
    assert any(other[i] != byid[i] for i in byid)


def _bmp_bytes(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Independent in-test BMP synthesizer (hand-packed headers, bottom-up
    BGR rows, 4-byte row padding) — deliberately NOT the library encoder."""
    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    raw = b""
    for row in reversed(pixels):
        rb = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        raw += rb + b"\x00" * (stride - len(rb))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 0, 0, 0, 0)
    return header + dib + raw


PIXELS = [  # 2 rows x 3 cols, distinct channel values
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]


def test_bmp_decode_exact_pixels():
    from clarite_python_spark.functions.imagecodec import decode_image

    arr = decode_image(_bmp_bytes(PIXELS))
    assert arr is not None and arr.shape == (2, 3, 3)
    np.testing.assert_array_equal(arr, np.array(PIXELS, dtype=np.uint8))


def test_ppm_decode_with_comment():
    from clarite_python_spark.functions.imagecodec import decode_image

    expected = np.array(PIXELS, dtype=np.uint8)
    payload = b"P6\n# a comment\n3 2\n255\n" + expected.tobytes()
    np.testing.assert_array_equal(decode_image(payload), expected)
    # P5 grayscale replicates into 3 channels
    gray = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    arr = decode_image(gray)
    assert arr.shape == (2, 2, 3)
    np.testing.assert_array_equal(arr[:, :, 0], [[0, 64], [128, 255]])
    np.testing.assert_array_equal(arr[:, :, 0], arr[:, :, 2])


def test_decode_features_real_pixels_through_stage(spark):
    """A real BMP through the mapInPandas stage must yield exact
    pixel-derived statistics, not hash noise."""
    bmp = _bmp_bytes(PIXELS)
    df = spark.createDataFrame([(1, bmp)], "media_id: long, payload: binary")
    feats = decode_image_features(df, dim=8).first()["features"]
    flat = np.array(PIXELS, dtype=np.float64).reshape(-1, 3)
    expected_stats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)]) / 255.0
    np.testing.assert_allclose(feats[:6], expected_stats, rtol=1e-6)
    gray = flat.mean(axis=1)
    hist = np.histogram(gray, bins=2, range=(0.0, 255.0))[0] / gray.size
    np.testing.assert_allclose(feats[6:], hist, rtol=1e-6)


def test_resize_real_bmp_through_stage(spark):
    """4x4 quadrant BMP -> 2x2 nearest-neighbor: each output pixel is its
    quadrant's color, and the output payload is itself a decodable BMP."""
    from clarite_python_spark.functions.imagecodec import decode_image

    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    pixels = [
        [q[0], q[0], q[1], q[1]],
        [q[0], q[0], q[1], q[1]],
        [q[2], q[2], q[3], q[3]],
        [q[3], q[2], q[3], q[3]],
    ]
    df = spark.createDataFrame(
        [(1, _bmp_bytes(pixels))], "media_id: long, payload: binary"
    )
    out = resize_images(df, width=2, height=2).first()
    assert bytes(out["payload"][:2]) == b"BM"  # stays in its format family
    arr = decode_image(out["payload"])
    np.testing.assert_array_equal(arr, [[q[0], q[1]], [q[2], q[3]]])


def test_resize_ppm_reencodes_p6(spark):
    from clarite_python_spark.functions.imagecodec import decode_image

    payload = b"P5\n2 2\n255\n" + bytes([0, 100, 200, 255])
    df = spark.createDataFrame([(1, payload)], "media_id: long, payload: binary")
    out = resize_images(df, width=4, height=4).first()
    assert bytes(out["payload"][:2]) == b"P6"
    arr = decode_image(out["payload"])
    assert arr.shape == (4, 4, 3)
    np.testing.assert_array_equal(arr[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(arr[3, 3], [255, 255, 255])


def test_non_image_payload_falls_back_to_stub(spark):
    """Unknown magic bytes keep the documented stub behavior."""
    df = spark.createDataFrame(
        [(1, b"\x89PNG not really decodable here")], "media_id: long, payload: binary"
    )
    feats = decode_image_features(df, dim=4).first()["features"]
    assert len(feats) == 4 and all(0.0 <= v <= 1.0 for v in feats)
    out = resize_images(df, width=4, height=3).first()
    assert len(out["payload"]) == 12  # stub length contract unchanged


def test_sample_frames_bounds(media):
    out = sample_frames(media, every_n=10, max_frames=4).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # media 0 has 10 bytes -> exactly 1 frame; media 7 has 80 -> capped at 4
    assert len(by_id[0]) == 1
    assert len(by_id[7]) == 4
    for r in out:
        assert len(r["frame_payload"]) <= 10


# ---------------------------------------------------------------- audio


def test_wav_roundtrip_16bit_stereo():
    import numpy as np
    from clarite_python_spark.functions.audiocodec import decode_wav, encode_wav

    src = np.array([[100, -100], [2000, -2000], [-32768, 32767]], dtype=np.int32)
    rate, got = decode_wav(encode_wav(src, 44100, bits=16))
    assert rate == 44100 and got.shape == (3, 2)
    assert (got == src).all()


def test_wav_roundtrip_8bit_and_chunk_skipping():
    import struct
    import numpy as np
    from clarite_python_spark.functions.audiocodec import decode_wav, encode_wav

    src = np.array([0, 127, -128, 5], dtype=np.int32)
    payload = encode_wav(src, 8000, bits=8)
    # splice an unknown odd-sized LIST chunk before fmt/data: decoders
    # must skip it (word-aligned) per the RIFF spec
    body = payload[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    rate, got = decode_wav(spliced)
    assert rate == 8000 and got[:, 0].tolist() == [0, 127, -128, 5]


def test_wav_rejects_non_pcm_and_garbage():
    from clarite_python_spark.functions.audiocodec import decode_wav

    assert decode_wav(b"") is None
    assert decode_wav(b"RIFFxxxxNOPE") is None
    assert decode_wav(b"\x89PNG not audio at all....") is None


def test_resample_nearest_audio():
    import numpy as np
    from clarite_python_spark.functions.audiocodec import resample_nearest

    src = np.arange(8, dtype=np.int32).reshape(8, 1)
    down = resample_nearest(src, 8000, 4000)
    # pixel-center mapping: floor((i + 0.5) * 8 / 4) -> 1, 3, 5, 7
    assert down[:, 0].tolist() == [1, 3, 5, 7]
    up = resample_nearest(src, 8000, 16000)
    assert up.shape == (16, 1)


def test_decode_audio_features_through_stage(spark):
    import numpy as np
    from clarite_python_spark.functions.audiocodec import encode_wav
    from clarite_python_spark.operators.multimodal import decode_audio_features

    sig = np.array([10, -10, 10, -10, 0, 0], dtype=np.int32)  # 3 neg-product pairs / 5
    rows = [
        (1, bytearray(encode_wav(sig, 1000, bits=16))),
        (2, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {r["media_id"]: r.asDict() for r in decode_audio_features(df).collect()}
    a = got[1]
    assert a["decoded"] is True and a["sample_rate"] == 1000
    assert a["n_frames"] == 6 and a["duration_ms"] == 6.0
    assert a["peak"] == 10 and a["zcr"] == 3 / 5
    assert abs(a["rms"] - np.sqrt(np.mean(sig.astype(float) ** 2))) < 1e-12
    assert got[2]["decoded"] is False and got[2]["rms"] is None


def test_resample_audio_through_stage(spark):
    import numpy as np
    from clarite_python_spark.functions.audiocodec import decode_wav, encode_wav
    from clarite_python_spark.operators.multimodal import resample_audio

    sig = np.arange(8, dtype=np.int32)
    rows = [(1, bytearray(encode_wav(sig, 8000, bits=16))), (2, bytearray(b"opaque"))]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {r["media_id"]: r.asDict() for r in resample_audio(df, 4000).collect()}
    rate, samples = decode_wav(got[1]["payload"])
    assert rate == 4000 and samples[:, 0].tolist() == [1, 3, 5, 7]
    assert got[1]["resampled"] is True
    assert got[2]["resampled"] is False and bytes(got[2]["payload"]) == b"opaque"


# ---------------------------------------------------------------- video


def test_avi_roundtrip_and_frame_sampling(spark):
    import numpy as np
    from clarite_python_spark.functions.imagecodec import decode_image
    from clarite_python_spark.functions.videocodec import encode_avi
    from clarite_python_spark.operators.multimodal import sample_frames

    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, (4, 6, 3), dtype=np.uint8) for _ in range(7)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames, fps=10)))], "media_id: long, payload: binary"
    )
    # every 3rd frame, capped at 2 -> source indices 0 and 3
    out = {r["frame_idx"]: bytes(r["frame_payload"])
           for r in sample_frames(df, every_n=3, max_frames=2).collect()}
    assert sorted(out) == [0, 3]
    for idx, bmp in out.items():
        arr = decode_image(bmp)  # real demux -> BMP wrap -> real decode
        assert arr is not None and (arr == frames[idx]).all()


def test_avi_nested_rec_list_and_fallback(spark):
    import struct
    import numpy as np
    from clarite_python_spark.functions.videocodec import decode_avi, encode_avi
    from clarite_python_spark.operators.multimodal import sample_frames

    frames = [np.full((2, 2, 3), i * 10, dtype=np.uint8) for i in range(3)]
    avi = bytearray(encode_avi(frames))
    # wrap the movi children in a 'rec ' LIST (interleaved-file layout):
    # decoders must descend into it
    movi_at = bytes(avi).find(b"LIST", 12)
    while bytes(avi)[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = bytes(avi).find(b"LIST", movi_at + 4)
    msize = struct.unpack_from("<I", avi, movi_at + 4)[0]
    children = bytes(avi[movi_at + 12 : movi_at + 8 + msize])
    rec = b"LIST" + struct.pack("<I", 4 + len(children)) + b"rec " + children
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    rebuilt = bytes(avi[:movi_at]) + new_movi
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8 + 0) + rebuilt[8:]
    got = decode_avi(rebuilt)
    assert got is not None and len(got[3]) == 3

    # non-AVI payloads keep the stub slice behavior
    df = spark.createDataFrame([(9, bytearray(b"0123456789" * 8))],
                               "media_id: long, payload: binary")
    rows = sample_frames(df, every_n=10, max_frames=4).collect()
    assert len(rows) == 4 and all(len(r["frame_payload"]) == 10 for r in rows)
