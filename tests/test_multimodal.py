"""Multimodal plumbing: schemas, batch shapes, and determinism of the
mapInPandas stages (codec bodies are honest stubs — see multimodal.py)."""

from __future__ import annotations

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
