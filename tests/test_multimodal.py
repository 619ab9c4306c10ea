"""Multimodal plumbing: mapInPandas stages over opaque binary blobs."""

import pytest

from dagger_spark.ops.multimodal import (
    decode_image, extract_features, extract_image_meta, fake_media_df,
    frame_sample_plan, pack_fake_image, resize_image, MAGIC,
)


@pytest.fixture(scope="module")
def media(spark):
    return fake_media_df(spark, n=32)


def test_extract_image_meta_parses_headers(media):
    rows = {r["media_id"]: r for r in extract_image_meta(media).collect()}
    assert len(rows) == 32
    assert all(r["valid"] for r in rows.values())
    assert rows[0]["width"] == 64 and rows[0]["channels"] == 3
    assert rows[1]["width"] == 96


def test_malformed_blob_flagged_not_fatal(spark):
    rows = [
        (0, "image/fake", bytearray(pack_fake_image(0, 10, 10)), ("s", 84)),
        (1, "image/fake", bytearray(b"garbage"), ("s", 7)),
        (2, "image/fake", None, ("s", 0)),
    ]
    from dagger_spark.ops.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["valid"] for r in extract_image_meta(df).collect()}
    assert got == {0: True, 1: False, 2: False}


def test_decode_image_strict_raises(media):
    with pytest.raises(NotImplementedError):
        decode_image(media, strict=True)


def test_extract_features_histogram(media):
    rows = {r["media_id"]: r for r in extract_features(media, bins=16).collect()}
    assert all(r["valid"] for r in rows.values())
    f0 = rows[0]["features"]
    assert len(f0) == 16
    assert abs(sum(f0) - 1.0) < 1e-9  # normalized histogram
    # deterministic: same blob -> same features
    again = {r["media_id"]: r for r in extract_features(media, bins=16).collect()}
    assert again[0]["features"] == f0


def test_resize_stamps_target_dims(media):
    resized = resize_image(media, 224, 224)
    meta = {r["media_id"]: r for r in extract_image_meta(resized).collect()}
    assert all(r["width"] == 224 and r["height"] == 224 for r in meta.values())


def test_resize_strict_raises(media):
    with pytest.raises(NotImplementedError):
        resize_image(media, 224, 224, strict=True)


def test_frame_sample_plan_explodes(media):
    out = frame_sample_plan(media, every_n=4)
    assert out.count() == 32 * 4
