"""Multimodal plumbing: mapInPandas stages over opaque binary blobs."""

import struct

import pytest

from dagger_spark.ops.multimodal import (
    decode_image, extract_features, extract_image_meta, fake_media_df,
    frame_sample_plan, pack_fake_image, resize_image, DEFAULT_PROBE,
    MAGIC, MEDIA_SCHEMA,
)

# deterministic stand-in codecs for a "real" format (magic PNGX + LE dims):
# built as CLOSURES (factory) so cloudpickle ships them to Python workers by
# value — a test module isn't importable there, but an installed Pillow
# would be, which is exactly the difference between injected and default
# codecs
def _make_codecs():
    def probe(blob):
        if bytes(blob[:4]) != b"PNGX":
            raise ValueError("bad magic")
        w, h = struct.unpack("<II", bytes(blob[4:12]))
        return w, h, 3

    def resize(blob, w, h):
        if bytes(blob[:4]) != b"PNGX":
            raise ValueError("bad magic")
        return b"PNGX" + struct.pack("<II", w, h)

    return probe, resize


def _pngx(w, h):
    return bytearray(b"PNGX" + struct.pack("<II", w, h))


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


@pytest.mark.skipif(DEFAULT_PROBE is not None,
                    reason="codec installed: strict no longer raises")
def test_decode_image_strict_raises_without_codec(media):
    with pytest.raises(NotImplementedError):
        decode_image(media, strict=True)


def test_injected_codec_decodes_real_format(spark):
    """With a codec available, strict mode runs and real-format blobs decode
    through it; fake-header blobs still parse; junk is flagged."""
    rows = [
        (0, "image/test", _pngx(320, 200), ("s", 12)),
        (1, "image/fake", bytearray(pack_fake_image(1, 10, 20)), ("s", 84)),
        (2, "image/test", bytearray(b"junk"), ("s", 4)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    probe, _ = _make_codecs()
    got = {
        r["media_id"]: (r["width"], r["height"], r["valid"])
        for r in decode_image(df, strict=True, codec=probe).collect()
    }
    assert got == {0: (320, 200, True), 1: (10, 20, True), 2: (None, None, False)}


def test_injected_codec_resizes_real_format(spark):
    rows = [
        (0, "image/test", _pngx(320, 200), ("s", 12)),
        (1, "image/fake", bytearray(pack_fake_image(1, 10, 20)), ("s", 84)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    probe, resize = _make_codecs()
    resized = resize_image(df, 64, 48, strict=True, codec=resize)
    meta = {
        r["media_id"]: (r["width"], r["height"])
        for r in extract_image_meta(resized, codec=probe).collect()
    }
    assert meta == {0: (64, 48), 1: (64, 48)}


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


@pytest.mark.skipif(DEFAULT_PROBE is not None,
                    reason="codec installed: strict no longer raises")
def test_resize_strict_raises_without_codec(media):
    with pytest.raises(NotImplementedError):
        resize_image(media, 224, 224, strict=True)


def test_frame_sample_plan_explodes(media):
    out = frame_sample_plan(media, every_n=4)
    assert out.count() == 32 * 4
