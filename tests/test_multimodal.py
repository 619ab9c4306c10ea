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


def test_decode_image_strict_accepts_png_codecless(spark):
    """strict=True no longer refuses work without Pillow: the stdlib PNG
    decoder sits in the default chain, so real PNG blobs yield real
    dimensions (and real pixels via decode_image_pixels) in this
    codec-less sandbox; junk still degrades per-blob."""
    from dagger_spark.ops.multimodal import decode_image_pixels, encode_png

    px = bytes(range(30)) * 2  # 5x4 RGB = 60 bytes
    rows = [
        (0, "image/png", bytearray(encode_png(5, 4, 3, px)), ("s", 0)),
        (1, "image/test", bytearray(b"junk"), ("s", 4)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["width"], r["height"], r["channels"], r["valid"])
        for r in decode_image(df, strict=True).collect()
    }
    assert got == {0: (5, 4, 3, True), 1: (None, None, None, False)}
    pix = {
        r["media_id"]: (r["valid"], None if r["pixels"] is None else bytes(r["pixels"]))
        for r in decode_image_pixels(df).collect()
    }
    assert pix[0] == (True, px)  # pixel-exact, no codec installed
    assert pix[1] == (False, None)


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


def test_resize_strict_png_codecless(spark):
    """strict resize works on PNG without Pillow: stdlib nearest-neighbor
    resample + re-encode, dimensions verified by the stdlib decoder."""
    from dagger_spark.ops.multimodal import decode_png, encode_png

    px = bytes((i * 7) % 256 for i in range(8 * 6 * 3))
    rows = [(0, "image/png", bytearray(encode_png(8, 6, 3, px)), ("s", 0))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_image(df, 4, 3, strict=True).collect()
    w, h, c, rpx = decode_png(bytes(out[0]["content"]))
    assert (w, h, c) == (4, 3, 3)
    # nearest-neighbor: out pixel (x,y) == src pixel (x*8//4, y*6//3)
    for y in range(3):
        for x in range(4):
            src = ((y * 2) * 8 + (x * 2)) * 3
            assert rpx[(y * 4 + x) * 3:(y * 4 + x) * 3 + 3] == px[src:src + 3]


def test_frame_sample_plan_explodes(media):
    out = frame_sample_plan(media, every_n=4)
    assert out.count() == 32 * 4


def test_phash_neardup_finds_planted_pairs_only(spark):
    """The composed decode -> phash -> banded-Hamming DAG: exactly the 8
    planted perturbation pairs, nonzero distances (the verify arm, not
    just band equality), and no cross-image false positives on
    md5-independent content."""
    from dagger_spark.catalog import QUERIES

    rows = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in QUERIES["multimodal_phash"].fn(
            spark, "/root/testdata/sf0.001").collect()
    )
    assert [(a, b) for a, b, _ in rows] == [(i, 100 + i) for i in range(8)]
    assert all(1 <= d <= 6 for _, _, d in rows), rows


def test_phash_matches_pure_python_reference(spark):
    """The executor-side hash is recomputed here in pure Python from the
    same decoded pixels — integer luma, nearest 8x8 grid, cross-multiplied
    mean threshold — and must agree bit-for-bit."""
    import hashlib

    from dagger_spark.ops.multimodal import (
        MEDIA_SCHEMA, decode_image_pixels, decode_png, encode_png,
        phash_from_pixels,
    )

    w = h = 16
    base = b"".join(hashlib.md5(f"ref:{k}".encode()).digest()
                    for k in range(w * h * 3 // 16))
    blob = encode_png(w, h, 3, base)
    media = spark.createDataFrame(
        [(0, "image/png", bytearray(blob), ("png", 0))], MEDIA_SCHEMA)
    got = phash_from_pixels(decode_image_pixels(media)).collect()[0]
    assert got.valid

    dw, dh, dc, px = decode_png(blob)
    lumas = []
    for gy in range(8):
        sy = gy * dh // 8
        for gx in range(8):
            sx = gx * dw // 8
            o = (sy * dw + sx) * dc
            lumas.append(
                (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000)
    total = sum(lumas)
    bits = 0
    for i, lum in enumerate(lumas):
        if lum * 64 > total:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    assert got.phash == bits


def test_phash_neardup_pigeonhole_guard():
    """max_dist >= bands breaks the pigeonhole soundness argument and must
    refuse loudly instead of silently missing pairs."""
    import pytest

    from dagger_spark.ops.multimodal import phash_neardup

    with pytest.raises(ValueError, match="pigeonhole"):
        phash_neardup(None, max_dist=8, bands=8)
