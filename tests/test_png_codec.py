"""Pure-stdlib PNG codec: roundtrip across every scanline filter and color
type, CRC/shape rejection, and the resize path — no Pillow anywhere."""

import struct
import zlib

import pytest

from dagger_spark.ops.multimodal import (
    _png_probe, _png_resize, decode_png, encode_png,
)


def _pixels(w, h, c, seed=3):
    return bytes((seed + i * 37) % 256 for i in range(w * h * c))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_colortypes(filter_type, channels):
    w, h = 13, 7  # odd sizes: exercise stride edges
    px = _pixels(w, h, channels)
    blob = encode_png(w, h, channels, px, filter_type=filter_type)
    assert decode_png(blob) == (w, h, channels, px)


def test_probe_returns_dims():
    blob = encode_png(31, 17, 3, _pixels(31, 17, 3))
    assert _png_probe(blob) == (31, 17, 3)


def test_palette_png_expands_to_rgb():
    """Hand-built color-type-3 PNG: 4 palette entries, 4x2 indexed image."""
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9])
    idx = [0, 1, 2, 3,
           3, 2, 1, 0]
    raw = b"\x00" + bytes(idx[:4]) + b"\x00" + bytes(idx[4:])
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    w, h, c, px = decode_png(blob)
    assert (w, h, c) == (4, 2, 3)
    want = b"".join(plte[3 * i:3 * i + 3] for i in idx)
    assert px == want


def test_bad_crc_rejected():
    blob = bytearray(encode_png(4, 4, 1, _pixels(4, 4, 1)))
    blob[20] ^= 0xFF  # corrupt inside IHDR payload, CRC now wrong
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_non_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all........")


def test_unsupported_depth_rejected():
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(blob)


def test_resize_nearest_neighbor_exact():
    w, h = 6, 4
    px = _pixels(w, h, 3)
    out = _png_resize(encode_png(w, h, 3, px), 3, 2)
    rw, rh, rc, rpx = decode_png(out)
    assert (rw, rh, rc) == (3, 2, 3)
    for y in range(2):
        for x in range(3):
            src = ((y * h // 2) * w + (x * w // 3)) * 3
            assert rpx[(y * 3 + x) * 3:(y * 3 + x) * 3 + 3] == px[src:src + 3]


def test_upscale_roundtrip_dims():
    blob = encode_png(3, 3, 4, _pixels(3, 3, 4))
    assert decode_png(_png_resize(blob, 9, 6))[:3] == (9, 6, 4)
