"""Stdlib AVI container codec: roundtrip, header exactness, chunk-walk
robustness, corrupt rejection, and the Spark frame-sampling op against a
pure-Python recomputation."""

import struct
import zlib

import pytest

from dagger_spark.ops.video import (
    decode_avi,
    encode_avi,
    fake_video_blob,
    fake_video_df,
    sample_video_frames,
)


def test_roundtrip():
    frames = [bytes([i] * (10 + i)) for i in range(7)]  # odd sizes too
    blob = encode_avi(frames, 32, 24, fps=10)
    w, h, fps, total, out = decode_avi(blob)
    assert (w, h, fps, total) == (32, 24, 10, 7)
    assert out == frames


def test_empty_video_roundtrips():
    w, h, fps, total, out = decode_avi(encode_avi([], 8, 8, fps=5))
    assert total == 0 and out == []


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[: len(b) * 2 // 3],          # truncated mid-movi
        lambda b: b"JUNK" + b[4:],               # wrong magic
        lambda b: b[:8] + b"WAVE" + b[12:],      # wrong form type
        lambda b: b.replace(b"avih", b"avix"),   # header missing
    ],
)
def test_corrupt_blobs_raise(mutate):
    blob = encode_avi([b"xx", b"yyy"], 8, 8, fps=5)
    with pytest.raises(ValueError):
        decode_avi(mutate(bytes(blob)))


def test_declared_frame_count_must_match():
    # splice one extra 00dc chunk into movi without touching avih
    blob = bytearray(encode_avi([b"aaaa"], 8, 8, fps=5))
    extra = b"00dc" + struct.pack("<I", 2) + b"zz"
    movi_at = bytes(blob).index(b"movi")
    # grow the movi LIST and RIFF sizes accordingly
    lsz_at = movi_at - 4
    lsz = struct.unpack_from("<I", blob, lsz_at)[0]
    struct.pack_into("<I", blob, lsz_at, lsz + len(extra))
    rsz = struct.unpack_from("<I", blob, 4)[0]
    struct.pack_into("<I", blob, 4, rsz + len(extra))
    blob = bytes(blob) + extra
    with pytest.raises(ValueError, match="declares 1 frames"):
        decode_avi(blob)


def test_spark_frame_sampling_matches_python(spark):
    out = sample_video_frames(fake_video_df(spark, 32), every_n=4).collect()
    rows = {}
    for r in out:
        rows.setdefault(r["media_id"], []).append(r)
    assert set(rows) == set(range(32))
    # corrupted id (i % 16 == 9) -> single valid=false row
    for bad in (9, 25):
        assert len(rows[bad]) == 1 and not rows[bad][0]["valid"]
    # exact recomputation of one id: every 4th frame, crc-identical
    w, h, fps, total, frames = decode_avi(fake_video_blob(3))
    got = sorted(
        (r["frame_idx"], r["frame_crc"]) for r in rows[3]
    )
    want = sorted((i, zlib.crc32(frames[i])) for i in range(0, total, 4))
    assert got == want
    assert all(r["width"] == w and r["fps"] == fps for r in rows[3])


def test_video_to_pixels_chain_is_value_exact(spark):
    # the composed catalog query: AVI -> sampled PNG frames -> raw pixels.
    # Every decoded pixel buffer must crc-match the ORIGINAL pixel bytes
    # the fixture encoded, proving both codecs round-trip through the DAG.
    from dagger_spark.catalog import QUERIES

    out = QUERIES["multimodal_video_pixels"].fn(spark, "unused").collect()
    assert out and all(r["valid"] for r in out)
    for r in out:
        vid, fidx = divmod(r["media_id"], 1000)
        w, h = 6 + vid % 3, 4 + vid % 2
        px = bytes((vid * 37 + fidx * 11 + j) % 256 for j in range(w * h * 3))
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["pixel_crc"] == zlib.crc32(px), r["media_id"]
