"""Stdlib WAV codec: roundtrip across mono/stereo, exact features on a
known waveform, RIFF chunk-walk tolerance, corrupt-blob rejection, and the
Spark mapInPandas feature op against a pure-Python recomputation."""

import struct
import zlib

import pytest

from dagger_spark.ops.audio import (
    decode_wav,
    encode_wav,
    extract_audio_features,
    fake_audio_blob,
    fake_audio_df,
    wav_features,
)


@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(channels):
    samples = [((i * 797) % 65536) - 32768 for i in range(240 * channels)]
    blob = encode_wav(samples, 8000, channels)
    rate, ch, out = decode_wav(blob)
    assert (rate, ch, out) == (8000, channels, samples)


def test_known_square_wave_features():
    # 100 frames alternating +1000/-1000 every 10 frames: 9 sign flips
    samples = [1000 if (i // 10) % 2 == 0 else -1000 for i in range(100)]
    f = wav_features(8000, 1, samples)
    assert f["n_frames"] == 100
    assert f["duration_s"] == round(100 / 8000, 6)
    assert f["peak"] == 1000
    assert f["rms"] == 1000.0  # constant magnitude
    assert f["zero_crossings"] == 9


def test_zero_samples_do_not_count_as_crossings():
    # +5, 0, 0, -5 is ONE crossing; +5, 0, 0, +5 is none
    assert wav_features(8000, 1, [5, 0, 0, -5])["zero_crossings"] == 1
    assert wav_features(8000, 1, [5, 0, 0, 5])["zero_crossings"] == 0


def test_stereo_zcr_uses_channel0_only():
    # ch0 constant positive, ch1 alternates: ZCR must be 0
    inter = []
    for i in range(50):
        inter += [100, 200 if i % 2 == 0 else -200]
    assert wav_features(8000, 2, inter)["zero_crossings"] == 0


def test_unknown_chunks_are_skipped():
    samples = [3, -7, 11, -13]
    blob = encode_wav(samples, 8000, 1)
    # splice a LIST chunk (odd size -> exercises word-align padding)
    # between fmt and data
    fmt_end = blob.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:fmt_end] + junk + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)[2] == samples


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[: len(b) // 2],              # truncated mid-data
        lambda b: b"JUNK" + b[4:],               # wrong magic
        lambda b: b[:8] + b"AVI " + b[12:],      # wrong form type
        lambda b: b.replace(b"data", b"datx"),   # data chunk missing
        lambda b: b.replace(                     # 8-bit PCM refused
            struct.pack("<HH", 2 * 1, 16)[2:], struct.pack("<H", 8), 1
        ),
    ],
)
def test_corrupt_blobs_raise(mutate):
    blob = encode_wav([1, -1, 2, -2], 8000, 1)
    with pytest.raises(ValueError):
        decode_wav(mutate(bytes(blob)))


def test_encode_validates_inputs():
    with pytest.raises(ValueError):
        encode_wav([40000], 8000, 1)  # out of int16 range
    with pytest.raises(ValueError):
        encode_wav([1, 2, 3], 8000, 2)  # does not interleave


def test_spark_feature_op_matches_python(spark):
    out = {r["media_id"]: r for r in extract_audio_features(
        fake_audio_df(spark, 48)).collect()}
    assert len(out) == 48
    # corrupted ids (i % 16 == 5) -> valid=false, everything else decodes
    for i in range(48):
        assert out[i]["valid"] == (i % 16 != 5)
    # exact recomputation of one mono and one stereo row
    for mid in (2, 3):
        rate, ch, samples = decode_wav(fake_audio_blob(mid))
        f = wav_features(rate, ch, samples)
        row = out[mid]
        assert row["channels"] == ch == 1 + (mid % 2)
        for k in ("sample_rate", "n_frames", "duration_s", "rms", "peak",
                  "zero_crossings"):
            assert row[k] == f[k], (mid, k)
        assert row["sample_crc"] == zlib.crc32(
            struct.pack(f"<{len(samples)}h", *samples))
