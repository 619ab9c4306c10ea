"""Pure-stdlib AVI (RIFF) video container codec + Spark frame-sampling op.

Completes the multimodal triad to one standard: the PNG codec made image
pixels real, the WAV codec made audio samples real, and this makes VIDEO
CONTAINER work real — chunk walk, header parse, frame extraction, frame
sampling — with ``struct`` alone (AVI is RIFF, same chunk grammar as WAV).

The honest boundary: frame PAYLOAD decode (the video codec proper — H.264,
MJPEG…) needs a real codec library this sandbox lacks, so payloads stay
opaque bytes with their crc32 value-checked.  Everything a training
pipeline does at the CONTAINER level — count frames, read dimensions/fps,
sample every Nth frame, ship sampled frames to an image model — is real
compute here, and the sampled-frame rows are exactly what the image stages
(decode_image_pixels / extract_features) consume next.

Spark contract mirrors ops/audio.py: opaque binary content, Arrow-batched
mapInPandas, corrupt blobs keep their row with valid=false; at scale only
sampled frames (1/N of payload bytes) leave the scan stage.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_AVIH = struct.Struct("<14I")  # 56-byte main header
_STRH_PREFIX = struct.Struct("<4s4sIHHIIIIII")


def encode_avi(
    frames: List[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Serialize opaque frame payloads into a minimal standards-shaped AVI:
    RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00dc...))."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    usec = 1_000_000 // fps
    avih = b"avih" + struct.pack("<I", 56) + _AVIH.pack(
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh_body = _STRH_PREFIX.pack(
        b"vids", b"fake", 0, 0, 0, 0, 1, fps, 0, len(frames), 0
    ) + struct.pack("<IiHHHH", 0, -1, 0, 0, width, height)
    strh = b"strh" + struct.pack("<I", len(strh_body)) + strh_body
    strf_body = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        width * height * 3, 0, 0, 0, 0,
    )
    strf = b"strf" + struct.pack("<I", len(strf_body)) + strf_body
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for fr in frames:
        movi_body += b"00dc" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi_body += b"\x00"  # word alignment
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        csize = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        if pos + 8 + csize > end:
            raise ValueError(f"chunk {cid!r} truncated: needs {csize} bytes")
        yield cid, pos + 8, csize
        pos += 8 + csize + (csize & 1)


def decode_avi(blob: bytes) -> Tuple[int, int, int, int, List[bytes]]:
    """Parse an AVI container to (width, height, fps, n_frames, frames).

    Walks the RIFF tree (unknown chunks skipped, sizes validated against
    the actual byte count), reads dimensions/rate from avih, collects
    video frame payloads ('00dc'/'00db') in stream order.  The declared
    dwTotalFrames must equal the frames actually present — a mismatch is
    corruption, not a warning."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI blob")
    riff_size = struct.unpack("<I", blob[4:8])[0]
    if riff_size + 8 > len(blob):
        raise ValueError(f"RIFF size {riff_size} exceeds blob of {len(blob)}")
    avih = None
    frames: List[bytes] = []

    def walk(pos: int, end: int):
        nonlocal avih
        for cid, dpos, csize in _walk_chunks(blob, pos, end):
            if cid == b"LIST":
                walk(dpos + 4, dpos + csize)  # skip the 4-byte list type
            elif cid == b"avih":
                if csize < 56:
                    raise ValueError(f"avih too short: {csize}")
                avih = _AVIH.unpack(blob[dpos : dpos + 56])
            elif cid in (b"00dc", b"00db"):
                frames.append(blob[dpos : dpos + csize])

    walk(12, min(len(blob), riff_size + 8))
    if avih is None:
        raise ValueError("missing avih header")
    usec, total = avih[0], avih[4]
    width, height = avih[8], avih[9]
    if usec <= 0:
        raise ValueError("avih declares zero frame interval")
    if total != len(frames):
        raise ValueError(
            f"avih declares {total} frames, container holds {len(frames)}"
        )
    return width, height, round(1_000_000 / usec), total, frames


def fake_video_blob(media_id: int) -> bytes:
    """Deterministic synthetic AVI: 6-18 frames of modular byte patterns
    (all-integer, bit-identical on any platform), dimensions varying by
    id.  Frame payloads stand in for encoded pictures — the container
    structure is fully real."""
    w, h = 16 + (media_id % 4) * 8, 12 + (media_id % 3) * 8
    n = 6 + (media_id % 5) * 3
    frames = [
        bytes((media_id * 31 + i * 7 + j) % 256 for j in range(w * h // 4))
        for i in range(n)
    ]
    return encode_avi(frames, w, h, fps=5 + (media_id % 3) * 5)


def fake_video_df(spark, n: int = 32) -> DataFrame:
    """Media-schema DataFrame of deterministic AVI blobs; one id per 16 is
    truncated mid-movi so the valid=false path always runs."""
    from .multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        blob = fake_video_blob(i)
        if i % 16 == 9:
            blob = blob[: len(blob) * 2 // 3]
        rows.append((i, "video/avi", bytearray(blob), ("avi", len(blob))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _frame_schema(payloads: bool) -> T.StructType:
    fields = [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_bytes", T.IntegerType(), True),
        T.StructField("frame_crc", T.LongType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
    if payloads:
        fields.insert(8, T.StructField("frame_data", T.BinaryType(), True))
    return T.StructType(fields)


FRAME_SCHEMA = _frame_schema(False)


def sample_video_frames(
    media: DataFrame, every_n: int = 4, payloads: bool = False
) -> DataFrame:
    """REAL frame sampling via mapInPandas: decode the container on the
    workers, keep every ``every_n``-th frame (index 0, n, 2n…), emit one
    row per sampled frame with the payload crc32 value-checking the
    extraction.  Undecodable blobs keep ONE row with valid=false.
    ``payloads=True`` adds the frame bytes themselves (``frame_data``) —
    the fan-out feeding a downstream image stage; default off so the
    metadata-only path ships no payload bytes.  At 100 TB only 1/N of
    payload bytes survive the scan either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    w, h, fps, total, frames = decode_avi(bytes(blob))
                    for i in range(0, total, every_n):
                        row = [mid, w, h, fps, total, i, len(frames[i]),
                               zlib.crc32(frames[i]), True]
                        if payloads:
                            row.insert(8, bytearray(frames[i]))
                        out.append(tuple(row))
                except (ValueError, struct.error):
                    row = [mid, None, None, None, None, None, None, None,
                           False]
                    if payloads:
                        row.insert(8, None)
                    out.append(tuple(row))
            cols = ["media_id", "width", "height", "fps", "n_frames",
                    "frame_idx", "frame_bytes", "frame_crc", "valid"]
            if payloads:
                cols.insert(8, "frame_data")
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(batches, _frame_schema(payloads))
