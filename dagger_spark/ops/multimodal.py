"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

Codec policy: Pillow is probed at import and used automatically when present
(``DEFAULT_PROBE``/``DEFAULT_RESIZE``); environments without codecs — like
this container — fall back to the deterministic fake-header path: blobs
carry a tiny header (magic, width, height, channels) that
``extract_image_meta`` parses for real, so the Spark-side plumbing (schema,
batch iteration, partition behavior, UDF signatures) is genuine and tested
either way.  A custom codec can also be injected per call (it is captured by
value into the UDF closure, so it reaches the Python workers without being
installed there).  ``strict=True`` raises NotImplementedError ONLY when no
codec is available — exactly where Pillow/libvips would plug in.

Scale notes: blobs ride as parquet binary; metadata predicates (width>=..,
media_type=..) are ordinary columns so pruning/pushdown skip undecodable
rows BEFORE any Python stage; mapInPandas streams Arrow batches so peak
memory is one batch per core, not one partition.
"""

from __future__ import annotations

import io
import struct
from typing import Callable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKEIMG1"

# ---- codec autodetection ---------------------------------------------------
# probe codec: bytes -> (width, height, channels); raises on undecodable
# resize codec: (bytes, width, height) -> re-encoded bytes; raises likewise
# The Pillow-backed codecs are defined UNCONDITIONALLY with the PIL import
# inside: module-level functions pickle by reference, so if they only
# existed when the driver could import Pillow, a task shipped to an
# executor WITHOUT Pillow would fail to unpickle (AttributeError killing
# the stage) instead of degrading per-blob.  With the lazy import the
# reference always resolves, and a codec-less worker raises ImportError
# inside the per-blob try/except -> row flagged invalid, stage survives.
def _pil_probe(blob: bytes) -> Tuple[int, int, int]:
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    return img.width, img.height, len(img.getbands())


def _pil_resize(blob: bytes, width: int, height: int) -> bytes:
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format=fmt)
    return buf.getvalue()


try:  # driver-side availability probe (drives the strict=True decision)
    from PIL import Image as _PILImage  # noqa: F401

    DEFAULT_PROBE: Optional[Callable] = _pil_probe
    DEFAULT_RESIZE: Optional[Callable] = _pil_resize
except ImportError:
    DEFAULT_PROBE = None
    DEFAULT_RESIZE = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def pack_fake_image(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake image blob: header + pseudo-pixels derived from id."""
    header = MAGIC + struct.pack("<III", width, height, channels)
    body = bytes((media_id * 31 + i) % 251 for i in range(64))
    return header + body


def fake_media_df(spark, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        w, h = 64 + (i % 8) * 32, 64 + (i % 5) * 48
        blob = pack_fake_image(i, w, h)
        rows.append((i, "image/fake", bytearray(blob), (f"src{i % 4}", len(blob))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_image_meta(media: DataFrame, codec: Optional[Callable] = None) -> DataFrame:
    """Parse image dimensions per blob via mapInPandas: the deterministic
    fake header is recognized first (fixtures), then ``codec`` (default:
    Pillow when installed) probes real formats; undecodable blobs are
    flagged instead of failing the task (ignore-parse-errors discipline,
    same as the JSON source).
    """
    codec = codec if codec is not None else DEFAULT_PROBE

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is not None and bytes(blob[:8]) == MAGIC and len(blob) >= 20:
                    w, h, c = struct.unpack("<III", bytes(blob[8:20]))
                    out.append((mid, w, h, c, True))
                elif codec is not None and blob is not None:
                    try:
                        w, h, c = codec(bytes(blob))
                        out.append((mid, w, h, c, True))
                    except Exception:
                        out.append((mid, None, None, None, False))
                else:
                    out.append((mid, None, None, None, False))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "channels", "valid"])

    return media.mapInPandas(parse_batches, IMAGE_META_SCHEMA)


def decode_image(
    media: DataFrame, strict: bool = False, codec: Optional[Callable] = None
) -> DataFrame:
    """Pixel decode — backed by ``codec`` (default: Pillow when installed).

    strict=True raises NotImplementedError ONLY when no codec is available
    (neither Pillow nor an injected one); strict=False additionally degrades
    to header metadata extraction in codec-less environments so pipelines
    remain runnable end-to-end.
    """
    codec = codec if codec is not None else DEFAULT_PROBE
    if strict and codec is None:
        raise NotImplementedError(
            "pixel decode requires an image codec (Pillow/libvips); none is "
            "installed and none was injected — pass codec= or pip install "
            "Pillow where workers can import it"
        )
    return extract_image_meta(media, codec=codec)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector per blob via mapInPandas — REAL feature
    extraction (no codec needed): the normalized histogram of payload bytes
    is the classic cheap content signature.  A production pipeline swaps the
    histogram for a CLIP/audio embedding inside the same batch loop; the
    Spark contract (Arrow batches in, array<double> out, invalid rows kept
    with valid=false) is unchanged."""

    def feat_batches(batches):
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None or len(blob) <= 20 or bytes(blob[:8]) != MAGIC:
                    out.append((mid, None, False))
                    continue
                body = bytes(blob[20:])
                hist = [0] * bins
                for byte in body:
                    hist[byte * bins // 256] += 1
                n = float(len(body))
                out.append((mid, [h / n for h in hist], True))
            yield pd.DataFrame(out, columns=["media_id", "features", "valid"])

    return media.mapInPandas(feat_batches, FEATURE_SCHEMA)


def resize_image(
    media: DataFrame,
    width: int,
    height: int,
    strict: bool = False,
    codec: Optional[Callable] = None,
) -> DataFrame:
    """Resize stage — real-format blobs go through ``codec`` (default:
    Pillow when installed, signature ``(blob, w, h) -> bytes``); fake-header
    fixture blobs get the TARGET dimensions stamped into their header (they
    have no real pixels).  strict=True raises NotImplementedError ONLY when
    no codec is available; strict=False keeps the pipeline shape (binary in
    -> binary out, same partitioning) runnable in codec-less environments
    by degrading real-format blobs to None (undecodable)."""
    codec = codec if codec is not None else DEFAULT_RESIZE
    if strict and codec is None:
        raise NotImplementedError(
            "pixel resize requires an image codec (Pillow/libvips); none is "
            "installed and none was injected — pass codec= or pip install "
            "Pillow where workers can import it"
        )

    def resize_one(blob):
        if blob is None:
            return None
        if bytes(blob[:8]) == MAGIC:
            return (
                bytes(blob[:8])
                + struct.pack("<III", width, height, 3)
                + bytes(blob[20:])
            )
        if codec is not None:
            try:
                return codec(bytes(blob), width, height)
            except Exception:
                return None
        return None

    def resize_batches(batches):
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [resize_one(blob) for blob in out["content"]]
            yield out

    return media.mapInPandas(resize_batches, media.schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLUMBING: expands each blob into frame-index rows
    (decode stubbed).  Demonstrates the explode-then-process shape that keeps
    per-frame work distributed instead of per-video."""
    frames = media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx"),
    )
    return frames.withColumn("sampled", (F.col("frame_idx") % every_n) == 0)
