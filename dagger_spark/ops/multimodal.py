"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed: blobs
carry a tiny deterministic fake header (magic, width, height, channels) that
``extract_image_meta`` parses for real — the Spark-side plumbing (schema,
batch iteration, partition behavior, UDF signatures) is genuine and tested.
``decode_image(strict=True)`` raises NotImplementedError exactly where a real
codec (Pillow/ffmpeg) would plug in.

Scale notes: blobs ride as parquet binary; metadata predicates (width>=..,
media_type=..) are ordinary columns so pruning/pushdown skip undecodable
rows BEFORE any Python stage; mapInPandas streams Arrow batches so peak
memory is one batch per core, not one partition.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKEIMG1"

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


def extract_image_meta(media: DataFrame) -> DataFrame:
    """Parse the (fake) image header per blob via mapInPandas.

    Real shape of a production decode stage: Arrow batches in, schema'd
    batches out, malformed blobs flagged instead of failing the task
    (ignore-parse-errors discipline, same as the JSON source).
    """

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is not None and bytes(blob[:8]) == MAGIC and len(blob) >= 20:
                    w, h, c = struct.unpack("<III", bytes(blob[8:20]))
                    out.append((mid, w, h, c, True))
                else:
                    out.append((mid, None, None, None, False))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "channels", "valid"])

    return media.mapInPandas(parse_batches, IMAGE_META_SCHEMA)


def decode_image(media: DataFrame, strict: bool = False) -> DataFrame:
    """Pixel decode — the step a real deployment backs with Pillow/libvips.

    strict=True raises NotImplementedError (no codec in this environment);
    strict=False degrades to header metadata extraction so pipelines remain
    runnable end-to-end.
    """
    if strict:
        raise NotImplementedError(
            "pixel decode requires an image codec (Pillow/libvips); "
            "not available in this environment — wire it into "
            "extract_image_meta's mapInPandas stage"
        )
    return extract_image_meta(media)


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


def resize_image(media: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Resize stage — stubbed like ``decode_image`` (needs Pillow/libvips).

    strict=True raises where the codec would plug in; strict=False passes
    blobs through with the TARGET dimensions stamped into new header bytes,
    keeping the pipeline shape (binary in -> binary out, same partitioning)
    runnable and testable."""
    if strict:
        raise NotImplementedError(
            "pixel resize requires an image codec (Pillow/libvips); wire it "
            "into the mapInPandas stage below"
        )

    def resize_batches(batches):
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                None
                if blob is None or bytes(blob[:8]) != MAGIC
                else bytes(blob[:8]) + struct.pack("<III", width, height, 3) + bytes(blob[20:])
                for blob in out["content"]
            ]
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
