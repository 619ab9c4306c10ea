"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

Codec policy (a chain, never empty): Pillow when importable on the worker
(every format), else the PURE-STDLIB PNG codec (``decode_png``/
``encode_png`` — zlib inflate + CRC-checked chunks + scanline defiltering),
else the deterministic fake-header path for fixture blobs.  Real pixel
decode therefore works even in this codec-less container for PNG;
non-PNG formats without Pillow degrade per-blob to valid=false rather than
failing the stage.  A custom codec can also be injected per call (captured
by value into the UDF closure, so it reaches Python workers without being
installed there).  ``strict=True``'s NotImplementedError is now reachable
only when a caller explicitly disables codecs.

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
    if img.mode == "P":
        # palette images expand to RGB so Pillow and the stdlib PNG
        # decoder agree on channels/pixels (environment-independent output)
        img = img.convert("RGB")
    return img.width, img.height, len(img.getbands())


def _pil_resize(blob: bytes, width: int, height: int) -> bytes:
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format=fmt)
    return buf.getvalue()


# ---- pure-stdlib PNG codec -------------------------------------------------
# PNG is decodable with zlib+struct alone (signature, CRC-checked chunks,
# inflate, per-scanline defilter), so a codec-less environment still gets
# REAL pixels for the web's most common lossless format.  Supports 8-bit
# gray/RGB/palette/gray-alpha/RGBA, non-interlaced — the overwhelmingly
# common shape; anything else raises and the caller's per-blob try/except
# flags the row.  Pillow, when installed, still takes precedence (JPEG,
# WebP, 16-bit, interlaced, ...).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def decode_png(blob: bytes) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, raw pixel bytes) from a PNG blob.

    Full pixel decode: CRC-verified chunk walk, one zlib inflate, scanline
    defiltering (None/Sub/Up/Average/Paeth), palette expansion to RGB.
    """
    import zlib

    if bytes(blob[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = []
    pos = 8
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = bytes(blob[pos + 4:pos + 8])
        data = bytes(blob[pos + 8:pos + 8 + ln])
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or inter != 0:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, interlace={inter})"
        )
    nch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 255
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 255
        elif f != 0:
            raise ValueError(f"bad scanline filter {f}")
        out += line
        prev = line
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        rgb = bytearray()
        for idx in out:
            rgb += plte[3 * idx:3 * idx + 3]
        out, nch = rgb, 3
    return w, h, nch, bytes(out)


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """Minimal PNG writer (8-bit gray/gray-alpha/RGB/RGBA).  ``filter_type``
    applies one filter to every scanline — exercising each inverse path of
    :func:`decode_png` in roundtrip tests."""
    import zlib

    if channels not in _PNG_CTYPE:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer length mismatch")
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride:(y + 1) * stride])
        flt = bytearray(stride)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            elif filter_type == 4:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad filter_type {filter_type}")
            flt[i] = (line[i] - pred) & 255
        raw.append(filter_type)
        raw += flt
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _PNG_CTYPE[channels], 0, 0, 0
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_probe(blob: bytes) -> Tuple[int, int, int]:
    w, h, c, _ = decode_png(blob)
    return w, h, c


def _png_resize(blob: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample + filter-0 re-encode, stdlib only."""
    w, h, c, px = decode_png(blob)
    out = bytearray()
    for y in range(height):
        sy = y * h // height
        row = px[sy * w * c:(sy + 1) * w * c]
        for x in range(width):
            sx = x * w // width
            out += row[sx * c:(sx + 1) * c]
    return encode_png(width, height, c, bytes(out))


def _chain_probe(blob: bytes) -> Tuple[int, int, int]:
    """Pillow first (every format), stdlib PNG decode as the fallback."""
    try:
        return _pil_probe(blob)
    except ImportError:
        return _png_probe(blob)


def _chain_resize(blob: bytes, width: int, height: int) -> bytes:
    try:
        return _pil_resize(blob, width, height)
    except ImportError:
        return _png_resize(blob, width, height)


# The chained codecs are ALWAYS available (stdlib PNG needs nothing), so
# strict=True never refuses PNG work in a codec-less environment; non-PNG
# formats without Pillow still fail per-blob -> valid=false.  DEFAULT_*
# stays non-None either way; HAVE_PIL records the driver-side probe for
# introspection/tests.
try:  # driver-side availability probe
    from PIL import Image as _PILImage  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

DEFAULT_PROBE: Optional[Callable] = _chain_probe
DEFAULT_RESIZE: Optional[Callable] = _chain_resize

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

    strict semantics since the stdlib PNG codec joined the default chain:
    strict=True no longer fail-fasts a codec-less environment (PNG always
    decodes; that is the round-3 contract change) — NON-PNG blobs without
    Pillow degrade per-blob to valid=false rather than raising.  Callers
    that require Pillow for a JPEG/WebP corpus should check
    ``multimodal.HAVE_PIL`` (driver-side) explicitly; the
    NotImplementedError below remains only for explicitly-disabled codecs.
    """
    codec = codec if codec is not None else DEFAULT_PROBE
    if strict and codec is None:
        # unreachable with the default chain (stdlib PNG is always
        # importable); kept for callers that explicitly disable codecs
        raise NotImplementedError(
            "pixel decode requires an image codec (Pillow/libvips); none is "
            "installed and none was injected — pass codec= or pip install "
            "Pillow where workers can import it"
        )
    return extract_image_meta(media, codec=codec)


PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def decode_image_pixels(media: DataFrame) -> DataFrame:
    """REAL pixel decode to raw bytes via mapInPandas: Pillow when the
    worker has it, else the stdlib PNG decoder (:func:`decode_png`) — so
    this yields actual pixel buffers even in a codec-less environment.
    Undecodable/non-PNG-without-Pillow blobs keep their row with
    valid=false (same ignore-parse-errors discipline as the meta path)."""

    def px_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # probe Pillow ONCE per task, not per row: a failed import is not
        # cached by Python, so a per-blob try/import would re-run the
        # module finder for every row of a codec-less worker
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    out.append((mid, None, None, None, None, False))
                    continue
                try:
                    if have_pil:
                        from PIL import Image

                        img = Image.open(io.BytesIO(bytes(blob)))
                        if img.mode == "P":
                            # match the stdlib decoder's palette expansion
                            img = img.convert("RGB")
                        w, h, c = img.width, img.height, len(img.getbands())
                        px = img.tobytes()
                    else:
                        w, h, c, px = decode_png(bytes(blob))
                    out.append((mid, w, h, c, bytearray(px), True))
                except Exception:
                    out.append((mid, None, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "channels", "pixels", "valid",
                ],
            )

    return media.mapInPandas(px_batches, PIXEL_SCHEMA)


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


# --------------------------------------------------------------------------
# Perceptual hashing: the bridge from the multimodal family to the dedup
# family — near-duplicate IMAGES found the same way near-duplicate text is
# (integer signatures, banded buckets, bit_count verify).
# --------------------------------------------------------------------------

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def phash_from_pixels(pixels: DataFrame, hash_size: int = 8) -> DataFrame:
    """64-bit perceptual average-hash from decoded pixel buffers
    (PIXEL_SCHEMA rows, i.e. the output of :func:`decode_image_pixels`) —
    composable with either decode backend, like the video->image chain.

    Per image: integer luma (299r + 587g + 114b) // 1000 at an 8x8
    nearest-neighbor sample grid (reads exactly 64 pixels regardless of
    image size), then mean-threshold each sample with the integer
    cross-multiplication ``luma * 64 > total`` — no float ever enters, so
    the hash is bit-reproducible everywhere.  A near-duplicate image
    (small edits, re-encode) flips few samples past the corpus-relative
    mean, so Hamming distance stays small; unrelated images land ~32 bits
    apart.
    """
    n = hash_size * hash_size

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, w, h, c, px, valid in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["channels"], pdf["pixels"], pdf["valid"],
            ):
                if not valid or px is None or not w or not h:
                    out.append((mid, None, False))
                    continue
                buf = bytes(px)
                lumas = []
                for gy in range(hash_size):
                    sy = gy * h // hash_size
                    for gx in range(hash_size):
                        sx = gx * w // hash_size
                        o = (sy * w + sx) * c
                        if c >= 3:
                            lum = (299 * buf[o] + 587 * buf[o + 1]
                                   + 114 * buf[o + 2]) // 1000
                        else:
                            lum = buf[o]
                        lumas.append(lum)
                total = sum(lumas)
                bits = 0
                for i, lum in enumerate(lumas):
                    if lum * n > total:
                        bits |= 1 << i
                # two's-complement into a signed 64-bit long
                if bits >= 1 << 63:
                    bits -= 1 << 64
                out.append((mid, bits, True))
            yield pd.DataFrame(out, columns=["media_id", "phash", "valid"])

    return pixels.mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_neardup(
    hashes: DataFrame, max_dist: int = 6, bands: int = 8
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join over 64-bit
    perceptual hashes — the simhash recipe applied to pixels: split each
    hash into ``bands`` equal bit-bands; by pigeonhole, two hashes within
    ``max_dist < bands`` differing bits share at least one identical
    band, so the self-join on (band index, band value) is a lossless
    candidate generator; ``bit_count(xor)`` verifies exactly.  Returns
    (id_a, id_b, hamming) with id_a < id_b, distinct.
    """
    if max_dist >= bands:
        raise ValueError(
            f"pigeonhole soundness needs max_dist < bands "
            f"(got {max_dist} >= {bands})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.filter(F.col("valid")).select("media_id", "phash")
    banded = h.select(
        "media_id", "phash",
        F.explode(F.lit(list(range(bands)))).alias("b"),
    ).select(
        "media_id", "phash", "b",
        # shiftrightunsigned() takes a literal count in the Python API —
        # the per-row band shift needs the SQL form
        F.expr(
            f"shiftrightunsigned(phash, CAST(b AS INT) * {width}) "
            f"& CAST({mask} AS BIGINT)"
        ).alias("bv"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
             .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )
    return pairs
