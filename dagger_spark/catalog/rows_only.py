"""rows-only entries (fixture-driven rule engine, multimodal Pandas-UDF plumbing).

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403

# ===========================================================================
# rows-only entries (non-SQL-expressible: fixture-driven rule engine,
# multimodal Pandas-UDF plumbing) — driver records a weaker rows-only check
# ===========================================================================


@register(
    "sysmon_rules_alerts",
    None,
    "the 25 reference detection rules over generated sysmon fixtures "
    "(single-pass engine); fixture table is not part of the driver's views, "
    "so no SQL oracle — covered by the per-rule DuckDB oracle in tests/",
)
def sysmon_rules_alerts(spark, sf_dir):
    from ..fixtures import generate_sysmon_rows
    from ..rules.builtin import active_rules
    from ..rules.engine import apply_rules_single_pass
    from ..schemas import SYSMON_EVENT_SCHEMA

    rows = generate_sysmon_rows(2000, seed=42)
    events = spark.createDataFrame(
        [
            (
                r["computer_name"], r["event_id"], r["host"],
                tuple(r["event_data"].values()) if r["event_data"] else None,
                r["uuid"], r["timestamp"],
            )
            for r in rows
        ],
        SYSMON_EVENT_SCHEMA,
    )
    alerts = apply_rules_single_pass(events, active_rules())
    return alerts.select(
        F.col("rule.name").alias("rule_name"),
        F.col("event.origin_ids")[0].alias("uuid"),
        F.col("rule.severity").alias("severity"),
    )


@register(
    "sysmon_rules_correlated",
    None,
    "Sigma-v2-style temporal CORRELATION (the meta-rule surface the "
    "reference lacks entirely): entity matches 'Direct Syscall of "
    "NtOpenProcess' then 'CMSTP Execution Process Access' within 30 min "
    "— filtered alert streams, time-bucketed equi-join (never a "
    "cartesian), streaming twin is a watermarked stream-stream join "
    "(batch==stream pinned in tests/test_correlate.py along with a "
    "DuckDB differential oracle over the fixture; fixture table is not "
    "in the driver's views, so rows-only here)",
)
def sysmon_rules_correlated(spark, sf_dir):
    from ..fixtures import write_sysmon_parquet
    from ..rules.builtin import active_rules
    from ..rules.correlate import correlate_alerts

    path = write_sysmon_parquet("/tmp/dagger_corr_sysmon_2000.parquet")
    events = spark.read.parquet(path)
    rules = sorted(active_rules(), key=lambda r: r.name)
    ra = next(r for r in rules if r.name == "Direct Syscall of NtOpenProcess")
    rb = next(r for r in rules if r.name == "CMSTP Execution Process Access")
    return correlate_alerts(events, ra, rb, window_s=1800)


def _media_src_fingerprint() -> str:
    """8-hex digest over the source of every module that synthesizes
    media blobs; cached per process."""
    global _MEDIA_SRC_FP
    if _MEDIA_SRC_FP is None:
        import hashlib
        import os

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in (
            "ops/multimodal.py",
            "ops/audio.py",
            "ops/video.py",
            "fixtures.py",
        ):
            with open(os.path.join(here, rel), "rb") as f:
                h.update(f.read())
        _MEDIA_SRC_FP = h.hexdigest()[:8]
    return _MEDIA_SRC_FP


_MEDIA_SRC_FP = None


def _media_fixture(spark, key: str, n_rows: int, build_df):
    """Materialize a deterministic media fixture ONCE per machine as
    parquet and read it back.  The media queries must time decode work
    against STORED blobs — the production shape: media arrives as binary
    columns in parquet files, not driver-side synthesis — and BENCH_r06's
    media numbers overstated query cost ~4x precisely because per-run
    fixture synthesis (encode_png/encode_avi loops + createDataFrame)
    was folded into every timed run.  Idempotent: an existing fixture is
    reused only when its row count matches (a stale or foreign file at
    the well-known path is rewritten, same discipline as
    write_zipf_docs_parquet); the write is atomic via directory rename.
    The path embeds a fingerprint of the synthesis modules' SOURCE
    (ops/multimodal|audio|video + fixtures), so editing blob contents or
    encode parameters invalidates already-materialized fixtures
    automatically — a bare row-count check would silently keep stale
    blobs on machines that materialized under the old code."""
    import os
    import shutil

    path = f"/tmp/dagger_media_{key}_{_media_src_fingerprint()}.parquet"
    ok = False
    if os.path.isdir(path):
        try:
            ok = spark.read.parquet(path).count() == n_rows
        except Exception:
            ok = False
    if not ok:
        tmp = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_df().coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return spark.read.parquet(path)


@register(
    "multimodal_meta",
    None,
    "multimodal binary columns: fake image blobs -> mapInPandas header "
    "parse (decode stub) -> metadata filter; Pandas-UDF plumbing is real",
)
def multimodal_meta(spark, sf_dir):
    from ..ops.multimodal import extract_image_meta, fake_media_df

    media = _media_fixture(
        spark, "image64", 64, lambda: fake_media_df(spark, 64)
    )
    meta = extract_image_meta(media)
    return meta.filter(F.col("valid")).select("media_id", "width", "height", "channels")


@register(
    "multimodal_features",
    None,
    "multimodal feature extraction: byte-histogram embedding per blob via "
    "mapInPandas (the stage a real pipeline backs with CLIP/audio models)",
)
def multimodal_features(spark, sf_dir):
    from ..ops.multimodal import extract_features, fake_media_df

    media = _media_fixture(
        spark, "image64", 64, lambda: fake_media_df(spark, 64)
    )
    feats = extract_features(media, bins=16)
    return feats.filter(F.col("valid")).select(
        "media_id", F.round(F.element_at("features", 1), 6).alias("f0"),
        F.size("features").alias("dim"),
    )


@register(
    "multimodal_pixels",
    None,  # a pixel decoder has no SQL twin; rows-only (deterministic crc)
    "REAL pixel decode with zero installed codecs: deterministic PNGs "
    "(encode_png, stdlib zlib+struct) stream through mapInPandas and "
    "decode_image_pixels inflates + defilters them back to raw pixel "
    "buffers on the workers — Pillow used instead when present, identical "
    "schema.  Output pins width/height/channels and a crc32 of the pixel "
    "bytes so the decode is value-checked, not just shape-checked",
)
def multimodal_pixels(spark, sf_dir):
    from ..ops.multimodal import MEDIA_SCHEMA, decode_image_pixels, encode_png

    def build():
        rows = []
        for i in range(32):
            w, h = 8 + i % 5, 6 + i % 3
            px = bytes((i * 37 + j) % 256 for j in range(w * h * 3))
            blob = encode_png(w, h, 3, px, filter_type=i % 5)
            rows.append((i, "image/png", bytearray(blob), ("png", len(blob))))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    df = _media_fixture(spark, "png32", 32, build)
    return decode_image_pixels(df).select(
        "media_id", "width", "height", "channels",
        F.crc32(F.col("pixels")).alias("pixel_crc"), "valid",
    )


@register(
    "multimodal_audio",
    None,  # an audio decoder has no SQL twin; rows-only (deterministic crc)
    "REAL audio decode with zero installed audio libraries: deterministic "
    "PCM16 WAV blobs (all-integer triangle-wave synthesis, one corrupted "
    "per 16) stream through mapInPandas where the stdlib RIFF parser "
    "(ops/audio.py) decodes samples on the workers and emits gate "
    "features — duration, RMS, peak, zero-crossing count — plus a crc32 "
    "of the raw sample bytes so the decode is value-checked; truncated "
    "blobs keep their row with valid=false.  The audio twin of "
    "multimodal_pixels: blobs never leave the executors, only fixed-width "
    "feature rows shuffle",
)
def multimodal_audio(spark, sf_dir):
    from ..ops.audio import extract_audio_features, fake_audio_df

    audio = _media_fixture(
        spark, "audio48", 48, lambda: fake_audio_df(spark, 48)
    )
    return extract_audio_features(audio)


@register(
    "multimodal_frames",
    None,  # container parsing has no SQL twin; rows-only (crc value-check)
    "REAL video-container frame sampling with zero installed libraries: "
    "deterministic AVI blobs (stdlib RIFF writer, one truncated per 16) "
    "parse on the workers — chunk walk, avih header, declared-vs-actual "
    "frame-count integrity — and every 4th frame emits a row with its "
    "payload crc32.  The honest boundary is documented: frame PAYLOAD "
    "decode needs a codec library, so payloads stay opaque; the sampled "
    "rows are exactly what decode_image_pixels consumes next.  At scale "
    "only 1/N of payload bytes survive the scan",
)
def multimodal_frames(spark, sf_dir):
    from ..ops.video import fake_video_df, sample_video_frames

    video = _media_fixture(
        spark, "avi32", 32, lambda: fake_video_df(spark, 32)
    )
    return sample_video_frames(video, every_n=4)


@register(
    "multimodal_video_pixels",
    None,  # two-codec composition; rows-only (pixel crc value-check)
    "the FULL multimodal chain as one DAG: AVI containers whose frames "
    "are real PNGs stream through sample_video_frames (stdlib RIFF "
    "parse, every 2nd frame) into decode_image_pixels (stdlib PNG "
    "inflate+defilter) — container -> frame -> pixels, all real compute "
    "with zero installed libraries, pixel crc32 value-checking the whole "
    "chain.  The production shape: video fans out to sampled frames "
    "which feed the image tower; each stage is the already-tested "
    "operator, composed",
)
def multimodal_video_pixels(spark, sf_dir):
    from ..ops.multimodal import MEDIA_SCHEMA, decode_image_pixels, encode_png
    from ..ops.video import encode_avi, sample_video_frames

    def build():
        rows = []
        for i in range(12):
            w, h = 6 + i % 3, 4 + i % 2
            frames = [
                encode_png(
                    w, h, 3,
                    bytes(
                        (i * 37 + f * 11 + j) % 256
                        for j in range(w * h * 3)
                    ),
                    filter_type=(i + f) % 5,
                )
                for f in range(4 + i % 3)
            ]
            blob = encode_avi(frames, w, h, fps=10)
            rows.append((i, "video/avi", bytearray(blob), ("avi", len(blob))))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    media = _media_fixture(spark, "avipng12", 12, build)
    sampled = sample_video_frames(media, every_n=2, payloads=True).filter(
        F.col("valid")
    )
    frames_media = sampled.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image/png").alias("media_type"),
        F.col("frame_data").alias("content"),
        F.struct(
            F.lit("frame").alias("source"),
            F.col("frame_bytes").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    px = decode_image_pixels(frames_media)
    return px.select(
        "media_id", "width", "height", "channels",
        F.crc32(F.col("pixels")).alias("pixel_crc"), "valid",
    )


@register(
    "skew_resistant_agg",
    """
    SELECT event_type,
           round(sum(value), 4) AS total_value,
           count(*) AS n_events,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    """,
    "salted two-phase aggregation (ops/skew.py): results are salt-invariant, "
    "so the oracle is the plain GROUP BY it must equal",
)
def skew_resistant_agg(spark, sf_dir):
    from ..ops.skew import two_phase_agg

    ev = load_table(spark, sf_dir, "events")
    out = two_phase_agg(
        ev, ["event_type"],
        # n_events counts ROWS ("*"), not non-null values — count(value)
        # silently diverges from the count(*) oracle once NULLs appear
        # (caught by the fuzzed NULL-value events)
        {"total_value": ("value", "sum"), "n_events": ("*", "count"),
         "min_value": ("value", "min"), "max_value": ("value", "max")},
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.round("total_value", 4).alias("total_value"),
        F.col("n_events"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


