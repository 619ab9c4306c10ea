"""Streaming PSI drift monitor (streaming/drift.py): hand-computed PSI
values, closed-form absent-bucket folding, batch == stream over a
file-replay, and the one-watermark-node plan shape."""

import datetime as dt
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from dagger_spark.streaming.drift import bucket_of, psi_drift_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = "ts timestamp, v double"
CUTS = [10.0, 20.0]              # 3 buckets: <10, [10,20), >=20
REFS = [4, 4, 4]                 # uniform reference


def _psi(counts, refs=REFS):
    k = len(refs)
    n = sum(counts)
    r = sum(refs)
    total = 0.0
    for c, rr in zip(counts, refs):
        p = (c + 0.5) / (n + 0.5 * k)
        q = (rr + 0.5) / (r + 0.5 * k)
        total += (p - q) * math.log(p / q)
    return float(
        Decimal(repr(total + 1e-9)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
    )


def _rows():
    # window 1 (hour 0): uniform 2/2/2 -> PSI ~ 0 ('stable')
    rows = [(T0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate([5.0, 7.0, 12.0, 15.0, 25.0, 30.0])]
    # window 2 (hour 1): everything in the top bucket, bucket 0/1 ABSENT
    # -> exercises the closed-form zero-count fold
    rows += [(T0 + dt.timedelta(hours=1, minutes=i), 50.0 + i)
             for i in range(6)]
    return rows


def test_bucket_of_boundaries(spark):
    df = spark.createDataFrame(
        [(T0, v) for v in [0.0, 9.9, 10.0, 19.9, 20.0, 100.0]], SCHEMA
    ).select(bucket_of(F.col("v"), CUTS).alias("b"))
    assert [r["b"] for r in df.collect()] == [0, 0, 1, 1, 2, 2]


def test_psi_values_and_absent_bucket_fold(spark):
    out = {
        r["window_start"]: (r["n"], r["psi"], r["verdict"])
        for r in psi_drift_stream(
            spark.createDataFrame(_rows(), SCHEMA),
            "v", CUTS, REFS, ts_col="ts", window="1 hour",
        ).collect()
    }
    assert out == {
        T0: (6, _psi([2, 2, 2]), "stable"),
        T0 + dt.timedelta(hours=1): (6, _psi([0, 0, 6]), "shifted"),
    }
    # sanity on the hand formula itself: uniform == tiny, shifted == big
    assert _psi([2, 2, 2]) < 0.01 < 0.25 < _psi([0, 0, 6])


def test_ref_counts_length_validated(spark):
    with pytest.raises(ValueError, match="ref_counts must have 3"):
        psi_drift_stream(
            spark.createDataFrame(_rows(), SCHEMA), "v", CUTS, [1, 2]
        )


def test_psi_stream_equals_batch(spark, tmp_path):
    """File-replayed stream (2 micro-batches + far-future sentinel closing
    the last window) emits exactly the batch result."""
    import glob
    import os
    import time

    rows = _rows()
    batch = {tuple(r) for r in psi_drift_stream(
        spark.createDataFrame(rows, SCHEMA), "v", CUTS, REFS,
        ts_col="ts", window="1 hour",
    ).collect()}

    src = str(tmp_path / "drift_src")
    os.makedirs(src)
    sentinel = [(T0 + dt.timedelta(days=30), 1.0)]
    spark.createDataFrame(rows[:6], SCHEMA).coalesce(1).write.parquet(
        src + "/f0")
    spark.createDataFrame(rows[6:] + sentinel, SCHEMA).coalesce(1) \
        .write.parquet(src + "/f1")
    files = sorted(glob.glob(src + "/f*/part-*.parquet"))
    now = time.time() - 60
    for i, f in enumerate(files):
        os.utime(f, (now + 10 * i, now + 10 * i))
    stream = spark.readStream.schema("ts timestamp, v double").option(
        "maxFilesPerTrigger", 1).parquet(src + "/f*")

    sdf = psi_drift_stream(stream, "v", CUTS, REFS, ts_col="ts",
                           window="1 hour", watermark="0 seconds")
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert sum("EventTimeWatermark" in ln for ln in plan.splitlines()) == 1

    q = (
        sdf.writeStream.format("memory").queryName("psi_drift")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in
               spark.sql("SELECT * FROM psi_drift").collect()
               if r["window_start"] < T0 + dt.timedelta(days=1)}
    finally:
        q.stop()
    assert got == batch and len(batch) == 2


# ---------------------------------------------------------- HDR quantiles

def _hdr_rows():
    import random

    rng = random.Random(5)
    rows = []
    for i in range(200):            # window 1: broad magnitudes
        rows.append((T0 + dt.timedelta(seconds=i), float(rng.randint(0, 10_000))))
    for i in range(150):            # window 2: shifted up
        rows.append((T0 + dt.timedelta(hours=1, seconds=i),
                     float(rng.randint(50_000, 90_000))))
    return rows


def test_hdr_quantiles_stream_matches_batch_extractor(spark):
    """The projection-based extraction (array_sort + aggregate walk) must
    equal ops/sketch.hdr_quantiles' window-function extraction on the
    same sketch — two formulations, one answer."""
    from dagger_spark.ops.sketch import hdr_quantiles, hdr_sketch
    from dagger_spark.streaming.drift import hdr_quantiles_stream

    df = spark.createDataFrame(_hdr_rows(), SCHEMA)
    got = {
        (r["window_start"], r["q_pct"]): (r["n_rows"], r["est"])
        for r in hdr_quantiles_stream(
            df, "v", ts_col="ts", window="1 hour", q_pcts=(50, 95)
        ).collect()
    }
    base = df.select(
        F.window("ts", "1 hour")["start"].alias("w"),
        F.col("v").cast("long").alias("cents"),
    )
    ref = {
        (r["w"], r["q_pct"]): (r["n_rows"], r["est"])
        for r in hdr_quantiles(
            hdr_sketch(base, "cents", ["w"]), ["w"], [50, 95]
        ).collect()
    }
    assert got == ref and len(got) == 4


def test_hdr_quantiles_stream_equals_batch(spark, tmp_path):
    import glob
    import os
    import time

    from dagger_spark.streaming.drift import hdr_quantiles_stream

    rows = _hdr_rows()
    batch = {tuple(r) for r in hdr_quantiles_stream(
        spark.createDataFrame(rows, SCHEMA), "v",
        ts_col="ts", window="1 hour",
    ).collect()}

    src = str(tmp_path / "hdr_src")
    os.makedirs(src)
    sentinel = [(T0 + dt.timedelta(days=30), 1.0)]
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], SCHEMA).coalesce(1).write.parquet(
        src + "/f0")
    spark.createDataFrame(rows[half:] + sentinel, SCHEMA).coalesce(1) \
        .write.parquet(src + "/f1")
    files = sorted(glob.glob(src + "/f*/part-*.parquet"))
    now = time.time() - 60
    for i, f in enumerate(files):
        os.utime(f, (now + 10 * i, now + 10 * i))
    stream = spark.readStream.schema("ts timestamp, v double").option(
        "maxFilesPerTrigger", 1).parquet(src + "/f*")
    q = (
        hdr_quantiles_stream(stream, "v", ts_col="ts", window="1 hour",
                             watermark="0 seconds")
        .writeStream.format("memory").queryName("hdr_q")
        .option("checkpointLocation", str(tmp_path / "hdr_ck"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM hdr_q").collect()
               if r["window_start"] < T0 + dt.timedelta(days=1)}
    finally:
        q.stop()
    assert got == batch and len(batch) == 4
