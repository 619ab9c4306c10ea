"""Mergeable HDR-histogram quantile sketch (ops/sketch.py).

Semantics pinned here; the catalog twin (`lineitem_hdr_quantiles`)
carries the DuckDB differential — including the merge-vs-direct 'ALL'
row that proves mergeability cross-engine.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dagger_spark.ops.sketch import (  # noqa: E402
    hdr_merge,
    hdr_quantiles,
    hdr_sketch,
)


def _df(spark, vals, g="g"):
    return spark.createDataFrame([(g, v) for v in vals], "grp string, v long")


def test_small_values_are_exact(spark):
    # v < 2^(b+1) buckets are width-1: estimates are EXACT order statistics
    vals = list(range(64))
    sk = hdr_sketch(_df(spark, vals), "v", ["grp"], sub_bits=5)
    out = {
        r["q_pct"]: r["est"]
        for r in hdr_quantiles(sk, ["grp"], [50, 90, 99]).collect()
    }
    # rank = ceil(q*64/100) over 0..63 -> value rank-1
    assert out[50] == 31 and out[90] == 57 and out[99] == 63


def test_relative_error_bound(spark):
    # relative error of any estimate <= bucket width / bucket lo = 2^-b
    random.seed(7)
    vals = [random.randint(1, 10**12) for _ in range(5000)]
    sk = hdr_sketch(_df(spark, vals), "v", ["grp"], sub_bits=5)
    svals = sorted(vals)
    for r in hdr_quantiles(sk, ["grp"], [10, 50, 90, 99]).collect():
        rank = -(-r["q_pct"] * len(vals) // 100)  # ceil
        exact = svals[rank - 1]
        assert abs(r["est"] - exact) / exact <= 1 / 32 + 1e-12
        assert r["n_rows"] == len(vals)


def test_merge_equals_direct(spark):
    # sketch(A) ++ sketch(B) merged == sketch(A ++ B): identical frames,
    # hence identical quantiles — the core mergeability property
    random.seed(11)
    a = [random.randint(0, 10**9) for _ in range(2000)]
    b = [random.randint(10**6, 10**12) for _ in range(3000)]
    ska = hdr_sketch(_df(spark, a, "x"), "v", ["grp"])
    skb = hdr_sketch(_df(spark, b, "y"), "v", ["grp"])
    merged = hdr_merge(ska.unionByName(skb), [])
    direct = hdr_merge(hdr_sketch(_df(spark, a + b, "z"), "v", []), [])
    ml = {(r["shift"], r["m"]): r["cnt"] for r in merged.collect()}
    dl = {(r["shift"], r["m"]): r["cnt"] for r in direct.collect()}
    assert ml == dl


def test_bucket_order_is_value_order(spark):
    # (m << shift) is a total order consistent with v: quantiles of a
    # permutation-invariant multiset don't depend on insertion order, and
    # boundary values 63/64 land in adjacent buckets
    sk = hdr_sketch(_df(spark, [63, 64]), "v", ["grp"])
    rows = sorted(
        (r["shift"], r["m"]) for r in sk.collect()
    )
    assert rows == [(0, 63), (1, 32)]  # lo 63 then lo 64 — adjacent


def test_negative_values_excluded(spark):
    sk = hdr_sketch(_df(spark, [-5, 3, 7]), "v", ["grp"])
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 2


def test_quantile_plan_windows_are_partitioned(spark):
    # the cumulative window must partition by the group columns — state is
    # bounded by the sketch frame, and no single-partition window appears
    sk = hdr_sketch(_df(spark, list(range(1000))), "v", ["grp"])
    df = hdr_quantiles(sk, ["grp"], [50])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n", 1)[0]
        assert "partitionBy" not in head or "grp" in head


def test_streaming_windowed_sketch_matches_batch(spark, tmp_path):
    """The sketch aggregate runs under Structured Streaming as-is: group by
    (time window, shift, m) with a watermark.  Closed windows must carry the
    byte-identical sketch frame — and therefore identical percentiles — as
    the batch twin; the final window stays open at availableNow-end (the
    watermark never passes it), so it is excluded."""
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (base + datetime.timedelta(seconds=(i * 7) % 300),
         (i * i * 31) % 100000 + 1)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    src = str(tmp_path / "hdr_src")
    df.write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema).parquet(src)
        .withWatermark("ts", "10 seconds")
        .select(F.window("ts", "1 minute").alias("win"), "v")
    )
    sk_stream = hdr_sketch(stream, "v", ["win"])
    q = (
        sk_stream.writeStream.format("memory")
        .queryName("hdr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["win"]["start"], r["shift"], r["m"], r["cnt"])
        for r in spark.sql("SELECT * FROM hdr_stream").collect()
    )
    closed = {w for w, *_ in got}
    assert len(closed) == 4  # 5 windows of data; the last never closes

    batch_sk = hdr_sketch(
        df.select(F.window("ts", "1 minute").alias("win"), "v"), "v", ["win"]
    )
    want = sorted(
        (r["win"]["start"], r["shift"], r["m"], r["cnt"])
        for r in batch_sk.collect()
        if r["win"]["start"] in closed
    )
    assert got == want

    # identical frames -> identical p99s per closed window
    def _q(sk):
        flat = sk.select(F.col("win.start").alias("w"), "shift", "m", "cnt")
        return sorted(
            map(tuple, hdr_quantiles(flat, ["w"], [99]).collect())
        )

    stream_sk = spark.sql("SELECT * FROM hdr_stream")
    assert _q(stream_sk) == [
        r for r in _q(batch_sk) if r[0] in closed
    ]


# --- KMV distinct sketch -----------------------------------------------


def test_kmv_exact_below_k(spark):
    """With fewer than k distinct values the sketch IS the value set and
    the estimate is the exact distinct count, as a whole double."""
    from dagger_spark.ops.sketch import kmv_estimate, kmv_sketch

    df = spark.createDataFrame(
        [("a", i % 10) for i in range(200)], "g string, v long"
    )
    est = kmv_estimate(kmv_sketch(df, "v", ["g"], k=64), ["g"], k=64)
    row = est.collect()[0]
    assert (row["n_kept"], row["est_distinct"]) == (10, 10.0)


def test_kmv_merge_equals_direct(spark):
    """Merge losslessness — the property the catalog's __ALL__ row rests
    on: k smallest of the union of per-group sketches == the sketch built
    directly over the ungrouped data (hashes AND estimate identical)."""
    from dagger_spark.ops.sketch import kmv_estimate, kmv_merge, kmv_sketch
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i * 37 % 211) for i in range(1000)],
        "g string, v long",
    )
    per = kmv_sketch(df, "v", ["g"], k=16)
    merged = kmv_merge(
        per.withColumn("g", F.lit("ALL")), ["g"], k=16
    )
    direct = kmv_sketch(
        df.withColumn("g", F.lit("ALL")), "v", ["g"], k=16
    )
    assert sorted(r["__h"] for r in merged.collect()) == sorted(
        r["__h"] for r in direct.collect()
    )
    em = kmv_estimate(merged, ["g"], k=16).collect()[0]
    ed = kmv_estimate(direct, ["g"], k=16).collect()[0]
    assert (em["kth_min"], em["est_distinct"]) == (
        ed["kth_min"], ed["est_distinct"]
    )


def test_kmv_estimate_within_bound(spark):
    """k=64 gives ~1/sqrt(k-1) ≈ 13% relative standard error; assert a
    generous 3-sigma band on a 5k-cardinality column so a broken
    estimator (off by 2x) fails while hash luck never does."""
    from dagger_spark.ops.sketch import kmv_estimate, kmv_sketch

    df = spark.createDataFrame(
        [("a", i) for i in range(5000)], "g string, v long"
    )
    row = kmv_estimate(kmv_sketch(df, "v", ["g"], k=64), ["g"], k=64).collect()[0]
    assert row["n_kept"] == 64
    assert 5000 * 0.6 < row["est_distinct"] < 5000 * 1.4


def test_kmv_salt_phase_is_transparent(spark):
    """The salted two-phase top-k must be a pure execution detail: any
    salt_buckets setting yields the identical sketch."""
    from dagger_spark.ops.sketch import kmv_sketch

    df = spark.createDataFrame(
        [("x", i * 13 % 509) for i in range(2000)], "g string, v long"
    )
    a = sorted(r["__h"] for r in kmv_sketch(df, "v", ["g"], k=32,
                                            salt_buckets=1).collect())
    b = sorted(r["__h"] for r in kmv_sketch(df, "v", ["g"], k=32,
                                            salt_buckets=64).collect())
    assert a == b and len(a) == 32


def test_kmv_windows_all_partitioned(spark):
    """Even a roll-up to ONE group (the catalog's __ALL__ merge) must not
    plan a constant-folded unpartitioned window: the pmod spec survives."""
    from dagger_spark.ops.sketch import kmv_merge, kmv_sketch
    from pyspark.sql import functions as F
    import re

    df = spark.createDataFrame(
        [("a", i) for i in range(100)], "g string, v long"
    )
    merged = kmv_merge(
        kmv_sketch(df, "v", ["g"], k=8).withColumn("g", F.lit("ALL")),
        ["g"], k=8,
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert not re.findall(r"windowspecdefinition\([^,()]*? (?:ASC|DESC)", plan)
