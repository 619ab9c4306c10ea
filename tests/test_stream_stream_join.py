"""Stream-stream interval join: watermarked on both sides, state bounded by
the event-time range condition, results equal the batch interval join."""

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.asof import interval_join
from dagger_spark.sources.files import load_table


@pytest.fixture(scope="module")
def split_events(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("ssj")
    # Watermarks require TIMESTAMP (LTZ); the testdata parquet reads as
    # TIMESTAMP_NTZ, so cast before writing the split tables.
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", F.col("ts").alias("p_ts")
    )
    errors.write.parquet(str(base / "errors"))
    purchases.write.parquet(str(base / "purchases"))
    return str(base / "errors"), str(base / "purchases"), errors.schema, purchases.schema


def test_stream_stream_interval_join_equals_batch(spark, split_events, tmp_path):
    err_path, pur_path, err_schema, pur_schema = split_events

    batch = interval_join(
        spark.read.parquet(err_path), spark.read.parquet(pur_path),
        key="user_id", left_ts="ts", right_ts="p_ts", bound_seconds=3600,
    )
    expected = {(r["event_id"], r["p_event_id"]) for r in batch.collect()}

    err_s = (
        spark.readStream.schema(err_schema).parquet(err_path)
        .withWatermark("ts", "10 minutes")
    )
    pur_s = (
        spark.readStream.schema(pur_schema).parquet(pur_path)
        .withWatermark("p_ts", "10 minutes")
    )
    joined = interval_join(
        err_s, pur_s, key="user_id", left_ts="ts", right_ts="p_ts",
        bound_seconds=3600,
    )
    q = (
        joined.select("event_id", "p_event_id")
        .writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_id"], r["p_event_id"])
            for r in spark.sql("SELECT * FROM ssj").collect()
        }
    finally:
        q.stop()

    assert got == expected
    assert len(got) > 0


def test_stream_stream_left_outer_join_emits_unmatched(spark, split_events,
                                                       tmp_path):
    """LEFT OUTER stream-stream interval join: errors with no purchase in
    range must null-emit once both watermarks pass their range window.
    Far-future sentinel rows advance the watermarks so every outer row
    is evictable by end of replay (the session-window close-out trick);
    the no-data micro-batch then flushes them.  Stream result == batch
    left join, and the inner forms (bucketed vs direct) agree."""
    import glob
    import os
    import time

    from dagger_spark.ops.asof import interval_join, interval_join_direct

    err_path, pur_path, err_schema, pur_schema = split_events

    err_b, pur_b = spark.read.parquet(err_path), spark.read.parquet(pur_path)
    batch = interval_join_direct(
        err_b, pur_b, key="user_id", left_ts="ts", right_ts="p_ts",
        bound_seconds=3600, how="left_outer",
    )
    expected = {(r["event_id"], r["p_event_id"]) for r in batch.collect()}
    # the direct inner form matches the bucketed inner form exactly
    inner_direct = {
        (r["event_id"], r["p_event_id"])
        for r in interval_join_direct(
            err_b, pur_b, key="user_id", left_ts="ts", right_ts="p_ts",
            bound_seconds=3600,
        ).collect()
    }
    inner_bucketed = {
        (r["event_id"], r["p_event_id"])
        for r in interval_join(
            err_b, pur_b, key="user_id", left_ts="ts", right_ts="p_ts",
            bound_seconds=3600,
        ).collect()
    }
    assert inner_direct == inner_bucketed
    n_unmatched = len(expected) - len(inner_direct)
    assert n_unmatched > 0  # the fixture has purchase-less errors

    # copy sources and add far-future sentinels (advance both watermarks)
    sent = str(tmp_path / "outer_src")
    for name, path, schema in (("errors", err_path, err_schema),
                               ("purchases", pur_path, pur_schema)):
        spark.read.parquet(path).write.parquet(f"{sent}/{name}")
        ts_col = "ts" if name == "errors" else "p_ts"
        id_col = "event_id" if name == "errors" else "p_event_id"
        spark.createDataFrame(
            [(-1, -1, None)],
            f"{id_col} long, user_id long, {ts_col} timestamp",
        ).withColumn(
            ts_col, F.lit("2030-01-01 00:00:00").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(f"{sent}/{name}")
    # force the sentinel files to replay LAST
    for name in ("errors", "purchases"):
        files = sorted(glob.glob(f"{sent}/{name}/part-*.parquet"),
                       key=os.path.getsize, reverse=True)
        t0 = time.time() - 100
        for i, f in enumerate(files):
            os.utime(f, (t0 + 30 * i, t0 + 30 * i))

    err_s = (
        spark.readStream.schema(err_schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(f"{sent}/errors").withWatermark("ts", "10 minutes")
    )
    pur_s = (
        spark.readStream.schema(pur_schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(f"{sent}/purchases").withWatermark("p_ts", "10 minutes")
    )
    joined = interval_join_direct(
        err_s, pur_s, key="user_id", left_ts="ts", right_ts="p_ts",
        bound_seconds=3600, how="left_outer",
    )
    q = (
        joined.select("event_id", "p_event_id")
        .writeStream.format("memory").queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_id"], r["p_event_id"])
            for r in spark.sql(
                "SELECT * FROM ssj_outer WHERE event_id <> -1"
            ).collect()
        }
    finally:
        q.stop()

    # drop the sentinels' own (unmatched) rows from the expectation side
    assert got == expected
