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
