"""Kafka source/sink wrappers — parity with the reference's connector DDL.

The reference consumes a JSON topic from earliest offset with a 5 s watermark
and produces JSON alerts (windows-process-access.sql:8-35,65-70).  On Spark:
``readStream.format("kafka")`` exposes the record ``timestamp`` column (the
METADATA column of windows-process-access.sql:24); payload parsing goes
through :func:`dagger_spark.sources.files.parse_json_events` (permissive
parse == ignore-parse-errors).

This container has no Kafka broker and no spark-sql-kafka package, so these
builders are exercised for plan construction in tests only up to the point of
``load()``; the transformation pipeline they feed is identical to the
file-stream path the tests DO execute end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .files import parse_json_events


def read_kafka_events(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str = "dagger_spark",
    starting_offsets: str = "earliest",   # scan.startup.mode=earliest-offset parity
    watermark: str = "5 seconds",          # windows-process-access.sql:25
) -> DataFrame:
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", group_id)
        .load()
    )
    events = parse_json_events(raw, "value", "timestamp")
    return events.withWatermark("timestamp", watermark)


def write_kafka_alerts(
    alerts: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
):
    """Alerts -> JSON -> Kafka sink, one streaming query (one checkpoint, one
    offset log — the statement-set equivalence of SURVEY.md §2.1-S6)."""
    payload = alerts.select(F.to_json(F.struct(*alerts.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
        .start()
    )
