"""Kafka source/sink wrappers — parity with the reference's connector DDL.

The reference consumes a JSON topic from earliest offset with a 5 s watermark
and produces JSON alerts (windows-process-access.sql:8-35,65-70).  On Spark:
``readStream.format("kafka")`` exposes the record ``timestamp`` column (the
METADATA column of windows-process-access.sql:24); payload parsing goes
through :func:`dagger_spark.sources.files.parse_json_events` (permissive
parse == ignore-parse-errors).

Testability without a broker: the connector is factored into three pieces —
(1) pure OPTION builders (``kafka_source_options``/``kafka_sink_options``)
asserted field-by-field against the reference DDL, (2) the record
TRANSFORMATION (``kafka_events_from_records``/``kafka_alert_payload``)
which is exercised end-to-end over DataFrames carrying the exact wire
schema Spark's Kafka source produces (``KAFKA_WIRE_SCHEMA``), and (3) the
two thin ``format("kafka")`` wrappers below, which only glue (1) to (2).
This container has no broker and no spark-sql-kafka package, so (3)'s
``load()``/``start()`` are the only lines tests cannot execute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .files import parse_json_events

# the exact column set/types Spark's kafka source emits (Structured Streaming
# + Kafka integration guide) — tests replay records in this shape so the
# transformation runs on what the real source would deliver
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def kafka_source_options(
    brokers: str,
    topic: str,
    group_id: str = "dagger_spark",
    starting_offsets: str = "earliest",   # scan.startup.mode=earliest-offset parity
) -> dict:
    """Source options, mirroring windows-process-access.sql:8-35 field by
    field (bootstrap servers, topic subscription, earliest startup, consumer
    group)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "kafka.group.id": group_id,
    }


def kafka_sink_options(brokers: str, topic: str, checkpoint_location: str) -> dict:
    """Sink options (windows-process-access.sql:65-70: target topic + the
    one checkpoint/offset log of the statement-set equivalence)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint_location,
    }


def kafka_events_from_records(
    records: DataFrame, watermark: str = "5 seconds"
) -> DataFrame:
    """Kafka wire records -> typed event rows: permissive JSON parse of
    ``value`` plus the record-metadata ``timestamp`` as event time, then the
    5 s watermark (streaming inputs only).  This is the ENTIRE source-side
    transformation — the broker wrapper adds nothing else."""
    events = parse_json_events(records, "value", "timestamp")
    if watermark and records.isStreaming:
        events = events.withWatermark("timestamp", watermark)
    return events


def kafka_alert_payload(alerts: DataFrame) -> DataFrame:
    """Alerts -> single-column JSON ``value`` (the Kafka sink's record
    payload; shape pinned against the sink DDL in tests)."""
    return alerts.select(F.to_json(F.struct(*alerts.columns)).alias("value"))


def read_kafka_events(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str = "dagger_spark",
    starting_offsets: str = "earliest",
    watermark: str = "5 seconds",          # windows-process-access.sql:25
) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topic, group_id, starting_offsets).items():
        reader = reader.option(k, v)
    return kafka_events_from_records(reader.load(), watermark)


def write_kafka_alerts(
    alerts: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
):
    """Alerts -> JSON -> Kafka sink, one streaming query (one checkpoint, one
    offset log — the statement-set equivalence of SURVEY.md §2.1-S6)."""
    writer = kafka_alert_payload(alerts).writeStream.format("kafka")
    for k, v in kafka_sink_options(brokers, topic, checkpoint_location).items():
        writer = writer.option(k, v)
    return writer.outputMode(output_mode).start()
