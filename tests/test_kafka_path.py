"""Kafka path proof (no broker in this container): option dicts are asserted
field-by-field against the reference connector DDL, and the FULL record
transformation — event JSON on the Kafka wire schema → parse → rules →
alert JSON payload — runs end-to-end as a streaming query, schema-checked
against the sink DDL (windows-process-access.sql:38-70).  The only lines of
``sources/kafka.py`` not executed here are the literal ``format("kafka")``
``load()``/``start()`` calls."""

import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dagger_spark.rules.builtin import active_rules
from dagger_spark.rules.engine import apply_rules_single_pass
from dagger_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_alert_payload,
    kafka_events_from_records,
    kafka_sink_options,
    kafka_source_options,
)

BASE = datetime(2024, 1, 1)


def test_source_options_match_reference_ddl():
    """windows-process-access.sql:8-35: bootstrap servers, topic
    subscription, earliest startup mode, consumer group."""
    opts = kafka_source_options("broker1:9092,broker2:9092", "windows-sysmon")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "windows-sysmon",
        "startingOffsets": "earliest",
        "kafka.group.id": "dagger_spark",
    }


def test_sink_options_match_reference_ddl(tmp_path):
    opts = kafka_sink_options("b:9092", "alerts", str(tmp_path / "ck"))
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "alerts",
        "checkpointLocation": str(tmp_path / "ck"),
    }


def _event_json(uuid, call_trace="UNKNOWN(1234)", extra=None):
    doc = {
        "computer_name": "CN",
        "event_id": 10,
        "host": "hostA",
        "event_data": {"CallTrace": call_trace, "TargetImage": "C:\\x\\a.exe"},
        "uuid": uuid,
    }
    if extra:
        doc.update(extra)
    return json.dumps(doc)


def _wire_rows():
    """Kafka-wire records: two rule-matching events, one undeclared-field
    event (dropped fields, still parsed), one malformed payload, one NULL
    value — the permissive-parse matrix."""
    rows = []
    for i, payload in enumerate(
        [
            _event_json("k-000"),
            _event_json("k-001"),
            _event_json("k-002", extra={"not_in_schema": 1}),
            "{ not json",
            None,
        ]
    ):
        rows.append(
            (
                None,
                bytearray(payload.encode()) if payload is not None else None,
                "windows-sysmon",
                i % 3,
                i,
                BASE + timedelta(seconds=i),
                0,
            )
        )
    return rows


def _stateless_rules():
    return [r for r in active_rules() if r.name == "Direct Syscall of NtOpenProcess"]


def test_wire_records_roundtrip_to_alert_json_stream(spark, tmp_path):
    """Streaming run over the real wire schema: JSON events in, alert JSON
    out through the same transformation read_kafka_events/write_kafka_alerts
    apply; payload shape checked against the sink DDL field names."""
    src = tmp_path / "wire"
    src.mkdir()
    spark.createDataFrame(_wire_rows(), KAFKA_WIRE_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    records = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(str(src) + "/*")
    events = kafka_events_from_records(records, watermark="5 seconds")
    alerts = apply_rules_single_pass(events, _stateless_rules())
    payload = kafka_alert_payload(alerts)
    q = (
        payload.writeStream.format("memory")
        .queryName("kafka_payload")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        values = [r["value"] for r in spark.sql("SELECT * FROM kafka_payload").collect()]
    finally:
        q.stop()

    # 3 parseable matching events -> 3 alerts; malformed + NULL dropped
    assert len(values) == 3
    docs = [json.loads(v) for v in values]
    assert {d["event"]["origin_ids"][0] for d in docs} == {"k-000", "k-001", "k-002"}
    for doc in docs:
        # sink DDL superset: windows-process-access.sql:38-64
        assert set(doc) >= {"computer_name", "host", "event", "threat", "rule"}
        assert set(doc["event"]) >= {"kind", "origin_ids", "count", "start", "end", "time"}
        assert set(doc["threat"]) == {"tactic", "technique", "subtechnique"}
        assert set(doc["rule"]) >= {
            "name", "author", "category", "severity",
            "description", "reference", "version", "source",
        }
        assert doc["event"]["count"] == 1


def test_wire_records_batch_equals_stream(spark):
    """The transformation is execution-mode agnostic: the same wire records
    through the same functions in batch mode give the same alert set."""
    records = spark.createDataFrame(_wire_rows(), KAFKA_WIRE_SCHEMA)
    events = kafka_events_from_records(records)  # batch: watermark skipped
    assert not events.isStreaming
    alerts = apply_rules_single_pass(events, _stateless_rules())
    got = {r["event"]["origin_ids"][0] for r in alerts.collect()}
    assert got == {"k-000", "k-001", "k-002"}
    # record-metadata timestamp became event time
    ts = {r["event"]["time"] for r in alerts.collect()}
    assert ts == {BASE, BASE + timedelta(seconds=1), BASE + timedelta(seconds=2)}


def test_undeclared_json_fields_dropped(spark):
    records = spark.createDataFrame(_wire_rows(), KAFKA_WIRE_SCHEMA)
    events = kafka_events_from_records(records)
    assert "not_in_schema" not in events.columns
    assert events.count() == 3
