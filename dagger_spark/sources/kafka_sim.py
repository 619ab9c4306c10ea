"""``kafka_sim`` — a Python DataSource (Spark 4 DataSource-V2 API) that
serves records on the EXACT Kafka wire schema, batch and streaming.

Purpose: this sandbox has no broker and no spark-sql-kafka JAR, so the thin
``format("kafka")`` wrappers stop at Spark's provider lookup (pinned by
``tests/test_kafka_sim.py::test_real_kafka_provider_lookup_reached``).
Everything BEYOND the lookup — source registration, schema declaration,
offset bookkeeping, micro-batch planning, replay between offsets, the
arrival of (key, value, topic, partition, offset, timestamp, timestampType)
rows — is engine machinery this source DOES exercise, through the same
``spark.readStream.format(...).option(...).load()`` call chain the Kafka
wrapper issues (reference DDL: rules/sigma/windows-process-access.sql:8-35).

Records come from a newline-delimited JSON file (one Kafka record value per
line).  Offsets are per-partition and contiguous from 0, record timestamps
are ``base_ts + i`` seconds — deterministic, so batch == stream holds.

Options: ``path`` (required), ``topic`` (default ``events``),
``n_partitions`` (default 3), ``batch_size`` (streaming: max records per
micro-batch, default 0 = all at once), ``base_ts`` (ISO datetime, default
2024-01-01T00:00:00+00:00).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

KAFKA_WIRE_DDL = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def _load_records(options: dict) -> list:
    path = options.get("path")
    if not path:
        raise ValueError("kafka_sim requires option 'path' (JSON-lines file)")
    topic = options.get("topic", "events")
    n_parts = int(options.get("n_partitions", 3))
    base = datetime.fromisoformat(
        options.get("base_ts", "2024-01-01T00:00:00+00:00")
    )
    if base.tzinfo is None:
        base = base.replace(tzinfo=timezone.utc)
    rows = []
    per_part = [0] * n_parts
    with open(path, "rb") as fh:
        i = 0
        for line in fh:
            line = line.strip()
            if not line:
                continue
            p = i % n_parts
            rows.append(
                (
                    None,                      # key
                    line,                      # value: the JSON payload
                    topic,
                    p,
                    per_part[p],               # per-partition offset
                    base + timedelta(seconds=i),
                    0,                         # CreateTime
                )
            )
            per_part[p] += 1
            i += 1
    return rows


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._options = dict(options)

    def read(self, partition) -> Iterator[Tuple]:
        return iter(_load_records(self._options))


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read with exact replay between offsets —
    the contract a real source honors for checkpoint recovery."""

    def __init__(self, options: dict):
        self._options = dict(options)
        self._rows = _load_records(self._options)
        self._batch = int(options.get("batch_size", 0)) or len(self._rows) or 1

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lo = int(start["pos"])
        hi = min(lo + self._batch, len(self._rows))
        return iter(self._rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return iter(self._rows[int(start["pos"]):int(end["pos"])])

    def commit(self, end: dict) -> None:
        pass


class KafkaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_sim"

    def schema(self) -> str:
        return KAFKA_WIRE_DDL

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register_kafka_sim(spark) -> None:
    spark.dataSource.register(KafkaSimDataSource)
