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

The SINK side (``writer``/``streamWriter``) completes the duplex: a
produce step on the V2 two-phase commit contract.  Tasks stage their
records under ``<path>/.staging/`` and report per-task commit messages;
only the driver's commit publishes files and writes a manifest, so a
re-executed or aborted task leaves at most an orphaned staging file the
consumer never sees (``committed_values`` reads in manifest order).  This
is the same visibility protocol a transactional Kafka producer gives via
commitTransaction, expressed in the DataSource-V2 writer API.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class _FilesCommitted(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced (or
    None for an empty task) and its record count."""

    def __init__(self, filename, n_rows):
        self.filename = filename
        self.n_rows = n_rows


def _value_bytes(row) -> bytes:
    """The sink's log is NEWLINE-FRAMED (the same JSON-lines contract the
    reader consumes), so a value containing a raw newline cannot be
    represented — reject it loudly instead of silently mis-framing the
    log (counts would drift from the manifest, or worse, coincide).
    Null values serialize as an empty payload — a documented collapse of
    Kafka's tombstone/empty distinction, acceptable because this sink
    carries JSON alert bodies, never compacted-topic tombstones."""
    v = row["value"]
    if v is None:
        return b""
    b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
    if b"\n" in b:
        raise ValueError(
            "kafka_sim sink is newline-framed: record values must not "
            "contain raw b'\\n' (serialize payloads as JSON first)"
        )
    return bytes(b)


class _SinkWriterBase:
    """Shared task-side produce step for the batch and streaming sinks:
    each task stages its records as ONE newline-delimited file under
    ``<path>/.staging/`` and reports it in the commit message.  Nothing
    becomes visible until the DRIVER's commit writes the manifest — the
    V2 two-phase contract that gives a re-executed task idempotence (its
    orphaned staging file is never referenced)."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kafka_sim sink requires option 'path'")

    def write(self, iterator) -> _FilesCommitted:
        import os
        import uuid

        staging = os.path.join(self._path, ".staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        tmp = os.path.join(staging, name)
        with open(tmp, "wb") as fh:
            for row in iterator:
                fh.write(_value_bytes(row))
                fh.write(b"\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _FilesCommitted(None, 0)
        return _FilesCommitted(name, n)

    @staticmethod
    def _publish(path: str, messages, manifest_name: str) -> None:
        import json
        import os

        files = [(m.filename, m.n_rows) for m in messages
                 if m is not None and m.filename]
        for name, _ in files:
            os.replace(
                os.path.join(path, ".staging", name),
                os.path.join(path, name),
            )
        manifest = {
            "files": [{"file": f, "n_rows": n} for f, n in files],
            "n_rows": sum(n for _, n in files),
        }
        tmp = os.path.join(path, f".{manifest_name}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(path, manifest_name))

    @staticmethod
    def _discard(path: str, messages) -> None:
        import os

        for m in messages:
            if m is not None and m.filename:
                try:
                    os.remove(os.path.join(path, ".staging", m.filename))
                except FileNotFoundError:
                    pass


class _SinkBatchWriter(_SinkWriterBase, DataSourceWriter):
    """Batch produce.  Each commit publishes under a UNIQUE manifest name
    (zero-padded nanosecond timestamp + random suffix, so lexicographic
    manifest order == commit order): a second batch write in append mode
    ADDS records instead of silently replacing the first commit's manifest
    (the old fixed ``manifest-batch.json`` name hid prior committed rows
    from ``committed_values``).  ``mode("overwrite")`` is honored at
    commit time on the driver: prior manifests and the files they
    reference are removed before the new manifest is published — staged
    data only, so an aborted overwrite leaves the previous commit
    intact."""

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options)
        self._overwrite = bool(overwrite)

    def commit(self, messages) -> None:
        import os
        import time
        import uuid

        if self._overwrite:
            for mf in [
                f for f in os.listdir(self._path)
                if f.startswith("manifest-")
            ]:
                import json

                with open(os.path.join(self._path, mf)) as fh:
                    manifest = json.load(fh)
                for entry in manifest["files"]:
                    try:
                        os.remove(os.path.join(self._path, entry["file"]))
                    except FileNotFoundError:
                        pass
                os.remove(os.path.join(self._path, mf))
        name = (
            f"manifest-batch-{time.time_ns():020d}-"
            f"{uuid.uuid4().hex[:8]}.json"
        )
        self._publish(self._path, messages, name)

    def abort(self, messages) -> None:
        self._discard(self._path, messages)


class _SinkStreamWriter(_SinkWriterBase, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:
        self._publish(self._path, messages, f"manifest-{batchId:08d}.json")

    def abort(self, messages, batchId: int) -> None:
        self._discard(self._path, messages)


def committed_values(path: str) -> list:
    """Consumer helper: the produced record values in MANIFEST order —
    staged/orphaned files are invisible by construction (the exactly-once
    read side of the two-phase commit).  Returns a list of bytes."""
    import json
    import os

    out = []
    for mf in sorted(
        f for f in os.listdir(path) if f.startswith("manifest-")
    ):
        with open(os.path.join(path, mf)) as fh:
            manifest = json.load(fh)
        for entry in manifest["files"]:
            with open(os.path.join(path, entry["file"]), "rb") as fh:
                lines = fh.read().split(b"\n")[:-1]
            assert len(lines) == entry["n_rows"]
            out.extend(lines)
    return out


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

    def writer(self, schema, overwrite: bool) -> "_SinkBatchWriter":
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"kafka_sim sink requires a 'value' column, got {names}"
            )
        return _SinkBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "_SinkStreamWriter":
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError(
                f"kafka_sim sink requires a 'value' column, got {names}"
            )
        return _SinkStreamWriter(self.options)


def register_kafka_sim(spark) -> None:
    spark.dataSource.register(KafkaSimDataSource)
