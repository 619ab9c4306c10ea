"""The streaming alert job: ONE unioned query over one source scan.

The reference bundles 17 INSERTs in a Flink STATEMENT SET so they share a
single Kafka scan (windows-process-access.sql:72,601), and its second job
expresses the same idea as a UNION ALL view (windows-process-creation.sql:
95-135).  Spark has no statement set; N independent ``writeStream``s would
each open their own Kafka consumer.  The equivalent design — standardized
here — is a single streaming query: stateless alerts via the single-pass
engine (one scan, rule fan-out inside the row pipeline) unioned with the
windowed timeframe alerts, one checkpoint, one offset log.

Batch/stream symmetry: everything upstream of the sink is ordinary DataFrame
code shared with the batch path, so `batch == stream` is testable directly
(tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rules.engine import apply_rules_single_pass
from ..rules.spec import RuleSpec
from ..rules.timeframe import apply_timeframe_rules
from ..schemas import SYSMON_EVENT_SCHEMA


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def configure_state_store(
    spark: SparkSession,
    provider: str = "rocksdb",
    changelog_checkpointing: bool = True,
    bounded_memory_mb: Optional[int] = None,
) -> dict:
    """State-store posture for large-state streaming; returns the conf set.

    The default HDFSBackedStateStoreProvider keeps every key's state as JVM
    heap objects — at 100 TB/day (millions of live (window, host) keys plus
    watermark-bounded dedup ids) that is an OOM, not a tuning problem.
    RocksDB (bundled with Spark) moves state off-heap/on-disk with
    changelog checkpointing so per-commit upload is the delta, not a full
    snapshot; ``bounded_memory_mb`` caps the shared block cache +
    memtables across all RocksDB instances on an executor.

    Observability: each StreamingQueryProgress carries per-operator
    ``stateOperators`` rows (numRowsTotal, numRowsUpdated, memoryUsedBytes,
    customMetrics.rocksdb*) — assert/alert on those, not on executor RSS
    (see ARCHITECTURE.md "Streaming state posture").
    """
    if provider == "rocksdb":
        conf = {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}
        if changelog_checkpointing:
            conf[
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
            ] = "true"
        if bounded_memory_mb:
            conf["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
            conf["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(
                int(bounded_memory_mb)
            )
    elif provider == "hdfs":
        conf = {"spark.sql.streaming.stateStore.providerClass": HDFS_PROVIDER}
    else:
        raise ValueError(f"unknown state-store provider {provider!r}")
    for k, v in conf.items():
        spark.conf.set(k, v)
    return conf


def file_stream_events(
    spark: SparkSession,
    path: str,
    watermark: Optional[str] = "5 seconds",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Parquet-directory replay source (the test stand-in for Kafka)."""
    reader = spark.readStream.schema(SYSMON_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(path)
    if watermark:
        events = events.withWatermark("timestamp", watermark)
    return events


def build_alert_stream(
    events: DataFrame,
    rules: Sequence[RuleSpec],
    ts_col: str = "timestamp",
) -> DataFrame:
    """Stateless + timeframe alerts as one unioned DataFrame (append-mode safe)."""
    stateless = [r for r in rules if r.enabled and not r.timeframe_seconds]
    timeframe = [r for r in rules if r.enabled and r.timeframe_seconds]
    parts = []
    if stateless:
        parts.append(apply_rules_single_pass(events, stateless, ts_col))
    if timeframe:
        parts.append(apply_timeframe_rules(events, timeframe, ts_col))
    if not parts:
        raise ValueError("no enabled rules")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dedup_events(events: DataFrame, id_col: str = "uuid") -> DataFrame:
    """Exact event deduplication by id.

    Streaming: ``dropDuplicatesWithinWatermark`` — state is bounded by the
    watermark delay (an id seen again after the watermark passes is treated
    as new; that is the documented trade for bounded state at 100 TB/day).
    Batch: plain ``dropDuplicates``.
    """
    # NULL ids are NOT duplicates of each other, but dropDuplicates treats
    # NULL == NULL and would silently keep one row of many — split them out
    # and pass them through untouched
    with_id = events.filter(F.col(id_col).isNotNull())
    without_id = events.filter(F.col(id_col).isNull())
    deduped = (
        with_id.dropDuplicatesWithinWatermark([id_col])
        if events.isStreaming
        else with_id.dropDuplicates([id_col])
    )
    return deduped.unionByName(without_id)


def run_foreach_batch(alerts: DataFrame, batch_fn, checkpoint: str):
    """Start the unioned query with a foreachBatch sink — the per-micro-batch
    escape hatch (multi-sink fanout, idempotent upserts) the reference's
    statement set cannot express."""
    return (
        alerts.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def run_to_memory(alerts: DataFrame, name: str, checkpoint: str):
    """Start the unioned query into an in-memory table (tests/demos)."""
    return (
        alerts.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
