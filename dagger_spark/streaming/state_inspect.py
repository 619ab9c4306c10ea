"""Offline inspection of streaming state via Spark 4's ``statestore`` data
source — read the checkpointed state of a running (or stopped) stateful
query as a DataFrame, without touching the query.

Why this matters operationally: at 100 TB the failure mode of a stateful
pipeline is its STATE, not its code — a hot key ballooning one partition,
an eviction bug retaining dead entities, a suspected corruption after an
incident.  The state source turns those from log-spelunking into SQL:
``state_summary`` surfaces per-partition row counts (state skew is
directly visible), and ``read_state`` gives row-level access for
reconciliation against batch truth (pinned in
tests/test_state_inspect.py: aggregate state == the batch aggregate;
applyInPandasWithState state == the operator's own emitted totals).

This reads the HDFS/RocksDB state files directly from the checkpoint —
no broker, no running query needed — which also makes it the forensic
tool for a checkpoint you've only got a copy of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """State rows of one operator in a streaming checkpoint.

    ``batch_id`` selects a historical version (default: latest committed);
    ``store_name`` picks a store for multi-store operators (stream-stream
    joins keep four).  With ``flatten`` the nested key/value structs are
    splayed into ``key_*`` / ``value_*`` columns for direct SQL."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    df = r.load(checkpoint)
    if not flatten:
        return df
    cols = []
    for field in df.schema["key"].dataType.fields:
        cols.append(F.col(f"key.{field.name}").alias(f"key_{field.name}"))
    for field in df.schema["value"].dataType.fields:
        cols.append(
            F.col(f"value.{field.name}").alias(f"value_{field.name}")
        )
    cols.append(F.col("partition_id"))
    return df.select(*cols)


def state_summary(
    spark: SparkSession, checkpoint: str, *, operator_id: int = 0
) -> DataFrame:
    """Per-partition state-row counts — the state-skew gauge.  A healthy
    keyspace spreads evenly; one partition holding an outsized share is
    the hot-key signature that precedes an executor OOM at scale."""
    return (
        read_state(spark, checkpoint, operator_id=operator_id, flatten=False)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_state_rows"))
        .orderBy("partition_id")
    )
