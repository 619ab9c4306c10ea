"""Streaming incremental view maintenance: the deployment shape of
``events_incremental_rollup`` (catalog/round10.py).

The batch entry proves the merge ALGEBRA (state + delta partial
aggregates re-aggregated == full recompute); this module runs the same
rollup as a foreachBatch-maintained state table over a micro-batch
replay — the Structured Streaming shape a 100 TB deployment actually
runs: every micro-batch computes its delta partial aggregate (delta-
sized), merges it into the persisted state by re-aggregation
(state-sized — hours x event_types, never the event history), and
publishes the new state snapshot atomically.

State layout is a poor-man's transaction log: versioned snapshot dirs
``v1, v2, ...`` under the state dir plus a ``_CURRENT`` pointer file
written via tmp+rename, so a reader never sees a half-written snapshot
and a crash mid-merge leaves the previous version live (re-running the
micro-batch is idempotent at the Structured Streaming layer — the
checkpoint replays it into a fresh version).  At 100 TB the same merge
is a Delta/Iceberg MERGE or a partition-overwrite; the algebra and the
publish discipline are identical.

Raw double sums (not rounded) live in the state so repeated merges never
compound rounding; rounding to the catalog's 2 decimals happens only in
``read_rollup_state``.  Parity with the batch recompute is pinned by
tests/test_streaming_ivm.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partial(df: DataFrame) -> DataFrame:
    """The rollup's partial aggregate — identical to the batch entry's
    (catalog/round10.py events_incremental_rollup.partial)."""
    return df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("__sv"),
    )


def _current_version(state_dir: str):
    ptr = os.path.join(state_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip() or None


def merge_rollup_partial(
    spark: SparkSession, state_dir: str, delta_partial: DataFrame
) -> None:
    """One IVM merge step: state ∪ delta-partial → re-aggregate → publish
    a new snapshot version and swing the pointer.  Touches state-sized
    input only."""
    os.makedirs(state_dir, exist_ok=True)
    cur = _current_version(state_dir)
    if cur is not None:
        state = spark.read.parquet(os.path.join(state_dir, cur))
        src = state.unionByName(delta_partial)
    else:
        src = delta_partial
    merged = src.groupBy("hour_start", "event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("__sv").alias("__sv"),
    )
    nxt = f"v{int(cur[1:]) + 1}" if cur else "v1"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, nxt))
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(nxt)
    os.rename(tmp, os.path.join(state_dir, "_CURRENT"))  # atomic publish
    if cur is not None:
        shutil.rmtree(os.path.join(state_dir, cur), ignore_errors=True)


def run_incremental_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint: str = None,
    max_files_per_trigger: int = 2,
) -> int:
    """Replay ``source_dir``'s parquet files as micro-batches and maintain
    the hourly rollup state via foreachBatch merges.  availableNow trigger:
    drain the backlog, then stop.  Returns the number of micro-batches
    processed."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    n_batches = {"n": 0}

    def _merge(bdf: DataFrame, _bid: int) -> None:
        merge_rollup_partial(spark, state_dir, _partial(bdf))
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="dagger_ivm_ck_"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def read_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained rollup in the catalog entry's output shape
    (hour_start, event_type, n_events, sum_value rounded to 2)."""
    cur = _current_version(state_dir)
    if cur is None:
        raise ValueError(f"no published rollup state in {state_dir}")
    return (
        spark.read.parquet(os.path.join(state_dir, cur))
        .select(
            "hour_start",
            "event_type",
            "n_events",
            F.round(F.col("__sv"), 2).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )
