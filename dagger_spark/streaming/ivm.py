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
and a crash mid-merge leaves the previous version live.  The pointer
also records the LAST APPLIED MICRO-BATCH ID, making the merge
idempotent under at-least-once redelivery: a batch replayed after a
crash between the pointer swing and the stream's checkpoint commit is
recognized (id <= watermark) and skipped rather than double-counted —
the exact discipline a Delta/Iceberg MERGE gets from txn metadata.  At
100 TB the same merge is that MERGE or a partition-overwrite; the
algebra and the publish discipline are identical.

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


def _partial(df: DataFrame, sign: int = 1) -> DataFrame:
    """The rollup's partial aggregate — identical to the batch entry's
    (catalog/round10.py events_incremental_rollup.partial).  ``sign=-1``
    yields the RETRACTION partial: negated measures, the signed-delta
    form ``retract_rollup_partial`` merges."""
    return df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        (F.count(F.lit(1)) * F.lit(sign)).cast("long").alias("n_events"),
        (F.sum("value") * F.lit(sign)).alias("__sv"),
    )


def _watermarks(state_dir: str) -> tuple:
    """(version, {stream: last_applied_batch_id}) from the pointer file,
    or (None, {}).  Watermarks ride IN the atomically-renamed pointer so
    snapshot content and applied-batch state can never diverge.  Named
    streams (review r12, matching ops/dedup_state): an admission feed
    ('ingest') and a retraction feed ('retract') each own a key, so
    their batch-id sequences — both monotone from 0 — never skip each
    other's batches.  Pointer format: ``vN``, ``vN <int>`` (legacy: the
    int is the ingest stream's id), or ``vN {"ingest": 5, ...}``."""
    import json

    ptr = os.path.join(state_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None, {}
    with open(ptr) as f:
        parts = f.read().strip().split(None, 1)
    if not parts:
        return None, {}
    if len(parts) == 1:
        return parts[0], {}
    tail = parts[1]
    if tail.startswith("{"):
        return parts[0], json.loads(tail)
    return parts[0], {"ingest": int(tail)}


def _pointer(state_dir: str):
    """Back-compat view: (version, ingest stream's last batch id)."""
    ver, wms = _watermarks(state_dir)
    return ver, wms.get("ingest")


def _render_pointer(version: str, wms: dict) -> str:
    import json

    if not wms:
        return version
    if set(wms) == {"ingest"}:  # keep the legacy single-stream format
        return f"{version} {wms['ingest']}"
    return f"{version} {json.dumps(wms, sort_keys=True)}"


def _current_version(state_dir: str):
    return _pointer(state_dir)[0]


def merge_rollup_partial(
    spark: SparkSession,
    state_dir: str,
    delta_partial: DataFrame,
    batch_id: int = None,
    drop_zero: bool = False,
    stream: str = "ingest",
) -> bool:
    """One IVM merge step: state ∪ delta-partial → re-aggregate → publish
    a new snapshot version and swing the pointer.  Touches state-sized
    input only.

    ``batch_id`` makes the merge IDEMPOTENT under at-least-once replay:
    the pointer records the last applied id, and a merge whose id is <=
    that watermark is skipped (returns False) — a micro-batch redelivered
    after a crash between the pointer swing and the stream's checkpoint
    commit must not double-count.  Ids must be monotonically increasing
    (Structured Streaming batch ids are).  Without a batch_id the merge
    always applies (the direct-call form).

    ``drop_zero`` is the RETRACTION posture (use via
    ``retract_rollup_partial``): after merging a signed delta, groups
    whose count reached zero vanish from the snapshot — group aggregates
    retract exactly, so retract-then-read equals recomputing without the
    retired rows (events_retire_rollup's algebra in the streaming
    deployment shape).

    ``stream`` names the watermark this batch id belongs to: an
    admission feed and a retraction feed driving one state dir have
    INDEPENDENT monotone batch-id sequences, so each owns a key in the
    pointer's watermark dict (review r12 — a shared watermark would make
    the two feeds silently skip each other's batches)."""
    os.makedirs(state_dir, exist_ok=True)
    cur, wms = _watermarks(state_dir)
    last_bid = wms.get(stream)
    if batch_id is not None and last_bid is not None and batch_id <= last_bid:
        return False  # already applied: replayed micro-batch
    if cur is not None:
        state = spark.read.parquet(os.path.join(state_dir, cur))
        src = state.unionByName(delta_partial)
    else:
        src = delta_partial
    merged = src.groupBy("hour_start", "event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("__sv").alias("__sv"),
    )
    if drop_zero:
        merged = merged.filter(F.col("n_events") > 0)
    nxt = f"v{int(cur[1:]) + 1}" if cur else "v1"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, nxt))
    tmp = os.path.join(state_dir, "_CURRENT.tmp")
    # a direct-call merge (batch_id=None) on a state dir that already
    # carries watermarks must PRESERVE them all — erasing one would let
    # a subsequent stream resume re-apply replayed micro-batches and
    # double-count (advice r11; per-stream since review r12)
    if batch_id is not None:
        wms = {**wms, stream: batch_id}
    with open(tmp, "w") as f:
        f.write(_render_pointer(nxt, wms))
    os.rename(tmp, os.path.join(state_dir, "_CURRENT"))  # atomic publish
    if cur is not None:
        shutil.rmtree(os.path.join(state_dir, cur), ignore_errors=True)
    return True


def retract_rollup_partial(
    spark: SparkSession,
    state_dir: str,
    retired: DataFrame,
    batch_id: int = None,
    stream: str = "retract",
) -> bool:
    """Retract a slice of events from the maintained rollup — the IVM
    delete twin in its STREAMING deployment shape (round-11 verdict ask
    #7; the batch algebra is catalog/round11.py events_retire_rollup).
    ``retired`` is the raw retired-event slice; its partial aggregate is
    merged with NEGATED measures through the same versioned-pointer
    protocol (so the batch-id watermark makes retractions idempotent
    under at-least-once replay exactly like admissions), and groups whose
    count reaches zero vanish.  The default stream name 'retract' keeps a
    retraction feed's batch ids independent of the admission feed's
    (review r12).  Retract-then-read equals recomputing over the
    surviving events — pinned by tests/test_streaming_ivm.py."""
    return merge_rollup_partial(
        spark, state_dir, _partial(retired, sign=-1),
        batch_id=batch_id, drop_zero=True, stream=stream,
    )


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
    APPLIED (replayed batches are skipped by the batch-id watermark — the
    state_dir and the checkpoint must live and die together: pass a
    persistent checkpoint to resume, and never point a fresh checkpoint at
    an existing state_dir, which would replay the whole source into
    already-merged state)."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    n_batches = {"n": 0}

    def _merge(bdf: DataFrame, bid: int) -> None:
        if merge_rollup_partial(spark, state_dir, _partial(bdf), batch_id=bid):
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
            # catalog-standard +1e-9 nudge: merged double sums can land a
            # ulp from a direct recompute; without the nudge a .xx5-boundary
            # value could round the other way (advice r11)
            F.round(F.col("__sv") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )
