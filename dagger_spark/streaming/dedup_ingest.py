"""Streaming ingest for the dedup state (the dedup twin of
``streaming/ann_ingest.py``): a continuous document feed keeps the
at-rest bucket/pair/cluster state (``ops/dedup_state.py``) fresh via
foreachBatch admissions.

Per micro-batch:

1. **Pre-gate**: rows whose doc_id is already LIVE in the state, or
   RETIRED but not yet compacted, are split off as DEAD-LETTER rows
   (``reject_reason`` ∈ {'live_id', 'retired_id'}) — the id-discipline
   refusals ``admit_docs`` rightly raises for a batch caller become
   data for a stream.  Within-batch duplicate doc_ids keep their first
   row (dropDuplicates) — re-sent rows are the common at-least-once
   artifact.
2. **Admit** the clean remainder with ``batch_id``: the id is recorded
   in the state MANIFEST, whose atomic pointer swing commits the delta
   files and the watermark together — so STATE mutations are
   EXACTLY-ONCE under at-least-once replay, with no residual crash
   window (the protocol streaming/ann_ingest.py adopted in round 13 via
   ops/manifest.py).  The dead-letter side channel is
   outside the manifest, so ITS delivery is at-least-once: a crash
   between the dead-letter append and the manifest commit re-emits that
   batch's dead letters on replay — consumers dedupe on the
   (batch_id, doc_id) key every row carries (review r12: stated, not
   hidden).

Stream-admitted state == from-scratch build over the full corpus is
pinned by tests/test_dedup_ingest.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup_state import (
    _read_manifest,
    _retired,
    _watermark,
    admit_docs,
    retire_docs,
    state_clusters,
)
from ..ops.lease import retry_concurrent


def ingest_doc_batch(
    spark: SparkSession,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    dead_letter_dir: str = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    auto_compact_max_files: int = None,
) -> dict:
    """One micro-batch step (exposed for direct replay tests): gate,
    dead-letter, admit-with-watermark.  Returns {applied, admitted,
    rejected}."""
    docs = batch_df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).dropDuplicates(["doc_id"])

    # up to TWO gate+admit attempts (review r12): the gate runs OUTSIDE
    # the writer lease, so a concurrent takedown can retire one of our
    # "clean" ids between the gate and admit_docs' own lease-held check,
    # which then raises — the retry re-gates and turns that row into the
    # dead-letter it should have been instead of killing the stream.
    # Only NEWLY-bad ids are dead-lettered per attempt (no duplicates);
    # a second admit failure is a real bug and propagates.
    dead_lettered = set()
    for attempt in (0, 1):
        m = _read_manifest(state_dir)
        last_bid = _watermark(m, "ingest")
        if last_bid is not None and batch_id <= last_bid:
            return {"applied": False, "admitted": 0, "rejected": 0}
        ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
        # ^ bounded: one micro-batch of the feed
        live = set()
        retired = set()
        if ids:
            live = {
                r["doc_id"]
                for r in state_clusters(spark, state_dir)
                .filter(F.col("doc_id").isin(ids))  # pushed to the scan
                .collect()
            }
            r = _retired(spark, state_dir, m)
            if r is not None:
                retired = {
                    x["doc_id"]
                    for x in r.filter(F.col("doc_id").isin(ids)).collect()
                }
        bad_ids = live | retired
        new_bad = bad_ids - dead_lettered
        if new_bad and dead_letter_dir:
            docs.filter(F.col("doc_id").isin(list(new_bad))).select(
                "doc_id",
                "text",
                F.when(
                    F.col("doc_id").isin(list(retired)), F.lit("retired_id")
                ).otherwise(F.lit("live_id")).alias("reject_reason"),
                F.lit(batch_id).cast("long").alias("batch_id"),
            ).coalesce(1).write.mode("append").parquet(dead_letter_dir)
        dead_lettered |= new_bad
        clean = (
            docs.filter(~F.col("doc_id").isin(list(bad_ids)))
            if bad_ids else docs
        )
        try:
            # retry_concurrent (advice r12): a takedown feed holding the
            # lease mid-mutation used to propagate ConcurrentWriterError
            # out of foreachBatch and kill the whole streaming query —
            # wait it out with bounded backoff instead
            stats = retry_concurrent(
                lambda: admit_docs(
                    spark, state_dir, clean,
                    batch_id=batch_id, stream="ingest",
                    auto_compact_max_files=auto_compact_max_files,
                )
            )
            break
        except ValueError:
            if attempt == 1:
                raise
    return {
        "applied": not stats.get("skipped", False),
        "admitted": stats["admitted"],
        "rejected": len(dead_lettered),
    }


def run_dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint: str = None,
    dead_letter_dir: str = None,
    max_files_per_trigger: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    auto_compact_max_files: int = None,
) -> dict:
    """Replay ``source_dir``'s parquet files as micro-batches and keep the
    dedup state fresh via foreachBatch admissions (availableNow: drain the
    backlog, then stop).  The checkpoint and the state's manifest
    watermark live and die together (the ivm.py contract).
    ``auto_compact_max_files`` (opt-in) bounds the state's delta-file
    counts across arbitrarily many micro-batches — without it a
    long-running feed degrades read cost unboundedly until a manual
    compaction (round-12 verdict ask #2).  Returns {batches_applied,
    admitted, rejected}."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    totals = {"batches_applied": 0, "admitted": 0, "rejected": 0}

    def _step(bdf: DataFrame, bid: int) -> None:
        out = ingest_doc_batch(
            spark, state_dir, bdf, bid,
            dead_letter_dir=dead_letter_dir,
            text_col=text_col, id_col=id_col,
            auto_compact_max_files=auto_compact_max_files,
        )
        if out["applied"]:
            totals["batches_applied"] += 1
            totals["admitted"] += out["admitted"]
            totals["rejected"] += out["rejected"]

    q = (
        stream.writeStream.foreachBatch(_step)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="dagger_dedup_ingest_ck_"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals


def run_dedup_takedown_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint: str = None,
    max_files_per_trigger: int = 2,
    id_col: str = "doc_id",
    auto_compact_max_files: int = None,
) -> dict:
    """The TAKEDOWN feed: replay ``source_dir``'s parquet files of doc ids
    as micro-batches and retire each batch from the state (availableNow).
    Exactly-once by the same manifest-watermark protocol as admissions,
    under the independent stream name 'takedown' — both feeds can drive
    ONE state without their batch-id sequences colliding.  Retiring ids
    that are not live is a documented no-op, so a takedown feed needs no
    dead-letter leg.  Returns {batches_applied, retired}."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    totals = {"batches_applied": 0, "retired": 0}

    def _step(bdf: DataFrame, bid: int) -> None:
        stats = retry_concurrent(
            lambda: retire_docs(
                spark, state_dir, bdf, id_col=id_col,
                batch_id=bid, stream="takedown",
                auto_compact_max_files=auto_compact_max_files,
            )
        )
        if not stats.get("skipped", False):
            totals["batches_applied"] += 1
            totals["retired"] += stats["retired"]

    q = (
        stream.writeStream.foreachBatch(_step)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="dagger_takedown_ck_"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals
