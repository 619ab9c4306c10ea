"""Streaming ingest for the materialized IVF+SQ8 index: the
``streaming/ivm.py`` foreachBatch pattern applied to ``ops/ivf_index.py``
— the deployment shape that keeps a 100 TB vector index fresh under a
continuous embedding feed.

Each micro-batch of (vec_id, embedding[, label]) rows is:

1. **Pre-gated** by ``split_in_grid``: rows outside the frozen SQ8 grid,
   NULL-id rows, and ids carrying a live tombstone (the id-reuse rule)
   are split off as DEAD-LETTER rows — written with a ``reject_reason``
   and the batch id under ``dead_letter_dir`` — instead of poisoning the
   whole batch the way the transactional ``append_to_sq8_ivf_index``
   gate rightly does for a batch caller.  A stream must keep draining;
   refusals become data.  Ids already live in the index dead-letter as
   'live_id' (no duplicate postings row, ever).
2. **Appended EXACTLY-ONCE** via ``append_batch_exactly_once`` (round-12
   verdict ask #1): the micro-batch's postings files and its batch-id
   watermark — recorded under this stream's NAMED key in the manifest's
   watermarks dict — commit in ONE atomic pointer swing.  There is NO
   crash window between "data visible" and "batch recorded" (the v2
   layout's one-rename gap is gone): a crash mid-append leaves
   unreferenced orphan files and an unchanged manifest, and the replayed
   batch simply applies again; a replayed batch whose publish landed is
   skipped (id <= watermark).  Named streams keep an admission feed and
   a takedown feed (``run_ivf_takedown_stream``) independent on one
   index — their monotone-from-0 batch-id sequences never collide
   (advice r12).
3. The dead-letter side channel lives OUTSIDE the manifest, so ITS
   delivery is at-least-once: a crash between the dead-letter append and
   the manifest commit re-emits that batch's dead letters on replay —
   consumers dedupe on the (batch_id, vec_id) key every row carries
   (the documented contract shared with streaming/dedup_ingest.py).

Concurrency: the gate runs OUTSIDE the writer lease, so a concurrent
takedown can retire one of our "clean" ids between the gate and the
append's own lease-held check — the append then raises, and the retry
loop RE-GATES (turning that row into the dead-letter it should have
been) instead of killing the stream.  A busy lease (the takedown feed
mid-mutation) is waited out with ``retry_concurrent`` bounded backoff
(advice r12) rather than propagating ConcurrentWriterError out of
foreachBatch.

Stream-maintained == batch-built is pinned by tests/test_ann_ingest.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.ivf_index import (
    append_batch_exactly_once,
    live_postings,
    retire_batch_exactly_once,
    split_in_grid,
)
from ..ops.lease import retry_concurrent
from ..ops.manifest import read_manifest, stream_watermark


def _read_watermark(index_dir: str, stream: str = "ingest"):
    """Last applied batch id for ``stream``, straight from the manifest
    (exposed for tests and ops tooling)."""
    return stream_watermark(read_manifest(index_dir), stream)


def ingest_batch(
    spark: SparkSession,
    index_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    dead_letter_dir: str = None,
    auto_compact_max_files: int = None,
    stream: str = "ingest",
) -> dict:
    """One micro-batch step (exposed for direct replay tests): gate,
    dead-letter, append-with-manifest-watermark.  Returns {applied,
    appended, rejected}."""
    # within-batch duplicate ids keep one row (producer retries are the
    # common at-least-once artifact — review r12); cross-batch resends
    # are caught by the live-id gate below
    batch_df = batch_df.dropDuplicates(["vec_id"])
    dead_lettered: set = set()

    # up to TWO gate+append attempts (the dedup_ingest discipline): the
    # gate runs outside the lease, so a concurrent takedown can tombstone
    # one of our clean ids before the append's lease-held check raises —
    # the retry re-gates and dead-letters that row instead of dying.
    for attempt in (0, 1):
        if _already_applied(index_dir, batch_id, stream):
            return {"applied": False, "appended": 0, "rejected": 0}
        ok, bad = split_in_grid(spark, index_dir, batch_df)
        # live-id gate: ids already IN the index dead-letter instead of
        # appending duplicate postings rows.  One manifest-resolved
        # postings scan per micro-batch (vec_id column only — row-group
        # stats / bloom at 100 TB); the live set is batch-bounded, so the
        # isin split stays cheap.
        live = [
            r["vec_id"]
            for r in live_postings(spark, index_dir).join(
                F.broadcast(ok.select("vec_id")), "vec_id", "left_semi"
            ).select("vec_id").distinct().collect()
        ]  # bounded: <= batch size
        if live:
            bad = bad.unionByName(
                ok.filter(F.col("vec_id").isin(live)).select(
                    "vec_id",
                    "embedding",
                    F.lit("live_id").alias("reject_reason"),
                )
            )
            ok = ok.filter(~F.col("vec_id").isin(live))
        ok = ok.persist()
        bad = bad.persist()
        try:
            bad_keys = {
                (r["vec_id"], r["reject_reason"]) for r in bad.collect()
            }  # bounded: <= batch size
            new_bad = bad_keys - dead_lettered
            if new_bad and dead_letter_dir:
                # only NEWLY-bad rows per attempt — a re-gate must not
                # duplicate the first attempt's dead letters.  NULL-id
                # rows need their own predicate: isin never matches NULL.
                ids_new = [k[0] for k in new_bad if k[0] is not None]
                cond = (
                    F.col("vec_id").isin(ids_new) if ids_new else F.lit(False)
                )
                if any(k[0] is None for k in new_bad):
                    cond = cond | F.col("vec_id").isNull()
                bad.filter(cond).withColumn(
                    "batch_id", F.lit(batch_id).cast("long")
                ).coalesce(1).write.mode("append").parquet(dead_letter_dir)
            dead_lettered |= bad_keys
            n_ok = ok.count()
            try:
                out = retry_concurrent(
                    lambda: append_batch_exactly_once(
                        spark, index_dir, ok, batch_id, stream=stream,
                        auto_compact_max_files=auto_compact_max_files,
                    )
                )
            except ValueError:
                if attempt == 1:
                    raise
                continue  # re-gate: a takedown raced us; round two
            if out.get("skipped"):
                return {"applied": False, "appended": 0, "rejected": 0}
            return {
                "applied": True,
                "appended": n_ok,
                "rejected": len(dead_lettered),
            }
        finally:
            ok.unpersist()
            bad.unpersist()


def _already_applied(index_dir: str, batch_id: int, stream: str) -> bool:
    wm = _read_watermark(index_dir, stream)
    return wm is not None and batch_id <= wm


def run_ivf_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint: str = None,
    dead_letter_dir: str = None,
    max_files_per_trigger: int = 2,
    auto_compact_max_files: int = None,
) -> dict:
    """Replay ``source_dir``'s parquet files as micro-batches and keep the
    index fresh via foreachBatch appends (availableNow: drain the backlog,
    then stop).  The checkpoint and the index's manifest watermark must
    live and die together — resuming an old checkpoint against a fresh
    index would skip everything; a fresh checkpoint against an ingested
    index would replay the source, which the watermark then rejects
    batch-by-batch.  Returns {batches_applied, appended, rejected}."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    totals = {"batches_applied": 0, "appended": 0, "rejected": 0}

    def _step(bdf: DataFrame, bid: int) -> None:
        out = ingest_batch(
            spark, index_dir, bdf, bid,
            dead_letter_dir=dead_letter_dir,
            auto_compact_max_files=auto_compact_max_files,
        )
        if out["applied"]:
            totals["batches_applied"] += 1
            totals["appended"] += out["appended"]
            totals["rejected"] += out["rejected"]

    q = (
        stream.writeStream.foreachBatch(_step)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="dagger_ann_ingest_ck_"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals


def run_ivf_takedown_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint: str = None,
    max_files_per_trigger: int = 2,
    id_col: str = "vec_id",
) -> dict:
    """The TAKEDOWN feed (the dedup state's twin): replay parquet files of
    vector ids as micro-batches and tombstone each batch from the index
    (availableNow).  Exactly-once by the same manifest-watermark protocol
    as admissions, under the independent stream name 'takedown' — both
    feeds can drive ONE index without their batch-id sequences colliding,
    and a busy admission lease is waited out with bounded backoff.  Ids
    not present in the index drop out in the postings lookup (nothing
    recorded — an out-of-order takedown never blocks a later append), so
    this feed needs no dead-letter leg.  Returns {batches_applied,
    deleted}."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    totals = {"batches_applied": 0, "deleted": 0}

    def _step(bdf: DataFrame, bid: int) -> None:
        out = retry_concurrent(
            lambda: retire_batch_exactly_once(
                spark, index_dir, bdf, bid, stream="takedown", id_col=id_col
            )
        )
        if not out.get("skipped", False):
            totals["batches_applied"] += 1
            totals["deleted"] += out["deleted"]

    q = (
        stream.writeStream.foreachBatch(_step)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="dagger_ann_takedown_ck_"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals
