"""Streaming ingest for the materialized IVF+SQ8 index (round-11 verdict
ask #4): the ``streaming/ivm.py`` foreachBatch pattern applied to
``ops/ivf_index.py`` — the deployment shape that keeps a 100 TB vector
index fresh under a continuous embedding feed.

Each micro-batch of (vec_id, embedding[, label]) rows is:

1. **Pre-gated** by ``split_in_grid``: rows outside the frozen SQ8 grid,
   and ids carrying a live tombstone (the id-reuse rule), are split off
   as DEAD-LETTER rows — written with a ``reject_reason`` and the batch
   id under ``dead_letter_dir`` — instead of poisoning the whole batch
   the way the transactional ``append_to_sq8_ivf_index`` gate rightly
   does for a batch caller.  A stream must keep draining; refusals
   become data.
2. **Appended** via ``append_to_sq8_ivf_index`` (delta-cost: frozen
   grid/centroids as plan literals, partitioned postings append), with
   opt-in auto-compaction bounding per-cell file counts across
   arbitrarily many micro-batches.
3. **Watermarked**: the index dir carries an ``_INGEST_WATERMARK`` file
   (tmp+rename) recording the last applied micro-batch id, so an
   at-least-once replay (crash between the foreachBatch commit and the
   stream's checkpoint write) is recognized (id <= watermark) and
   skipped rather than double-appended — the ``streaming/ivm.py``
   pointer discipline.  The residual window — a crash AFTER the parquet
   append but BEFORE the watermark rename — is one rename wide; on
   replay the LIVE-ID GATE (ids already in the index dead-letter as
   'live_id' instead of re-appending) degrades it from silent duplicate
   postings to visible dead-letter rows.  Fully transactional
   commit-together semantics would need a table format whose manifest
   owns the data files (Delta/Iceberg MERGE — or this repo's dedup
   state, ops/dedup_state.py, whose manifest gives its ingest leg
   exactly-once outright).

Stream-maintained == batch-built is pinned by
tests/test_ann_ingest.py.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.ivf_index import append_to_sq8_ivf_index, split_in_grid

_WATERMARK = "_INGEST_WATERMARK"


def _read_watermark(index_dir: str):
    p = os.path.join(index_dir, _WATERMARK)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        s = f.read().strip()
    return int(s) if s else None


def _write_watermark(index_dir: str, batch_id: int) -> None:
    p = os.path.join(index_dir, _WATERMARK)
    tmp = f"{p}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.rename(tmp, p)


def ingest_batch(
    spark: SparkSession,
    index_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    dead_letter_dir: str = None,
    auto_compact_max_files: int = None,
) -> dict:
    """One micro-batch step (exposed for direct replay tests): gate,
    dead-letter, append, watermark.  Returns {applied, appended,
    rejected}."""
    wm = _read_watermark(index_dir)
    if wm is not None and batch_id <= wm:
        return {"applied": False, "appended": 0, "rejected": 0}
    # within-batch duplicate ids keep one row (producer retries are the
    # common at-least-once artifact — review r12); cross-batch resends
    # are caught by the live-id gate below
    ok, bad = split_in_grid(
        spark, index_dir, batch_df.dropDuplicates(["vec_id"])
    )
    # live-id gate: ids already IN the index dead-letter instead of
    # appending duplicate postings rows.  One vec_id-column postings scan
    # per micro-batch (row-group stats / bloom at 100 TB); the live set
    # is batch-bounded, so the isin split stays cheap.  This also turns
    # the crash-replay window (a batch whose append landed but whose
    # watermark rename did not) from silent duplicates into dead-letter
    # rows — the replayed rows are live now.
    post_ids = spark.read.parquet(os.path.join(index_dir, "postings"))
    live = [
        r["vec_id"]
        for r in post_ids.join(
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
    # the delta is read three ways (reject write, append, count) — persist
    # so the gate expressions run once per row
    ok = ok.persist()
    bad = bad.persist()
    try:
        n_bad = bad.count()
        if n_bad and dead_letter_dir:
            bad.withColumn("batch_id", F.lit(batch_id).cast("long")).coalesce(
                1
            ).write.mode("append").parquet(dead_letter_dir)
        n_ok = ok.count()
        if n_ok:
            append_to_sq8_ivf_index(
                spark, index_dir, ok,
                auto_compact_max_files=auto_compact_max_files,
            )
        _write_watermark(index_dir, batch_id)
        return {"applied": True, "appended": n_ok, "rejected": n_bad}
    finally:
        ok.unpersist()
        bad.unpersist()


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
    then stop).  The checkpoint and the index watermark must live and die
    together — resuming an old checkpoint against a fresh index would skip
    everything; a fresh checkpoint against an ingested index would replay
    the source, which the watermark then rejects batch-by-batch.  Returns
    {batches_applied, appended, rejected}."""
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
