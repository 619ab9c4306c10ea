"""Streaming ingest for the dedup state: foreachBatch admissions must
leave the state indistinguishable from a from-scratch build over the
full corpus, refusals become dead-letter rows, and the manifest
watermark makes replays exactly-once (the pointer swing commits delta
files and watermark together — no ann_ingest-style crash window)."""

import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from dagger_spark.ops.dedup_state import (
    _read_manifest,
    build_dedup_state,
    retire_docs,
    state_clusters,
    state_pairs,
)
from dagger_spark.sources.files import load_table
from dagger_spark.streaming.dedup_ingest import (
    ingest_doc_batch,
    run_dedup_ingest_stream,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def base_state(spark):
    """State over the corpus WITHOUT the delta slice, fresh per test."""
    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    d = build_dedup_state(spark, SF, corpus=base, tag="t_ingest")
    if _read_manifest(d)["seq"] > 0 or _read_manifest(d).get("watermarks"):
        shutil.rmtree(d, ignore_errors=True)
        d = build_dedup_state(spark, SF, corpus=base, tag="t_ingest")
    return d


def test_stream_admitted_equals_full_build(spark, base_state, tmp_path):
    docs = load_table(spark, SF, "documents")
    delta = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "feed")
    delta.repartition(5).write.parquet(src)
    totals = run_dedup_ingest_stream(
        spark, src, base_state,
        checkpoint=str(tmp_path / "ck"), max_files_per_trigger=1,
    )
    assert totals["batches_applied"] >= 3  # genuinely incremental
    assert totals["admitted"] == delta.count()
    assert totals["rejected"] == 0
    assert _rows(state_clusters(spark, base_state)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )
    assert _rows(state_pairs(spark, base_state)) == _rows(
        QUERIES["minhash_pairs_docs"].fn(spark, SF)
    )
    # resuming the same checkpoint finds nothing new; a forged replay of
    # an applied batch id is skipped by the manifest watermark
    again = run_dedup_ingest_stream(
        spark, src, base_state, checkpoint=str(tmp_path / "ck")
    )
    assert again["batches_applied"] == 0
    wm = _read_manifest(base_state)["watermarks"]["ingest"]
    out = ingest_doc_batch(spark, base_state, delta, wm)
    assert out == {"applied": False, "admitted": 0, "rejected": 0}


def test_refusals_become_dead_letters(spark, base_state, tmp_path):
    docs = load_table(spark, SF, "documents")
    live_id = docs.filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 1
    ).agg(F.min("doc_id")).collect()[0][0]
    retire_docs(
        spark, base_state,
        spark.createDataFrame([(int(live_id),)], "doc_id long"),
    )
    fresh = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    )
    live_row = docs.filter(F.col("doc_id") == live_id + 10).select(
        "doc_id", "text"
    )  # mod-1 slice stayed live
    retired_row = docs.filter(F.col("doc_id") == live_id).select(
        "doc_id", "text"
    )
    feed = fresh.unionByName(live_row).unionByName(retired_row)
    src = str(tmp_path / "feed")
    feed.coalesce(1).write.parquet(src)
    dlq = str(tmp_path / "dlq")
    totals = run_dedup_ingest_stream(
        spark, src, base_state,
        checkpoint=str(tmp_path / "ck"), dead_letter_dir=dlq,
    )
    assert totals["admitted"] == fresh.count()
    assert totals["rejected"] == 2
    dead = {
        (r["doc_id"], r["reject_reason"])
        for r in spark.read.parquet(dlq).collect()
    }
    assert dead == {
        (live_id + 10, "live_id"),
        (live_id, "retired_id"),
    }


def test_all_rejected_batch_still_advances_watermark(
    spark, base_state, tmp_path
):
    """A batch whose every row is dead-lettered must still move the
    manifest watermark, or its replay would re-emit the dead letters."""
    docs = load_table(spark, SF, "documents")
    live_only = docs.filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 2
    ).limit(3).select("doc_id", "text")
    dlq = str(tmp_path / "dlq")
    out = ingest_doc_batch(spark, base_state, live_only, 0, dead_letter_dir=dlq)
    assert out["rejected"] == 3 and out["admitted"] == 0
    assert _read_manifest(base_state)["watermarks"]["ingest"] == 0
    replay = ingest_doc_batch(
        spark, base_state, live_only, 0, dead_letter_dir=dlq
    )
    assert replay == {"applied": False, "admitted": 0, "rejected": 0}
    assert spark.read.parquet(dlq).count() == 3  # not re-emitted


def test_takedown_stream_and_independent_watermarks(
    spark, base_state, tmp_path
):
    """Admission and takedown feeds drive ONE state: each owns its named
    manifest watermark, so their batch-id sequences (both monotone from
    0) never collide; takedown-streamed state == reduced recompute."""
    from dagger_spark.streaming.dedup_ingest import run_dedup_takedown_stream

    docs = load_table(spark, SF, "documents")
    delta = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    )
    src_in = str(tmp_path / "feed_in")
    delta.repartition(2).write.parquet(src_in)
    run_dedup_ingest_stream(
        spark, src_in, base_state, checkpoint=str(tmp_path / "ck_in")
    )
    # takedown feed retires the mod-3 slice (batch ids restart at 0 —
    # the collision the named watermarks exist to prevent)
    src_out = str(tmp_path / "feed_out")
    docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3).select(
        "doc_id"
    ).repartition(2).write.parquet(src_out)
    totals = run_dedup_takedown_stream(
        spark, src_out, base_state, checkpoint=str(tmp_path / "ck_out"),
        max_files_per_trigger=1,
    )
    assert totals["batches_applied"] == 2
    m = _read_manifest(base_state)
    assert set(m["watermarks"]) == {"ingest", "takedown"}
    # the takedown feed's low batch ids did NOT get skipped by the
    # admission watermark (which is >= them), and vice versa
    want = sorted(
        tuple(r)
        for r in QUERIES["dedup_retire_clusters_docs"].fn(spark, SF).collect()
    )
    assert _rows(state_clusters(spark, base_state)) == want
    # replaying the takedown checkpoint is a no-op
    again = run_dedup_takedown_stream(
        spark, src_out, base_state, checkpoint=str(tmp_path / "ck_out")
    )
    assert again["batches_applied"] == 0
    assert _rows(state_clusters(spark, base_state)) == want


def test_streamed_ingest_auto_compacts(spark, base_state, tmp_path):
    """The streaming wire-up of round-12 verdict ask #2: a many-batch
    feed with auto_compact_max_files keeps the state's manifest file
    counts bounded with NO manual compact, and the admitted state still
    equals the full-corpus recompute."""
    docs = load_table(spark, SF, "documents")
    delta = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "feed")
    delta.repartition(8).write.parquet(src)  # 8 files, 1/trigger
    totals = run_dedup_ingest_stream(
        spark, src, base_state,
        checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=1,
        auto_compact_max_files=2,
    )
    assert totals["batches_applied"] == 8  # genuinely many micro-batches
    m = _read_manifest(base_state)
    assert max(
        len(m["buckets"]), len(m["pairs"]),
        len(m["cluster_overrides"]), len(m["retired"]),
    ) <= 2
    # watermark survived every fold — a replay is still recognized
    out = ingest_doc_batch(spark, base_state, delta, 0)
    assert out["applied"] is False
    want = sorted(
        tuple(r)
        for r in QUERIES["dedup_clusters_docs"].fn(spark, SF).collect()
    )
    assert _rows(state_clusters(spark, base_state)) == want


def test_concurrent_lease_holder_waited_out(spark, base_state, tmp_path):
    """Advice r12: a takedown feed holding the writer lease must not kill
    the admission stream — ingest_doc_batch waits it out with bounded
    backoff (retry_concurrent) and then applies."""
    import threading

    from dagger_spark.ops.lease import writer_lease

    docs = load_table(spark, SF, "documents")
    delta = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        "doc_id", "text"
    ).limit(4)
    hold = writer_lease(base_state)
    hold.__enter__()
    t = threading.Timer(1.5, lambda: hold.__exit__(None, None, None))
    t.start()
    try:
        out = ingest_doc_batch(spark, base_state, delta, 0)
    finally:
        t.cancel()
        hold.__exit__(None, None, None)
    assert out["applied"] is True and out["admitted"] == 4
