"""Streaming ingest for the IVF index: the foreachBatch leg must leave
the index identical to a batch append of the same delta, surface gate
refusals as dead-letter rows, and be EXACTLY-ONCE under at-least-once
replay (round-12 verdict ask #1: postings files and the batch-id
watermark commit in ONE manifest pointer swing — a crash anywhere
between them is impossible by construction, and a crash BEFORE the
publish replays cleanly with no duplicates and no spurious dead
letters)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.ivf_index import (
    build_sq8_ivf_index,
    delete_from_sq8_ivf_index,
    append_to_sq8_ivf_index,
    live_postings,
    sq8_ivf_topk,
)
from dagger_spark.ops.manifest import read_manifest
from dagger_spark.streaming.ann_ingest import (
    _read_watermark,
    ingest_batch,
    run_ivf_ingest_stream,
    run_ivf_takedown_stream,
)

SF = "/root/testdata/sf0.01"


def _corpus(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )


def _delta(spark, offset=10_000_000):
    """Base rows re-labeled with fresh ids — guaranteed in-grid."""
    return _corpus(spark).filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 64)
    ).select((F.col("vec_id") + offset).alias("vec_id"), "embedding")


@pytest.fixture(scope="module")
def base_index(spark):
    return build_sq8_ivf_index(spark, SF, n_centroids=16)


def _scratch(base_index, name):
    d = f"/tmp/dagger_test_ingest_{name}"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(base_index, d)
    return d


def _rows(spark, idx):
    return sorted(
        tuple(r) for r in sq8_ivf_topk(spark, idx, k=5, nprobe=2).collect()
    )


def test_stream_maintained_equals_batch_appended(
    spark, base_index, tmp_path
):
    src = str(tmp_path / "feed")
    _delta(spark).repartition(6).write.parquet(src)
    streamed = _scratch(base_index, "stream")
    batched = _scratch(base_index, "batch")

    totals = run_ivf_ingest_stream(
        spark, src, streamed,
        checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=2,
        auto_compact_max_files=4,
    )
    assert totals["batches_applied"] >= 3  # genuinely incremental
    assert totals["appended"] == 48 and totals["rejected"] == 0

    append_to_sq8_ivf_index(spark, batched, _delta(spark))
    assert _rows(spark, streamed) == _rows(spark, batched)

    # resuming the SAME checkpoint finds nothing new — and a forged
    # replay of an already-applied batch id is skipped by the watermark
    again = run_ivf_ingest_stream(
        spark, src, streamed, checkpoint=str(tmp_path / "ck")
    )
    assert again["batches_applied"] == 0
    wm = _read_watermark(streamed)
    out = ingest_batch(spark, streamed, _delta(spark, 77_000_000), wm)
    assert out == {"applied": False, "appended": 0, "rejected": 0}
    assert _rows(spark, streamed) == _rows(spark, batched)
    shutil.rmtree(streamed, ignore_errors=True)
    shutil.rmtree(batched, ignore_errors=True)


def test_gate_refusals_become_dead_letters(spark, base_index, tmp_path):
    """Out-of-grid vectors and tombstoned ids must not poison the batch:
    they land in the dead-letter dir with a reason, the clean remainder
    is appended, and the stream keeps draining."""
    scratch = _scratch(base_index, "dlq")
    # a live tombstone on one id the feed will try to reuse
    reuse_id = 20
    delete_from_sq8_ivf_index(
        spark, scratch,
        ids=spark.createDataFrame([(reuse_id,)], "vec_id long"),
    )
    good = _delta(spark, 20_000_000)
    oob = _corpus(spark).filter(F.col("vec_id") == 17).select(
        F.lit(30_000_000).cast("long").alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * 1000.0,
        ).alias("embedding"),
    )
    tombed = _corpus(spark).filter(F.col("vec_id") == reuse_id).select(
        F.col("vec_id"), "embedding"
    )
    feed = good.unionByName(oob).unionByName(tombed)
    src = str(tmp_path / "feed")
    feed.coalesce(1).write.parquet(src)
    dlq = str(tmp_path / "dlq")

    totals = run_ivf_ingest_stream(
        spark, src, scratch,
        checkpoint=str(tmp_path / "ck"),
        dead_letter_dir=dlq,
    )
    assert totals["appended"] == 48
    assert totals["rejected"] == 2
    dead = {
        (r["vec_id"], r["reject_reason"])
        for r in spark.read.parquet(dlq).collect()
    }
    assert dead == {
        (30_000_000, "out_of_grid"),
        (reuse_id, "tombstoned_id"),
    }
    got = _rows(spark, scratch)
    ids = {r[1] for r in got}
    assert 30_000_000 not in ids
    assert any(i >= 20_000_000 for i in ids)  # the clean delta landed
    shutil.rmtree(scratch, ignore_errors=True)


def test_null_and_duplicate_rows_handled(spark, base_index, tmp_path):
    """Review r12: a NULL-embedding row must dead-letter (not silently
    vanish from both splits), within-batch duplicate ids collapse to one
    append, and a cross-batch resend of an already-live id dead-letters
    as live_id instead of appending a duplicate postings row."""
    scratch = _scratch(base_index, "nulldup")
    dlq = str(tmp_path / "dlq")
    one = _delta(spark, 40_000_000).limit(1)
    nulls = one.select(
        (F.col("vec_id") + 1).alias("vec_id"),
        F.lit(None).cast("array<double>").alias("embedding"),
    )
    batch = one.unionByName(one).unionByName(nulls)  # dup + null
    out = ingest_batch(spark, scratch, batch, 0, dead_letter_dir=dlq)
    assert out == {"applied": True, "appended": 1, "rejected": 1}
    dead = spark.read.parquet(dlq).collect()
    assert len(dead) == 1 and dead[0]["reject_reason"] == "out_of_grid"
    # accounting: every input row is either appended or dead-lettered
    # (the within-batch duplicate collapses by design)
    # cross-batch resend: the id is live now -> dead-letter, no dup row
    out2 = ingest_batch(spark, scratch, one, 1, dead_letter_dir=dlq)
    assert out2 == {"applied": True, "appended": 0, "rejected": 1}
    dead2 = {
        (r["vec_id"], r["reject_reason"], r["batch_id"])
        for r in spark.read.parquet(dlq).collect()
    }
    live_id = one.collect()[0]["vec_id"]
    assert (live_id, "live_id", 1) in dead2
    n_rows = (
        live_postings(spark, scratch)
        .filter(F.col("vec_id") == live_id).count()
    )
    assert n_rows == 1  # never duplicated
    shutil.rmtree(scratch, ignore_errors=True)


def test_null_id_rows_dead_letter(spark, base_index, tmp_path):
    """Advice r12: a NULL vec_id made the tombstone isin-gate NULL and
    the row silently vanished from both splits (or appended with a NULL
    id when no tombstones existed).  It must dead-letter as 'null_id'."""
    scratch = _scratch(base_index, "nullid")
    dlq = str(tmp_path / "dlq")
    good = _delta(spark, 50_000_000).limit(2)
    nullid = good.limit(1).select(
        F.lit(None).cast("long").alias("vec_id"), "embedding"
    )
    out = ingest_batch(
        spark, scratch, good.unionByName(nullid), 0, dead_letter_dir=dlq
    )
    assert out == {"applied": True, "appended": 2, "rejected": 1}
    dead = spark.read.parquet(dlq).collect()
    assert len(dead) == 1 and dead[0]["reject_reason"] == "null_id"
    assert dead[0]["vec_id"] is None
    # and no NULL-id posting ever landed
    assert live_postings(spark, scratch).filter(
        F.col("vec_id").isNull()
    ).count() == 0
    shutil.rmtree(scratch, ignore_errors=True)


def test_crash_before_publish_replays_exactly_once(
    spark, base_index, tmp_path, monkeypatch
):
    """The round-12 verdict's done-criterion: a crash in what used to be
    the append->watermark window must, on replay, produce NO duplicate
    postings and NO spurious dead letters.  With the manifest protocol
    the 'window' is a crash before the single pointer swing: the staged
    files are orphans, the watermark unmoved, and the replayed batch
    applies as if the first attempt never happened."""
    import dagger_spark.ops.ivf_index as ivf

    scratch = _scratch(base_index, "crashwin")
    batched = _scratch(base_index, "crashwin_twin")
    dlq = str(tmp_path / "dlq")
    delta = _delta(spark, 60_000_000)

    real_publish = ivf.publish_manifest
    state = {"armed": True}

    def crashing_publish(state_dir, manifest):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("simulated crash before pointer swing")
        return real_publish(state_dir, manifest)

    monkeypatch.setattr(ivf, "publish_manifest", crashing_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(spark, scratch, delta, 0, dead_letter_dir=dlq)
    # nothing committed: watermark unmoved, no live rows from the delta
    assert _read_watermark(scratch) is None
    assert live_postings(spark, scratch).filter(
        F.col("vec_id") >= 60_000_000
    ).count() == 0

    # replay the SAME batch id (publish now works)
    out = ingest_batch(spark, scratch, delta, 0, dead_letter_dir=dlq)
    assert out == {"applied": True, "appended": 48, "rejected": 0}
    assert _read_watermark(scratch) == 0
    assert not os.path.exists(dlq)  # no dead letters, first try or replay
    # no duplicates: exactly one live row per delta id, results == batch twin
    dup = (
        live_postings(spark, scratch)
        .filter(F.col("vec_id") >= 60_000_000)
        .groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    append_to_sq8_ivf_index(spark, batched, delta)
    assert _rows(spark, scratch) == _rows(spark, batched)
    # the orphaned crash files are swept by the next compaction's GC
    from dagger_spark.ops.ivf_index import compact_sq8_ivf_index

    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=99)
    assert stats["gc_files"] > 0
    assert _rows(spark, scratch) == _rows(spark, batched)
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(batched, ignore_errors=True)


def test_takedown_stream_exactly_once_and_independent(
    spark, base_index, tmp_path
):
    """The takedown feed (named stream 'takedown'): retires ids from the
    index exactly-once, keeps its watermark independent of the ingest
    feed's, no-ops on absent ids, and a checkpoint resume finds nothing
    new."""
    scratch = _scratch(base_index, "takedown")
    # ingest a delta first under the 'ingest' stream
    feed = str(tmp_path / "feed")
    _delta(spark, 70_000_000).repartition(2).write.parquet(feed)
    run_ivf_ingest_stream(
        spark, feed, scratch, checkpoint=str(tmp_path / "ick")
    )
    assert _read_watermark(scratch, "ingest") is not None

    # takedown: half the delta ids + some absent ids
    kill = [70_000_016 + i for i in range(8)] + [999_999_999]
    td = str(tmp_path / "td")
    spark.createDataFrame([(i,) for i in kill], "vec_id long").repartition(
        2
    ).write.parquet(td)
    totals = run_ivf_takedown_stream(
        spark, td, scratch, checkpoint=str(tmp_path / "tck")
    )
    assert totals["deleted"] == 8  # the absent id recorded nothing
    m = read_manifest(scratch)
    assert m["watermarks"]["takedown"] is not None
    assert m["watermarks"]["ingest"] is not None  # preserved, not clobbered
    got_ids = {r[1] for r in _rows(spark, scratch)}
    assert not (got_ids & set(kill))
    # resume: nothing new
    again = run_ivf_takedown_stream(
        spark, td, scratch, checkpoint=str(tmp_path / "tck")
    )
    assert again["batches_applied"] == 0
    shutil.rmtree(scratch, ignore_errors=True)
