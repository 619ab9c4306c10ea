"""Streaming ingest for the IVF index (round-11 verdict ask #4): the
foreachBatch leg must leave the index identical to a batch append of the
same delta, surface gate refusals as dead-letter rows, and skip replayed
micro-batches via the ingest watermark."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.ivf_index import (
    build_sq8_ivf_index,
    delete_from_sq8_ivf_index,
    append_to_sq8_ivf_index,
    sq8_ivf_topk,
)
from dagger_spark.streaming.ann_ingest import (
    _read_watermark,
    ingest_batch,
    run_ivf_ingest_stream,
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
        spark.read.parquet(os.path.join(scratch, "postings"))
        .filter(F.col("vec_id") == live_id).count()
    )
    assert n_rows == 1  # never duplicated
    shutil.rmtree(scratch, ignore_errors=True)
