"""Streaming IVM parity (round-10 verdict ask #6): the foreachBatch-
maintained hourly rollup state over a micro-batch replay must equal the
batch recompute — the Structured Streaming deployment shape of
events_incremental_rollup's merge algebra."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.sources.files import load_table
from dagger_spark.streaming.ivm import (
    merge_rollup_partial,
    read_rollup_state,
    run_incremental_rollup_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """The events table re-laid as 8 parquet files so the file source
    replays it as multiple micro-batches (2 files per trigger -> 4)."""
    d = str(tmp_path_factory.mktemp("ivm_events"))
    out = os.path.join(d, "files")
    load_table(spark, SF, "events").repartition(8).write.parquet(out)
    return out


def _batch_recompute(spark):
    ev = load_table(spark, SF, "events")
    return sorted(
        tuple(r)
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .collect()
    )


def test_stream_maintained_equals_batch_recomputed(
    spark, events_stream_dir, tmp_path
):
    state_dir = str(tmp_path / "state")
    n_batches = run_incremental_rollup_stream(
        spark,
        events_stream_dir,
        state_dir,
        checkpoint=str(tmp_path / "ck"),
        max_files_per_trigger=2,
    )
    # the parity claim is only meaningful if the state was actually built
    # INCREMENTALLY across several merges
    assert n_batches >= 3, n_batches
    got = sorted(tuple(r) for r in read_rollup_state(spark, state_dir).collect())
    assert got == _batch_recompute(spark)
    # exactly one live snapshot remains (old versions pruned)
    versions = [d for d in os.listdir(state_dir) if d.startswith("v")]
    assert len(versions) == 1


def test_merge_is_pure_state_plus_delta(spark, tmp_path):
    """Drive the merge step directly: merging the delta into yesterday's
    state must equal aggregating everything at once (the algebra the
    streaming run relies on), and each merge publishes a fresh version."""
    from dagger_spark.streaming.ivm import _current_version, _partial

    ev = load_table(spark, SF, "events")
    state_dir = str(tmp_path / "s2")
    merge_rollup_partial(
        spark, state_dir,
        _partial(ev.filter(F.pmod(F.col("event_id"), F.lit(10)) != 0)),
    )
    assert _current_version(state_dir) == "v1"
    merge_rollup_partial(
        spark, state_dir,
        _partial(ev.filter(F.pmod(F.col("event_id"), F.lit(10)) == 0)),
    )
    assert _current_version(state_dir) == "v2"
    got = sorted(
        tuple(r) for r in read_rollup_state(spark, state_dir).collect()
    )
    assert got == _batch_recompute(spark)


def test_reader_refuses_unpublished_state(spark, tmp_path):
    with pytest.raises(ValueError, match="no published rollup state"):
        read_rollup_state(spark, str(tmp_path / "nope"))


def test_interrupted_merge_leaves_previous_version_live(spark, tmp_path):
    """Crash discipline: a snapshot dir written WITHOUT the pointer swing
    (the crash window) must be invisible to readers — the previous
    version stays authoritative."""
    from dagger_spark.streaming.ivm import _partial

    ev = load_table(spark, SF, "events")
    state_dir = str(tmp_path / "s3")
    merge_rollup_partial(spark, state_dir, _partial(ev))
    before = sorted(
        tuple(r) for r in read_rollup_state(spark, state_dir).collect()
    )
    # simulate the crash: v2 data lands, pointer never swings
    half = _partial(ev.limit(10))
    half.write.parquet(os.path.join(state_dir, "v2"))
    after = sorted(
        tuple(r) for r in read_rollup_state(spark, state_dir).collect()
    )
    assert after == before
    shutil.rmtree(state_dir, ignore_errors=True)


def test_direct_merge_preserves_batch_watermark(spark, tmp_path):
    """Advice r11: a direct-call merge (batch_id=None) on a state dir that
    already carries a batch watermark must PRESERVE it — otherwise a later
    stream resume from an existing checkpoint would re-apply replayed
    micro-batches and double-count."""
    from dagger_spark.streaming.ivm import _partial, _pointer

    ev = load_table(spark, SF, "events")
    state_dir = str(tmp_path / "s4")
    merge_rollup_partial(
        spark, state_dir, _partial(ev.limit(50)), batch_id=7
    )
    assert _pointer(state_dir) == ("v1", 7)
    # out-of-band correction merged without a batch id
    merge_rollup_partial(spark, state_dir, _partial(ev.limit(10)))
    assert _pointer(state_dir) == ("v2", 7)  # watermark carried forward
    # a replayed micro-batch (id <= 7) is still recognized and skipped
    assert not merge_rollup_partial(
        spark, state_dir, _partial(ev.limit(10)), batch_id=7
    )
    assert _pointer(state_dir) == ("v2", 7)
    # and the next real batch advances it
    assert merge_rollup_partial(
        spark, state_dir, _partial(ev.limit(10)), batch_id=8
    )
    assert _pointer(state_dir) == ("v3", 8)


def test_stream_maintained_then_retracted_equals_reduced_recompute(
    spark, events_stream_dir, tmp_path
):
    """Round-11 verdict ask #7: build the state via the micro-batch
    stream, then RETRACT a slice through the same pointer protocol —
    the state must equal the batch recompute over the surviving events,
    and a replayed retraction (same batch id) must be skipped."""
    from dagger_spark.streaming.ivm import _pointer, retract_rollup_partial

    state_dir = str(tmp_path / "state_r")
    run_incremental_rollup_stream(
        spark, events_stream_dir, state_dir,
        checkpoint=str(tmp_path / "ck_r"), max_files_per_trigger=2,
    )
    from dagger_spark.streaming.ivm import _watermarks

    ev = load_table(spark, SF, "events")
    retired = ev.filter(F.pmod(F.col("event_id"), F.lit(10)) == 0)
    _, last_bid = _pointer(state_dir)
    # the retraction feed's ids restart at 0 (its own checkpoint) — the
    # named 'retract' watermark means the admission watermark (>= 0)
    # must NOT swallow it (review r12)
    assert retract_rollup_partial(spark, state_dir, retired, batch_id=0)
    _, wms = _watermarks(state_dir)
    assert wms == {"ingest": last_bid, "retract": 0}
    got = sorted(
        tuple(r) for r in read_rollup_state(spark, state_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in ev.filter(F.pmod(F.col("event_id"), F.lit(10)) != 0)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .collect()
    )
    assert got == want
    # at-least-once: the SAME retraction replayed is a no-op
    assert not retract_rollup_partial(spark, state_dir, retired, batch_id=0)
    assert sorted(
        tuple(r) for r in read_rollup_state(spark, state_dir).collect()
    ) == want


def test_retraction_drops_emptied_groups(spark, tmp_path):
    """A group fully retracted must VANISH from the snapshot, not linger
    as a zero row."""
    from dagger_spark.streaming.ivm import _partial, retract_rollup_partial

    ev = load_table(spark, SF, "events")
    one_type = ev.filter(F.col("event_type") == "click")
    state_dir = str(tmp_path / "s_drop")
    merge_rollup_partial(spark, state_dir, _partial(ev))
    retract_rollup_partial(spark, state_dir, one_type)
    types = {
        r["event_type"]
        for r in read_rollup_state(spark, state_dir).collect()
    }
    assert "click" not in types and types
