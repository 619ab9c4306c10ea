"""Dedup state at rest (round-11 verdict ask #2): the materialized
bucket/pair/cluster state dir (ops/dedup_state.py) must equal the
catalog's from-scratch recomputes after every lifecycle step — build,
admit (merges), retire (splits), compact — and enforce the manifest/
pointer crash discipline, the id-reuse gates, and the single-writer
lease the IVF index lifecycle already pins."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from dagger_spark.ops.dedup_state import (
    _read_manifest,
    admit_docs,
    build_dedup_state,
    compact_dedup_state,
    retire_docs,
    state_buckets,
    state_clusters,
    state_dir_for,
    state_pairs,
)
from dagger_spark.ops.lease import ConcurrentWriterError, writer_lease
from dagger_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"

def _IS_DELTA():
    return F.pmod(F.col("doc_id"), F.lit(10)) == 0


def _IS_RETIRED():
    return F.pmod(F.col("doc_id"), F.lit(10)) == 3


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def full_state(spark):
    """The canonical full-corpus state (shared with the catalog twins —
    fingerprint-cached, so repeated suite runs reuse it)."""
    return build_dedup_state(spark, SF)


@pytest.fixture()
def scratch_state(spark, full_state):
    d = "/tmp/dagger_test_dedup_state_scratch"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(full_state, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_build_matches_catalog_recompute(spark, full_state):
    assert _rows(state_pairs(spark, full_state)) == _rows(
        QUERIES["minhash_pairs_docs"].fn(spark, SF)
    )
    assert _rows(state_clusters(spark, full_state)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )


def test_admission_equals_full_recompute(spark, docs):
    """Build without the delta slice, admit it -> indistinguishable from
    clustering the full corpus from scratch (the catalog twin's verbatim
    oracle), including cluster MERGES."""
    d = build_dedup_state(
        spark, SF, corpus=docs.filter(~_IS_DELTA()), tag="t_admit"
    )
    # make the fixture re-runnable: a previous run already admitted
    if _read_manifest(d)["seq"] > 0:
        shutil.rmtree(d, ignore_errors=True)
        d = build_dedup_state(
            spark, SF, corpus=docs.filter(~_IS_DELTA()), tag="t_admit"
        )
    stats = admit_docs(spark, d, docs.filter(_IS_DELTA()))
    assert stats["admitted"] == docs.filter(_IS_DELTA()).count()
    assert stats["version"] == 2
    assert _rows(state_clusters(spark, d)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )
    assert _rows(state_pairs(spark, d)) == _rows(
        QUERIES["minhash_pairs_docs"].fn(spark, SF)
    )


def test_retirement_equals_reduced_recompute(spark, scratch_state, docs):
    """Retire a slice from the full state -> indistinguishable from
    clustering the reduced corpus (the catalog twin's oracle), including
    cluster SPLITS; pair state sheds every pair touching the slice."""
    retire_docs(spark, scratch_state, docs.filter(_IS_RETIRED()))
    assert _rows(state_clusters(spark, scratch_state)) == _rows(
        QUERIES["dedup_retire_clusters_docs"].fn(spark, SF)
    )
    assert _rows(state_pairs(spark, scratch_state)) == _rows(
        QUERIES["minhash_retire_pairs_docs"].fn(
            spark, SF
        ).select("id_a", "id_b")
    )


def test_compaction_folds_and_gc(spark, scratch_state, docs):
    """Compaction: results unchanged, tombstone/override sets drained,
    crash leftovers garbage-collected AT ONCE, but the previous
    version's files retained for one cycle (a reader that resolved the
    old manifest must be able to finish) and swept by the NEXT
    compaction."""
    retire_docs(
        spark, scratch_state,
        docs.filter(_IS_RETIRED()).limit(20).select("doc_id"),
    )
    before_c = _rows(state_clusters(spark, scratch_state))
    before_p = _rows(state_pairs(spark, scratch_state))
    # crash leftover: a data dir no manifest references
    orphan = os.path.join(scratch_state, "buckets", "d999999")
    os.makedirs(orphan)
    old_base = os.path.join(scratch_state, "buckets", "base")
    old_retired = _read_manifest(scratch_state)["retired"][0]
    stats = compact_dedup_state(spark, scratch_state)
    assert stats["gc_dirs"] == 1  # ONLY the orphan: prior version retained
    assert not os.path.exists(orphan)
    assert os.path.exists(old_base)  # one-cycle retention
    assert os.path.exists(os.path.join(scratch_state, old_retired))
    m = _read_manifest(scratch_state)
    assert m["retired"] == [] and m["cluster_overrides"] == []
    assert len(m["buckets"]) == 1 and len(m["pairs"]) == 1
    assert _rows(state_clusters(spark, scratch_state)) == before_c
    assert _rows(state_pairs(spark, scratch_state)) == before_p
    # the second compaction sweeps the retained generation
    compact_dedup_state(spark, scratch_state)
    assert not os.path.exists(old_base)
    assert not os.path.exists(os.path.join(scratch_state, old_retired))
    assert _rows(state_clusters(spark, scratch_state)) == before_c


def test_admit_refuses_live_and_uncompacted_retired_ids(
    spark, scratch_state, docs
):
    live = docs.filter(F.col("doc_id") < 5)
    with pytest.raises(ValueError, match="already live"):
        admit_docs(spark, scratch_state, live)
    retire_docs(spark, scratch_state, live.select("doc_id"))
    with pytest.raises(ValueError, match="retired but not yet compacted"):
        admit_docs(spark, scratch_state, live)
    # compaction drains the tombstones -> re-admission is legal and
    # restores the original state exactly
    before = _rows(state_clusters(spark, scratch_state))
    compact_dedup_state(spark, scratch_state)
    admit_docs(spark, scratch_state, live)
    after_readmit = _rows(state_clusters(spark, scratch_state))
    assert after_readmit != before  # the five docs are back
    assert _rows(state_clusters(spark, scratch_state)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )


def test_unpublished_files_invisible(spark, scratch_state):
    """Crash window: data dirs written without a pointer swing must not
    change any reader's view."""
    before = _rows(state_clusters(spark, scratch_state))
    spark.createDataFrame(
        [(1, 0, "deadbeef")], "id long, band int, bucket string"
    ).write.parquet(os.path.join(scratch_state, "buckets", "d000042"))
    spark.createDataFrame(
        [(0, 999999, 42)], "doc_id long, cluster long, seq long"
    ).write.parquet(os.path.join(scratch_state, "clusters", "o000042"))
    assert _rows(state_clusters(spark, scratch_state)) == before


def test_pointer_swing_is_the_commit_point(spark, scratch_state, docs):
    """Rolling the pointer back to the pre-mutation manifest restores the
    pre-mutation view — versions are immutable snapshots."""
    m0 = _read_manifest(scratch_state)["__name"]
    before = _rows(state_clusters(spark, scratch_state))
    retire_docs(
        spark, scratch_state, docs.limit(10).select("doc_id")
    )
    assert _rows(state_clusters(spark, scratch_state)) != before
    with open(os.path.join(scratch_state, "_CURRENT"), "w") as f:
        f.write(m0)
    assert _rows(state_clusters(spark, scratch_state)) == before


def test_mutations_take_the_writer_lease(spark, scratch_state, docs):
    with writer_lease(scratch_state):
        with pytest.raises(ConcurrentWriterError):
            retire_docs(
                spark, scratch_state, docs.limit(1).select("doc_id")
            )
        with pytest.raises(ConcurrentWriterError):
            admit_docs(
                spark, scratch_state,
                docs.limit(1).select(
                    (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
                ),
            )
        with pytest.raises(ConcurrentWriterError):
            compact_dedup_state(spark, scratch_state)
    assert not os.path.exists(os.path.join(scratch_state, "_LOCK"))


def test_empty_delta_is_a_noop(spark, scratch_state, docs):
    v0 = _read_manifest(scratch_state)["version"]
    stats = admit_docs(spark, scratch_state, docs.filter(F.lit(False)))
    assert stats == {
        "admitted": 0, "new_pairs": 0,
        "affected_components": 0, "version": v0,
    }
    assert _read_manifest(scratch_state)["version"] == v0


def test_two_stacked_admissions_latest_override_wins(spark, docs):
    """Two sequential admissions whose affected components overlap: the
    per-doc LATEST override (by seq) must win, and the final state must
    equal the full recompute."""
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 2)
    w1 = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 1)
    w0 = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    d = build_dedup_state(spark, SF, corpus=base, tag="t_stack")
    if _read_manifest(d)["seq"] > 0:
        shutil.rmtree(d, ignore_errors=True)
        d = build_dedup_state(spark, SF, corpus=base, tag="t_stack")
    admit_docs(spark, d, w1)
    admit_docs(spark, d, w0)
    m = _read_manifest(d)
    assert len(m["cluster_overrides"]) == 2
    assert _rows(state_clusters(spark, d)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )


def test_admission_bucket_filter_reaches_the_scan(spark, full_state):
    """The scale story: the admission path's ``bucket IN (...)`` filter
    must reach the parquet scan as a pushed filter (the sorted base's
    row-group stats then skip untouched ranges)."""
    some = [
        r["bucket"]
        for r in state_buckets(spark, full_state).limit(3).collect()
    ]
    plan = (
        state_buckets(spark, full_state)
        .filter(F.col("bucket").isin(some))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [In(bucket" in plan, plan


def test_manifest_is_versioned_json(spark, full_state):
    m = _read_manifest(full_state)
    name = m.pop("__name")
    assert name == f"manifest_v{m['version']}.json"
    with open(os.path.join(full_state, name)) as f:
        assert json.load(f) == m


def test_crash_leftover_does_not_brick_next_mutation(
    spark, scratch_state, docs
):
    """Review r12: a mutation that died AFTER writing its seq-owned delta
    dirs but BEFORE the pointer swing leaves those paths on disk; the
    next mutation reuses the seq number and must overwrite them, not
    fail with path-already-exists."""
    m = _read_manifest(scratch_state)
    nxt = m["seq"] + 1
    for rel in (f"buckets/d{nxt:06d}", f"pairs/d{nxt:06d}",
                f"clusters/o{nxt:06d}", f"retired/r{nxt:06d}"):
        spark.createDataFrame([(1,)], "junk long").write.parquet(
            os.path.join(scratch_state, rel)
        )
    fresh = docs.limit(2).select(
        (F.col("doc_id") + 70_000_000).alias("doc_id"), "text"
    )
    stats = admit_docs(spark, scratch_state, fresh)  # must not raise
    assert stats["admitted"] == 2
    retire_docs(spark, scratch_state, fresh.select("doc_id"))
    assert _rows(state_clusters(spark, scratch_state)) == _rows(
        QUERIES["dedup_clusters_docs"].fn(spark, SF)
    )


def test_retire_never_live_id_is_true_noop(spark, scratch_state, docs):
    """Review r12: retiring an id that was never admitted records
    NOTHING (reported as not_live), so an out-of-order takedown can
    never block that id's later admission."""
    ghost = spark.createDataFrame([(91_000_000,)], "doc_id long")
    stats = retire_docs(spark, scratch_state, ghost)
    assert stats["retired"] == 0 and stats["not_live"] == 1
    assert _read_manifest(scratch_state)["retired"] == []
    # the id admits cleanly afterwards — no tombstone ever existed
    row = docs.limit(1).select(
        F.lit(91_000_000).cast("long").alias("doc_id"), "text"
    )
    assert admit_docs(spark, scratch_state, row)["admitted"] == 1


def test_auto_compaction_bounds_manifest_files(spark, docs):
    """Round-12 verdict ask #2: N stacked admissions with
    auto_compact_max_files keep every logical table's manifest file list
    bounded with NO manual compaction, and the maintained state stays
    equal to a never-compacted twin's."""
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 2)
    threshold = 2
    auto = build_dedup_state(spark, SF, corpus=base, tag="t_auto")
    twin = build_dedup_state(spark, SF, corpus=base, tag="t_auto_twin")
    for d, tag in ((auto, "t_auto"), (twin, "t_auto_twin")):
        if _read_manifest(d)["seq"] > 0:
            shutil.rmtree(d, ignore_errors=True)
            build_dedup_state(spark, SF, corpus=base, tag=tag)
    row = docs.limit(4).select("doc_id", "text")
    for i in range(5):
        d_i = row.select(
            (F.col("doc_id") + 1_000_000 * (i + 1)).alias("doc_id"), "text"
        )
        admit_docs(spark, auto, d_i, auto_compact_max_files=threshold)
        admit_docs(spark, twin, d_i)
        m = _read_manifest(auto)
        worst = max(
            len(m["buckets"]), len(m["pairs"]),
            len(m["cluster_overrides"]), len(m["retired"]),
        )
        assert worst <= threshold, (i, worst)
    # the twin, never compacted, shows the decay auto-compaction prevents
    mt = _read_manifest(twin)
    assert max(
        len(mt["buckets"]), len(mt["pairs"]), len(mt["cluster_overrides"])
    ) > threshold
    assert _rows(state_clusters(spark, auto)) == _rows(
        state_clusters(spark, twin)
    )
    assert _rows(state_pairs(spark, auto)) == _rows(state_pairs(spark, twin))
    # watermarks survive the auto-compactions (none set here, but the
    # retire leg below records one and must survive its fold)
    retire_docs(
        spark, auto,
        row.select((F.col("doc_id") + 1_000_000).alias("doc_id")),
        batch_id=7, stream="takedown", auto_compact_max_files=0,
    )
    m = _read_manifest(auto)
    assert m["watermarks"]["takedown"] == 7
    assert m["retired"] == []  # the fold drained the tombstone it wrote
    shutil.rmtree(auto, ignore_errors=True)
    shutil.rmtree(twin, ignore_errors=True)
