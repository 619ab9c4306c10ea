"""DELETE/tombstone lifecycle for the materialized IVF+SQ8 index
(ops/ivf_index.py, round-10 verdict asks #2 and #4): tombstone-delete
masks at probe time, equals a rebuild-without-deleted, composes with
append, is physically purged by compaction, survives a crash before the
manifest publish, and the append path's opt-in auto-compaction keeps
per-cell live file counts bounded across repeated deltas."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.ivf_index import (
    append_to_sq8_ivf_index,
    build_sq8_ivf_index,
    compact_sq8_ivf_index,
    delete_from_sq8_ivf_index,
    live_cell_file_counts,
    live_postings,
    sq8_ivf_topk,
)
from dagger_spark.ops.manifest import read_manifest

SF = "/root/testdata/sf0.01"
N_CENTROIDS = 16


def _corpus(spark):
    return (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull())
    )


def _grid_safe_delete_ids(spark, n=24):
    """Ids whose removal leaves the per-dimension min/max (and therefore
    the SQ8 grid) unchanged: skip centroid seeds (< 16) and every vector
    achieving a per-dim extreme — the exact dual of the append path's
    grid-staleness bound, so rebuild-without-deleted shares the frozen
    grid and equality is exact."""
    emb = _corpus(spark)
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "x"),
    )
    stats = vals.groupBy("j").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    ext = {
        r["vec_id"]
        for r in vals.join(F.broadcast(stats), "j")
        .filter((F.col("x") == F.col("mn")) | (F.col("x") == F.col("mx")))
        .select("vec_id")
        .distinct()
        .collect()
    }
    return [
        r["vec_id"]
        for r in emb.select("vec_id")
        .filter(~F.col("vec_id").isin(list(ext)) & (F.col("vec_id") >= N_CENTROIDS))
        .orderBy(F.desc("vec_id"))
        .limit(n)
        .collect()
    ]


@pytest.fixture(scope="module")
def base_index(spark):
    return build_sq8_ivf_index(spark, SF, n_centroids=N_CENTROIDS)


def _scratch(base_index, name):
    d = f"/tmp/dagger_test_del_{name}"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(base_index, d)
    return d


def _topk(spark, idx):
    return sorted(
        tuple(r) for r in sq8_ivf_topk(spark, idx, k=5, nprobe=2).collect()
    )


def test_delete_masks_and_equals_rebuild(spark, base_index):
    """Vectors-shape delete: tombstoned ids vanish from results, and the
    probe equals a full one-shot rebuild over the reduced corpus (same
    grid by construction — grid-safe ids)."""
    ids = _grid_safe_delete_ids(spark)
    scratch = _scratch(base_index, "rebuild_eq")
    vecs = _corpus(spark).filter(F.col("vec_id").isin(ids))
    n = delete_from_sq8_ivf_index(spark, scratch, vectors=vecs)
    assert n == len(ids)
    got = _topk(spark, scratch)
    assert not any(r[1] in set(ids) for r in got)  # neighbor_id masked

    rebuilt = build_sq8_ivf_index(
        spark, SF, N_CENTROIDS,
        corpus=_corpus(spark).filter(~F.col("vec_id").isin(ids)),
        tag="delcheck_rebuild",
    )
    try:
        assert got == _topk(spark, rebuilt)
    finally:
        shutil.rmtree(rebuilt, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)


def test_ids_shape_equals_vectors_shape(spark, base_index):
    ids = _grid_safe_delete_ids(spark, n=8)
    s_vec = _scratch(base_index, "by_vec")
    s_ids = _scratch(base_index, "by_ids")
    delete_from_sq8_ivf_index(
        spark, s_vec, vectors=_corpus(spark).filter(F.col("vec_id").isin(ids))
    )
    n = delete_from_sq8_ivf_index(
        spark, s_ids,
        ids=spark.createDataFrame([(i,) for i in ids], "vec_id long"),
    )
    assert n == len(ids)
    assert _topk(spark, s_vec) == _topk(spark, s_ids)
    shutil.rmtree(s_vec, ignore_errors=True)
    shutil.rmtree(s_ids, ignore_errors=True)


def test_append_after_delete(spark, base_index):
    """The lifecycle composes: delete a slice, append a fresh delta — the
    appended vectors are retrievable, the deleted stay masked."""
    ids = _grid_safe_delete_ids(spark, n=8)
    scratch = _scratch(base_index, "app_after_del")
    delete_from_sq8_ivf_index(
        spark, scratch, vectors=_corpus(spark).filter(F.col("vec_id").isin(ids))
    )
    # re-insert the SAME vectors under fresh ids: guaranteed in-grid, and
    # each new id must retrieve wherever its doppelganger used to
    delta = _corpus(spark).filter(F.col("vec_id").isin(ids[:4])).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    append_to_sq8_ivf_index(spark, scratch, delta)
    got = _topk(spark, scratch)
    assert not any(r[1] in set(ids) for r in got)
    assert any(r[1] >= 10_000_000 for r in got)
    shutil.rmtree(scratch, ignore_errors=True)


def test_compaction_purges_tombstones(spark, base_index):
    """Compaction physically drops tombstoned codes, drains the tombstone
    set, and leaves query results unchanged."""
    ids = _grid_safe_delete_ids(spark, n=12)
    scratch = _scratch(base_index, "purge")
    delete_from_sq8_ivf_index(
        spark, scratch, vectors=_corpus(spark).filter(F.col("vec_id").isin(ids))
    )
    before = _topk(spark, scratch)
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert stats["tombstones_purged"] == len(ids)
    assert read_manifest(scratch)["tombstones"] == []  # set drained
    assert _topk(spark, scratch) == before
    # physically gone from the LIVE postings files (manifest-resolved,
    # pre-tombstone-mask), not just masked — old files survive one GC
    # cycle by design but are unreferenced
    from dagger_spark.ops.ivf_index import _read_postings

    live = {
        r["vec_id"]
        for r in _read_postings(spark, scratch, read_manifest(scratch))
        .select("vec_id").collect()
    }
    assert not (live & set(ids))
    # idempotent: a second compaction has nothing to do
    again = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert again["cells_compacted"] == 0 and again["tombstones_purged"] == 0
    shutil.rmtree(scratch, ignore_errors=True)


def test_compaction_survives_fully_tombstoned_cell(spark, base_index):
    """Whole-cell takedown: every vector of one cell deleted, then
    compacted — the rewrite must not choke on the zero-row rewrite, the
    cell ends with NO live postings files, tombstones drain, and probes
    still work (the cell simply contributes no candidates)."""
    scratch = _scratch(base_index, "fullcell")
    rows = live_postings(spark, scratch).select("vec_id", "cell").collect()
    cell = min(r["cell"] for r in rows)
    cell_ids = [r["vec_id"] for r in rows if r["cell"] == cell]
    assert cell_ids
    delete_from_sq8_ivf_index(
        spark, scratch,
        ids=spark.createDataFrame([(i,) for i in cell_ids], "vec_id long"),
    )
    # threshold high enough that ONLY the tombstone-dirty cell rewrites
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=99)
    assert stats["cells_compacted"] == 1
    assert stats["tombstones_purged"] == len(cell_ids)
    m = read_manifest(scratch)
    assert m["tombstones"] == []
    assert cell not in {c for _p, c in m["postings"]}  # no live file left
    got = _topk(spark, scratch)
    assert got and not any(r[1] in set(cell_ids) for r in got)
    shutil.rmtree(scratch, ignore_errors=True)


def test_merge_replay_is_skipped_by_batch_watermark(spark, tmp_path):
    """IVM idempotence under at-least-once redelivery: re-merging the
    same batch id must be a no-op (review finding: a batch replayed
    after a crash between pointer swing and checkpoint commit would
    otherwise double-count)."""
    from pyspark.sql import functions as F2

    from dagger_spark.sources.files import load_table
    from dagger_spark.streaming.ivm import (
        _partial,
        merge_rollup_partial,
        read_rollup_state,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    state_dir = str(tmp_path / "ivm_replay")
    d1 = _partial(ev.filter(F2.pmod(F2.col("event_id"), F2.lit(2)) == 0))
    d2 = _partial(ev.filter(F2.pmod(F2.col("event_id"), F2.lit(2)) == 1))
    assert merge_rollup_partial(spark, state_dir, d1, batch_id=0) is True
    assert merge_rollup_partial(spark, state_dir, d2, batch_id=1) is True
    snap = sorted(tuple(r) for r in read_rollup_state(spark, state_dir).collect())
    # redeliver batch 1 (and an older batch 0): both must be skipped
    assert merge_rollup_partial(spark, state_dir, d2, batch_id=1) is False
    assert merge_rollup_partial(spark, state_dir, d1, batch_id=0) is False
    after = sorted(tuple(r) for r in read_rollup_state(spark, state_dir).collect())
    assert after == snap


def test_crash_before_publish_leaves_previous_version_live(
    spark, base_index, monkeypatch
):
    """The manifest protocol's crash story: a compaction that dies AFTER
    staging/moving its new files but BEFORE the pointer swing leaves the
    previous version fully live (no torn reads, no lost cells) plus
    unreferenced orphans; the retried compaction succeeds and its GC
    sweeps the orphans."""
    import dagger_spark.ops.ivf_index as ivf

    scratch = _scratch(base_index, "crash")
    # fragment a couple of cells so the compaction has real work
    delta = _corpus(spark).filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select((F.col("vec_id") + 3_000_000).alias("vec_id"), "embedding")
    append_to_sq8_ivf_index(spark, scratch, delta)
    before = _topk(spark, scratch)
    n_files_before = len(read_manifest(scratch)["postings"])

    real_publish = ivf.publish_manifest

    def boom(state_dir, manifest):
        raise RuntimeError("simulated crash before pointer swing")

    monkeypatch.setattr(ivf, "publish_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    monkeypatch.setattr(ivf, "publish_manifest", real_publish)

    # previous version fully live: same manifest, same results
    assert len(read_manifest(scratch)["postings"]) == n_files_before
    assert _topk(spark, scratch) == before
    # retried compaction completes and GC'd the crash orphans
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert stats["cells_compacted"] > 0
    assert stats["gc_files"] > 0  # the interrupted run's orphans
    assert _topk(spark, scratch) == before
    assert all(n == 1 for n in live_cell_file_counts(scratch).values())
    shutil.rmtree(scratch, ignore_errors=True)


def test_wrong_dimension_vector_refused(spark, base_index):
    """Advice r10: a delta vector LONGER than the frozen grid used to slip
    past the gate via NULL element_at lookups and append NULL codes.  Both
    wrong-length and NULL-element vectors must now be refused — by append
    and by the vectors-shape delete alike."""
    dim = _corpus(spark).select(F.size("embedding").alias("d")).first()["d"]
    long_vec = [0.0] * (dim + 3)
    df_long = spark.createDataFrame(
        [(99_000_001, long_vec)], "vec_id long, embedding array<double>"
    )
    scratch = _scratch(base_index, "dimgate")
    with pytest.raises(ValueError, match="outside the frozen SQ8 grid"):
        append_to_sq8_ivf_index(spark, scratch, df_long)
    with pytest.raises(ValueError, match="outside the frozen SQ8 grid"):
        delete_from_sq8_ivf_index(spark, scratch, vectors=df_long)
    df_null = spark.createDataFrame(
        [(99_000_002, [None] + [0.0] * (dim - 1))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="outside the frozen SQ8 grid"):
        append_to_sq8_ivf_index(spark, scratch, df_null)
    shutil.rmtree(scratch, ignore_errors=True)


def test_delete_arg_validation(spark, base_index):
    scratch = _scratch(base_index, "args")
    ids = spark.createDataFrame([(1,)], "vec_id long")
    with pytest.raises(ValueError, match="exactly one"):
        delete_from_sq8_ivf_index(spark, scratch)
    with pytest.raises(ValueError, match="exactly one"):
        delete_from_sq8_ivf_index(spark, scratch, ids=ids, vectors=ids)
    with pytest.raises(ValueError, match="not a built index"):
        delete_from_sq8_ivf_index(spark, "/tmp/not_an_index_at_all", ids=ids)
    shutil.rmtree(scratch, ignore_errors=True)


def test_auto_compaction_bounds_file_counts(spark, base_index):
    """Opt-in auto-compaction on the append path (verdict ask #4): across
    N sequential appends, no cell's file count may exceed threshold+1 at
    rest (one over-threshold append triggers the rewrite), and results
    keep matching a never-compacted twin."""
    scratch = _scratch(base_index, "auto")
    twin = _scratch(base_index, "auto_twin")
    emb = _corpus(spark)
    threshold = 2
    for i in range(5):
        delta = emb.filter(
            (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
        ).select(
            (F.col("vec_id") + 1_000_000 * (i + 1)).alias("vec_id"),
            "embedding",
        )
        append_to_sq8_ivf_index(
            spark, scratch, delta, auto_compact_max_files=threshold
        )
        append_to_sq8_ivf_index(spark, twin, delta)
        worst = max(live_cell_file_counts(scratch).values())
        assert worst <= threshold + 1, (i, worst)
    assert _topk(spark, scratch) == _topk(spark, twin)
    # the twin, never compacted, demonstrates the decay auto-compaction
    # prevents: at least one of its cells is past the threshold
    assert max(live_cell_file_counts(twin).values()) > threshold + 1
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(twin, ignore_errors=True)


def test_catalog_deleted_entry_masks_slice(spark):
    """The driver-facing entry: every neighbor id in the retired slice
    (mod 7, >= 16) is absent, and row shape matches the ANN ladder."""
    from dagger_spark.catalog import QUERIES

    rows = QUERIES["ann_ivf_sq8_deleted"].fn(spark, SF).collect()
    assert len(rows) == 40
    assert all(
        not (r["neighbor_id"] % 10 == 7 and r["neighbor_id"] >= 16)
        for r in rows
    )


def test_id_reuse_refused_until_compaction(spark, base_index):
    """Advice r11 (medium): appending an id that carries a live tombstone
    is refused — its visibility would otherwise depend on whether the cell
    holding the OLD row happened to get rewritten.  The deterministic
    upsert sequence delete -> compact -> append works and retrieves the
    new row."""
    ids = _grid_safe_delete_ids(spark, n=4)
    scratch = _scratch(base_index, "reuse")
    reinsert = _corpus(spark).filter(F.col("vec_id").isin(ids)).select(
        "vec_id", "embedding"
    )
    delete_from_sq8_ivf_index(spark, scratch, vectors=reinsert)
    with pytest.raises(ValueError, match="live tombstone"):
        append_to_sq8_ivf_index(spark, scratch, reinsert)
    # ...and ids NOT tombstoned still append fine alongside live tombstones
    fresh = _corpus(spark).filter(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") + 77_000_000).alias("vec_id"), "embedding"
    )
    append_to_sq8_ivf_index(spark, scratch, fresh)
    compact_sq8_ivf_index(spark, scratch, max_files_per_cell=99)
    # tombstones drained + old rows physically gone -> reuse is legal now
    n = append_to_sq8_ivf_index(spark, scratch, reinsert)
    assert n == len(ids)
    post = live_postings(spark, scratch)
    live = {r["vec_id"] for r in post.select("vec_id").collect()}
    assert set(ids) <= live
    # exactly one row per reused id: the old copy did not resurrect
    dup = (
        post.filter(F.col("vec_id").isin(ids))
        .groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    shutil.rmtree(scratch, ignore_errors=True)


def test_repeat_delete_dedupes_tombstones(spark, base_index):
    """Advice r11: re-deleting already-tombstoned ids writes nothing new —
    the tombstone set stays bounded by distinct deleted ids."""
    ids = _grid_safe_delete_ids(spark, n=6)
    scratch = _scratch(base_index, "dedupe")
    vecs = _corpus(spark).filter(F.col("vec_id").isin(ids))
    n1 = delete_from_sq8_ivf_index(spark, scratch, vectors=vecs)
    assert n1 == len(ids)
    n2 = delete_from_sq8_ivf_index(spark, scratch, vectors=vecs)
    assert n2 == 0
    from dagger_spark.ops.ivf_index import _tombstones

    recorded = _tombstones(spark, scratch, read_manifest(scratch)).count()
    assert recorded == len(ids)
    shutil.rmtree(scratch, ignore_errors=True)


def test_compaction_noop_on_all_empty_postings(spark, base_index):
    """Advice r11: an index whose postings cells were all emptied by a
    prior purge, left with only stale/phantom tombstones, must compact as
    a clean no-op (drain tombstones) rather than fail schema inference on
    the all-empty tree."""
    scratch = _scratch(base_index, "allempty")
    all_ids = live_postings(spark, scratch).select("vec_id")
    delete_from_sq8_ivf_index(spark, scratch, ids=all_ids)
    compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert read_manifest(scratch)["postings"] == []  # no live files left
    assert live_postings(spark, scratch).count() == 0
    # phantom tombstones against the now-empty index (documented harmless
    # shape: deleting ids that are not present)
    delete_from_sq8_ivf_index(
        spark, scratch,
        vectors=_corpus(spark).filter(F.col("vec_id") >= N_CENTROIDS).limit(5),
    )
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert stats["cells_compacted"] == 0
    assert read_manifest(scratch)["tombstones"] == []
    shutil.rmtree(scratch, ignore_errors=True)
