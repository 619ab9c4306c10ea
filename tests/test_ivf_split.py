"""Hot-cell split + cell-size gauge for the IVF index (round-12 verdict
ask #6): at 100 TB a skewed coarse cell is one straggler partition per
probe.  ``ivf_cell_size_report`` finds it; ``split_hot_cells`` rewrites
it under k sub-centroids (grid + top-level quantizer frozen) so the
probe reads balanced partitions — with results IDENTICAL, because a
probed parent expands to all its leaf descendants."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.ivf_index import (
    append_to_sq8_ivf_index,
    build_sq8_ivf_index,
    compact_sq8_ivf_index,
    delete_from_sq8_ivf_index,
    ivf_cell_size_report,
    live_postings,
    split_hot_cells,
    sq8_ivf_topk,
)
from dagger_spark.ops.manifest import read_manifest

SF = "/root/testdata/sf0.01"


def _corpus(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )


@pytest.fixture(scope="module")
def hot_index(spark):
    """Index over the corpus plus a PLANTED hot cell: two member vectors
    of one cell, each tiled 100x under fresh ids — bimodal mass the
    k-means-refined split should separate.  In-grid by construction
    (tiles repeat corpus values verbatim)."""
    base_idx = build_sq8_ivf_index(spark, SF, n_centroids=16)
    member = F.when(F.col("vec_id") >= 16, F.col("vec_id"))
    seeds = (
        live_postings(spark, base_idx)
        .groupBy("cell").agg(
            F.count(member).alias("n"),
            F.min(member).alias("a"),
            F.max(member).alias("b"),
        )
        .filter(F.col("n") >= 2)  # two non-seed members to tile
        .orderBy("cell")
        .first()
    )
    two = _corpus(spark).filter(F.col("vec_id").isin([seeds["a"], seeds["b"]]))
    tiles = two.crossJoin(spark.range(100).select(F.col("id").alias("rep"))).select(
        (F.col("vec_id") * 1000 + F.col("rep") + 10_000_000).alias("vec_id"),
        "embedding",
    )
    corpus = _corpus(spark).select("vec_id", "embedding").unionByName(tiles)
    idx = build_sq8_ivf_index(spark, SF, n_centroids=16, corpus=corpus, tag="hot")
    yield idx, int(seeds["cell"])


def _scratch(idx, name):
    d = f"/tmp/dagger_test_split_{name}"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(idx, d)
    return d


def _topk(spark, idx):
    return sorted(
        tuple(r) for r in sq8_ivf_topk(spark, idx, k=5, nprobe=2).collect()
    )


def test_cell_size_report_gauges_the_hot_cell(spark, hot_index):
    idx, hot = hot_index
    rep = {r["cell"]: r for r in ivf_cell_size_report(spark, idx).collect()}
    total = live_postings(spark, idx).count()
    assert sum(r["n_vectors"] for r in rep.values()) == total
    assert abs(sum(r["frac"] for r in rep.values()) - 1.0) < 1e-3
    mean = total / len(rep)
    assert rep[hot]["n_vectors"] > 4 * mean  # the planted skew is visible


def test_threshold_split_balances_and_preserves_results(spark, hot_index):
    """Threshold mode finds the planted cell on its own; after the split
    the probe reads balanced leaf partitions and every result is
    unchanged."""
    idx, hot = hot_index
    scratch = _scratch(idx, "auto")
    before = _topk(spark, scratch)
    sizes0 = {
        r["cell"]: r["n_vectors"]
        for r in ivf_cell_size_report(spark, scratch).collect()
    }
    out = split_hot_cells(spark, scratch, multiple=4.0, k_children=2)
    assert list(out["split"]) == [hot]  # found exactly the planted cell
    children = out["split"][hot]
    assert len(children) == 2

    sizes = {
        r["cell"]: r["n_vectors"]
        for r in ivf_cell_size_report(spark, scratch).collect()
    }
    assert hot not in sizes  # parent physically gone
    assert sum(sizes.get(c, 0) for c in children) == sizes0[hot]
    # balanced: the bimodal mass separated — no child keeps ~everything
    assert min(sizes[c] for c in children) >= 0.25 * sizes0[hot]

    assert _topk(spark, scratch) == before  # results identical
    shutil.rmtree(scratch, ignore_errors=True)


def test_split_composes_with_lifecycle(spark, hot_index):
    """Appends after a split descend to the leaves; vectors-shape deletes
    recompute the same leaf; compaction leaves split postings intact."""
    idx, hot = hot_index
    scratch = _scratch(idx, "life")
    split_hot_cells(spark, scratch, cells=[hot], k_children=2)
    before = _topk(spark, scratch)

    delta = _corpus(spark).filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 28)
    ).select((F.col("vec_id") + 77_000_000).alias("vec_id"), "embedding")
    append_to_sq8_ivf_index(spark, scratch, delta)
    m = read_manifest(scratch)
    assert hot not in {c for _p, c in m["postings"]}  # nothing re-lands in parent

    n = delete_from_sq8_ivf_index(spark, scratch, vectors=delta)
    assert n == 8
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert stats["tombstones_purged"] == 8
    assert _topk(spark, scratch) == before  # append+delete round-trips
    shutil.rmtree(scratch, ignore_errors=True)


def test_split_validates_targets(spark, hot_index):
    idx, hot = hot_index
    scratch = _scratch(idx, "args")
    with pytest.raises(ValueError, match="no live rows"):
        split_hot_cells(spark, scratch, cells=[99999])
    split_hot_cells(spark, scratch, cells=[hot], k_children=2)
    with pytest.raises(ValueError, match="no live rows"):
        split_hot_cells(spark, scratch, cells=[hot])  # already split
    # threshold mode with no hot cells is a clean no-op
    out = split_hot_cells(spark, scratch, multiple=1e9)
    assert out["split"] == {}
    shutil.rmtree(scratch, ignore_errors=True)
