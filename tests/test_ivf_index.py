"""Materialized IVF+SQ8 index (ops/ivf_index.py): production query shape,
results pinned bit-identical to the in-query ann_ivf_sq8 definition."""

import os

import pytest
from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES
from dagger_spark.ops.ivf_index import (
    build_sq8_ivf_index,
    index_dir_for,
    sq8_ivf_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def index_dir(spark):
    return build_sq8_ivf_index(spark, SF, n_centroids=16)


def test_results_identical_to_unindexed(spark, index_dir):
    a = sorted(tuple(r) for r in QUERIES["ann_ivf_sq8"].fn(spark, SF).collect())
    b = sorted(
        tuple(r)
        for r in sq8_ivf_topk(spark, index_dir, k=5, nprobe=2).collect()
    )
    assert a == b and len(a) == 40


def test_query_plan_has_no_corpus_explode(spark, index_dir):
    """The whole point of the index: query-time plan carries no
    posexplode / dim-stats / re-assembly of the corpus."""
    df = sq8_ivf_topk(spark, index_dir, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PosExplode" not in plan
    # the unindexed twin needs two aggregates before it can even scan
    # (dim stats + re-assembly); the indexed path has only the top-k window
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Aggregate") == 0


def test_postings_scan_is_partition_pruned(spark, index_dir):
    """Probed cells must reach the postings scan as a partition-column
    prune (dynamic partition pruning from the broadcast query side), not
    a post-scan filter."""
    df = sq8_ivf_topk(spark, index_dir, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan


def test_index_layout(spark, index_dir):
    assert os.path.exists(os.path.join(index_dir, "_BUILT"))
    parts = [
        d
        for d in os.listdir(os.path.join(index_dir, "postings"))
        if d.startswith("cell=")
    ]
    assert len(parts) > 1  # genuinely partitioned by coarse cell
    grid = spark.read.parquet(os.path.join(index_dir, "grid.parquet"))
    assert grid.count() == 64 and set(grid.columns) == {"j", "mn", "mx"}
    cents = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    assert cents.count() == 16
    # every corpus vector has exactly one posting
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    n_emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).where(
        F.col("embedding").isNotNull()
    ).count()
    assert post.count() == n_emb
    assert post.select("vec_id").distinct().count() == n_emb


def test_index_reused_and_fingerprinted(spark, index_dir):
    # second call returns the same dir without rebuilding
    marker = os.path.join(index_dir, "_BUILT")
    mtime = os.path.getmtime(marker)
    again = build_sq8_ivf_index(spark, SF, n_centroids=16)
    assert again == index_dir and os.path.getmtime(marker) == mtime
    # the dir name carries the source fingerprint: a different corpus
    # (other sf) never collides
    assert index_dir_for("/root/testdata/sf0.001", 16) != index_dir
