"""Distributed k-means trainer: convergence, determinism, and the
corpus-stays-distributed contract (only k×dim centroids reach the driver)."""

import pytest

from pyspark.sql import functions as F

from dagger_spark.ops.similarity import assign_cells, kmeans_train
from dagger_spark.sources.files import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_kmeans_converges_and_is_deterministic(emb):
    cents1, iters1, shift1 = kmeans_train(emb, k=8, max_iters=15, tol=1e-9)
    cents2, iters2, shift2 = kmeans_train(emb, k=8, max_iters=15, tol=1e-9)
    assert cents1 == cents2 and iters1 == iters2  # fully deterministic
    assert len(cents1) == 8
    dim = len(cents1[0][1])
    assert all(len(v) == dim for _, v in cents1)
    # Lloyd monotonicity: a further step from the converged state moves less
    # than the first step did
    assert shift1 < 1.0


def test_kmeans_shift_decreases_from_init(emb):
    _, _, shift_after_1 = kmeans_train(emb, k=8, max_iters=1)
    cents, iters, shift_final = kmeans_train(emb, k=8, max_iters=15, tol=1e-9)
    assert iters > 1
    assert shift_final < shift_after_1


def test_trained_centroids_partition_corpus(emb):
    cents, _, _ = kmeans_train(emb, k=8, max_iters=5)
    assigned = assign_cells(emb, centroids=cents)
    n = emb.count()
    assert assigned.count() == n  # every vector lands in exactly one cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {cid for cid, _ in cents}


def test_empty_cells_keep_previous_centroid(spark):
    # two tight clusters, 4 requested cells -> at least 2 cells go empty and
    # must keep their init centroid instead of crashing or vanishing
    rows = []
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        rows.append((i, [b + (0.001 * (i % 3)) for b in base], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents, _, _ = kmeans_train(df, k=4, max_iters=5)
    assert len(cents) == 4
    assert all(len(v) == 4 for _, v in cents)
