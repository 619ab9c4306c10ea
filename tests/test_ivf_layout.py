"""IVF at rest: the inverted-file layout as an on-disk partitioned table.

``ivf_topk`` assigns cells at query time (fine when the corpus is already
in memory/being scanned).  At 100 TB the point of IVF is that the corpus is
WRITTEN partitioned by cell once, and each query batch reads only its
nprobe cells — partition pruning does the data skipping at the storage
layer.  This test pins that whole story end-to-end on a real partitioned
parquet write: identical top-k results to the in-memory operator, AND a
scan plan whose PartitionFilters actually prune (only the probed cells'
directories are read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dagger_spark.ops.similarity import assign_cells, cosine_from_norms, ivf_topk
from dagger_spark.sources.files import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_ivf_partitioned_cell_layout_matches_and_prunes(spark, emb, tmp_path):
    n_centroids, nprobe, k = 16, 2, 5
    queries = emb.filter(F.col("vec_id") < 8)

    expected = {
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in ivf_topk(emb, queries, k=k, n_centroids=n_centroids, nprobe=nprobe).collect()
    }

    # write the corpus partitioned by cell — the inverted file at rest
    member = assign_cells(emb, n_centroids)
    path = str(tmp_path / "ivf_cells")
    member.write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)

    # probe cells for this query batch (tiny: <= nprobe * |queries| ids)
    q_member = assign_cells(queries, n_centroids).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("__qn"),
    )
    from dagger_spark.ops.similarity import _centroid_literals

    cell_of = _centroid_literals(emb, n_centroids, "vec_id", "embedding")
    q = q_member.select(
        "query_id", "qvec", "__qn",
        F.explode(
            F.transform(
                cell_of(F.col("qvec"), F.col("__qn"), nprobe), lambda e: e["c"]
            )
        ).alias("cell"),
    )
    probe_cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    assert 0 < len(probe_cells) < n_centroids  # pruning is non-trivial

    # the pruned scan: only the probed cells' partitions
    pruned = stored.filter(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    # and it actually reads fewer rows than the full corpus
    assert pruned.count() < stored.count()

    # scoring over the pruned partitioned table reproduces the operator
    scored = (
        pruned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("cvec"),
            F.col("vnorm").alias("__cn"),
            "cell",
        )
        .join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms(
                    F.col("qvec"), F.col("cvec"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    got = {
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    }
    assert got == expected
