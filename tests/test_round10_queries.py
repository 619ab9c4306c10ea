"""Round-10 catalog additions: exact-parity pins for the two alternate-form
operators (grouped MMR == literal-loop MMR; appended index == one-shot
rebuild) plus the append path's grid-staleness gate."""

import os

import pytest
from pyspark.sql import functions as F

from dagger_spark.catalog import QUERIES

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# Corpus-scale MMR (applyInPandas) vs the literal-loop form
# ---------------------------------------------------------------------------


def test_mmr_grouped_exactly_equals_literal_loop(spark):
    """The verdict-ask parity: the per-query applyInPandas greedy must
    return IDENTICAL rows (ranks, ids, 6-decimal scores) to the 8-round
    literal-loop form — float32 products + sequential float64 accumulation
    + HALF_UP rounding replicate Spark's arithmetic bit-for-bit."""
    a = [tuple(r) for r in QUERIES["mmr_rerank_embeddings"].fn(spark, SF).collect()]
    b = [tuple(r) for r in QUERIES["mmr_rerank_grouped"].fn(spark, SF).collect()]
    assert len(a) == len(b) == 64
    assert a == b


def test_mmr_grouped_has_no_driver_loop(spark):
    """The grouped form's plan is ONE query: retrieval + a single
    FlatMapGroupsInPandas — no unioned selection-round subplans."""
    df = QUERIES["mmr_rerank_grouped"].fn(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "Union" not in plan


def test_mmr_grouped_ranks_are_dense_per_query(spark):
    rows = QUERIES["mmr_rerank_grouped"].fn(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["mmr_rank"])
    assert set(by_q) == set(range(8))
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, 9))


# ---------------------------------------------------------------------------
# Incremental IVF+SQ8 append
# ---------------------------------------------------------------------------


def test_appended_index_equals_full_rebuild(spark):
    """Query results from the base+append index must be bit-identical to
    the one-shot full build (grid kept complete by holding per-dim extreme
    achievers and centroid seeds in the base)."""
    a = sorted(
        tuple(r) for r in QUERIES["ann_ivf_sq8_appended"].fn(spark, SF).collect()
    )
    b = sorted(
        tuple(r) for r in QUERIES["ann_ivf_sq8_indexed"].fn(spark, SF).collect()
    )
    assert a == b and len(a) == 40


def test_append_covers_whole_corpus(spark):
    """The stitched postings must contain every non-null vector exactly
    once — appending is not allowed to drop or duplicate."""
    from dagger_spark.catalog.round10 import _incremental_index

    from dagger_spark.ops.ivf_index import live_postings

    idx = _incremental_index(spark, SF, n_centroids=16)
    post = live_postings(spark, idx)
    n_corpus = (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    assert post.count() == n_corpus
    assert post.select("vec_id").distinct().count() == n_corpus


def test_append_refuses_out_of_grid_vectors(spark):
    """The grid-staleness gate: a vector outside the frozen per-dimension
    grid must raise, not silently clamp-distort its codes."""
    from dagger_spark.ops.ivf_index import (
        append_to_sq8_ivf_index,
        build_sq8_ivf_index,
    )

    idx = build_sq8_ivf_index(spark, SF, n_centroids=16)
    dim = len(
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull())
        .select(F.size("embedding").alias("d"))
        .first()["d"]
        * [0]
    )
    bad = spark.createDataFrame(
        [(10_000_000, [1e9] * dim)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="outside the frozen SQ8 grid"):
        append_to_sq8_ivf_index(spark, idx, bad)


def test_delta_pairs_equal_touching_subset_of_full_join(spark):
    """The incremental dedup contract: delta-vs-corpus candidate pairs
    must equal exactly the delta-touching subset of the full self-join —
    admitting a slice finds everything the batch run would, at
    delta-proportional cost."""
    full = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["minhash_pairs_docs"].fn(spark, SF).collect()
    }
    delta = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["minhash_delta_pairs_docs"].fn(spark, SF).collect()
    }
    touching = {p for p in full if p[0] % 10 == 0 or p[1] % 10 == 0}
    assert delta == touching


def test_bm25_incremental_equals_full_recompute(spark):
    """The algebraic-merge contract on the retrieval side: state+delta
    merged df/N/avgdl must equal a direct full-corpus computation."""
    from dagger_spark.ops.text import tokens

    rows = QUERIES["bm25_incremental_stats_docs"].fn(spark, SF).collect()
    assert len(rows) == 20
    lens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    n_docs = lens.count()
    import math

    sum_dl = lens.agg(F.sum(F.size("t"))).first()[0]
    direct_df = {
        r["term"]: r["c"]
        for r in lens.select(F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        assert r["n_docs"] == n_docs
        assert abs(r["avgdl"] - sum_dl / n_docs) < 1e-5
        assert r["doc_freq"] == direct_df[r["term"]]
        want_idf = math.log(
            (n_docs - r["doc_freq"] + 0.5) / (r["doc_freq"] + 0.5) + 1.0
        )
        assert abs(r["idf"] - want_idf) < 1e-5
    # descending df with term tiebreak
    keys = [(-r["doc_freq"], r["term"]) for r in rows]
    assert keys == sorted(keys)


def test_append_requires_built_index(spark):
    from dagger_spark.ops.ivf_index import append_to_sq8_ivf_index

    df = spark.createDataFrame(
        [(1, [0.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="not a built index"):
        append_to_sq8_ivf_index(spark, "/tmp/definitely_not_an_index", df)


def test_compaction_reduces_files_and_preserves_results(spark):
    """After repeated appends fragment the postings cells, compaction must
    bring every cell back to one file WITHOUT changing query results, and
    must touch only fragmented cells."""
    import shutil

    from dagger_spark.ops.ivf_index import (
        append_to_sq8_ivf_index,
        build_sq8_ivf_index,
        compact_sq8_ivf_index,
        sq8_ivf_topk,
    )

    idx = build_sq8_ivf_index(spark, SF, n_centroids=16)
    scratch = "/tmp/dagger_test_compact_idx"
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(idx, scratch)

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )
    for i in range(2):  # two small appends -> extra files in touched cells
        delta = emb.filter(
            (F.col("vec_id") >= 20 + 10 * i) & (F.col("vec_id") < 30 + 10 * i)
        ).select((F.col("vec_id") + 1_000_000 * (i + 1)).alias("vec_id"),
                 "embedding")
        append_to_sq8_ivf_index(spark, scratch, delta)

    before = sorted(
        tuple(r)
        for r in sq8_ivf_topk(spark, scratch, k=5, nprobe=2).collect()
    )
    stats = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    from dagger_spark.ops.ivf_index import live_cell_file_counts

    assert all(n == 1 for n in live_cell_file_counts(scratch).values())
    after = sorted(
        tuple(r)
        for r in sq8_ivf_topk(spark, scratch, k=5, nprobe=2).collect()
    )
    assert before == after
    # idempotent: a second compaction is a no-op
    again = compact_sq8_ivf_index(spark, scratch, max_files_per_cell=1)
    assert again["cells_compacted"] == 0
    shutil.rmtree(scratch, ignore_errors=True)
