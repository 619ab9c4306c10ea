"""Crafted-case unit tests for the round-2 training-data pipeline ops:
SemDeDup, product-quantization ANN, exact-substring duplication stats, and
temperature-weighted mixture sampling.  The fuzz/oracle suites pin
cross-engine parity; these pin the SEMANTICS on inputs small enough to
verify by hand."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.dedup import duplicated_span_stats
from dagger_spark.ops.similarity import pq_topk, semdedup


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_semdedup_drops_later_near_duplicates_cell_locally(spark):
    # Two well-separated directions; ids 0 and 1 are the centroids.
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    vecs = [
        a,                       # 0: centroid/keeper of cell 0
        b,                       # 1: centroid/keeper of cell 1
        [2.0, 0.01, 0.0, 0.0],   # 2: near-dup of 0 (cos ~1) -> dropped
        [0.0, 3.0, 0.02, 0.0],   # 3: near-dup of 1 -> dropped
        [0.7, 0.0, 0.7, 0.0],    # 4: same cell as 0, cos=0.707 < 0.9 -> kept
    ]
    out = semdedup(_emb_df(spark, vecs), n_centroids=2, threshold=0.9)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert kept == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_semdedup_zero_vector_never_matches(spark):
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0], [0.0, 0.0]]
    out = semdedup(_emb_df(spark, vecs), n_centroids=2, threshold=0.5)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    # zero vectors score 0.0 against everything (norm guard) -> both kept
    assert kept[2] and kept[3]


def test_pq_exact_duplicate_is_rank_one_with_zero_distance(spark):
    # 8-dim, m=2 subspaces of 4.  ids 0..3 are the codebook rows; id 4
    # duplicates id 0 exactly, so they share codes and ADC distance to the
    # twin equals the query's distance to its own code cell.
    base = [
        [1.0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1.0, 0, 0, 0, 5.0, 0, 0],
        [0, 0, 1.0, 0, 0, 0, 7.0, 0],
        [0, 0, 0, 1.0, 0, 0, 0, 9.0],
    ]
    vecs = base + [list(base[0])]
    corpus = _emb_df(spark, vecs)
    out = pq_topk(corpus, corpus.filter(F.col("vec_id") == 4), k=1, m=2, ksub=4)
    top = out.collect()
    assert len(top) == 1
    r = top[0]
    assert (r["query_id"], r["neighbor_id"], r["rank"]) == (4, 0, 1)
    assert r["adist"] == 0.0  # same codes -> identical LUT entries


def test_pq_rejects_indivisible_dim(spark):
    corpus = _emb_df(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(corpus, corpus, m=2, ksub=1)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_duplicated_span_stats_shared_prefix(spark):
    shared = "0123456789" * 4 + "ABCDE"          # 45 chars shared prefix
    a = shared + "x" * 20                         # 65 chars -> 26 windows
    b = shared + "y" * 20
    c = "z" * 80                                  # unique, self-repeating only
    d = "short"                                   # < 40 chars -> excluded
    out = duplicated_span_stats(_docs_df(spark, [a, b, c, d]), k=40, stride=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    # windows fully inside the 45-char shared prefix: positions 1..6
    assert rows[0]["n_windows"] == 26 and rows[0]["n_dup_windows"] == 6
    assert rows[1]["n_dup_windows"] == 6
    assert rows[1]["dup_window_frac"] == round(6 / 26, 6)
    # c's windows are all 'z'*40: identical WITHIN the doc but in no other
    # doc -> not cross-doc duplicated
    assert rows[2]["n_dup_windows"] == 0


def test_duplicated_span_stats_stride(spark):
    shared = "0123456789" * 4 + "ABCDE"
    a = shared + "x" * 20
    b = shared + "y" * 20
    out = duplicated_span_stats(_docs_df(spark, [a, b]), k=40, stride=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    # stride-5 positions: 1, 6, 11, 16, 21, 26 -> 6 windows; shared: 1, 6
    assert rows[0]["n_windows"] == 6
    assert rows[0]["n_dup_windows"] == 2


def test_mixture_sample_rates(spark, tmp_path):
    # src_a: 10 docs x 10 tokens = 100; src_b: 10 docs x 40 tokens = 400.
    # alpha=0.5 -> w = (10, 20), w_total = 30; budget = 0.3 * 500 = 150.
    # rate_a = min(1, 150*10/(30*100)) = 0.5
    # rate_b = min(1, 150*20/(30*400)) = 0.25
    rows = []
    did = 0
    for src, ntok, nd in (("src_a", 10, 10), ("src_b", 40, 10)):
        for _ in range(nd):
            rows.append((did, "w" + str(did) + " " + " ".join(["tok"] * (ntok - 1)), src, None))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    d = tmp_path / "mix"
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))

    from dagger_spark.catalog import QUERIES

    out = QUERIES["mixture_sample_docs"].fn(spark, str(d)).collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["src_a"]["rate"] == 0.5
    assert by_src["src_b"]["rate"] == 0.25
    assert by_src["src_a"]["weight"] == round(10 / 30, 6)
    assert by_src["src_b"]["weight"] == round(20 / 30, 6)
    assert by_src["src_a"]["c_tokens"] == 100
    assert by_src["src_b"]["c_tokens"] == 400
    # acceptance is a deterministic doc_id hash gate: n_sampled <= n_docs
    for r in out:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        assert r["tokens_sampled"] <= r["c_tokens"]


def test_connected_components_unique_labels_on_early_exit(spark):
    """With max_iters too small to converge, every vertex still gets exactly
    ONE label row (the final min-aggregate), never conflicting duplicates."""
    from dagger_spark.ops.dedup import connected_components

    n = 40  # chain 0-1-2-...-39
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = connected_components(vertices, edges, max_iters=1)
    rows = labels.collect()
    assert len(rows) == n
    assert len({r["id"] for r in rows}) == n  # one row per vertex
    # full run still collapses the chain to a single component
    full = connected_components(vertices, edges, max_iters=20)
    assert {r["cluster"] for r in full.collect()} == {0}


def test_cc_10k_chain_converges_log_rounds(spark):
    """A 10,000-vertex path graph — the worst case for diameter-bound
    min-label propagation (10k rounds) — collapses under alternating
    large-star/small-star in O(log n) rounds.  Asserted via the stats
    hook: <= 15 rounds, every vertex labeled with the component minimum."""
    from dagger_spark.ops.dedup import connected_components

    n = 10_000
    vertices = spark.range(n).select(F.col("id").cast("long"))
    edges = spark.range(n - 1).select(
        F.col("id").cast("long").alias("src"),
        (F.col("id") + 1).cast("long").alias("dst"),
    )
    stats = {}
    labels = connected_components(vertices, edges, max_iters=25, stats=stats)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("id").alias("nd"),
        F.countDistinct("cluster").alias("nc"),
        F.min("cluster").alias("mn"),
        F.max("cluster").alias("mx"),
    ).collect()[0]
    assert (agg["n"], agg["nd"], agg["nc"], agg["mn"], agg["mx"]) == (
        n, n, 1, 0, 0
    )
    assert stats["rounds"] <= 15, stats


def test_cc_lazy_checkpoint_truncates_lineage(spark):
    """Round 13 internals pin: the per-round truncation switched from
    eager to LAZY localCheckpoint (the fingerprint collect that follows
    each round materializes the partitions, so the eager count job was
    pure overhead).  The property the switch must preserve: the returned
    frame's lineage is STILL cut — its analyzed plan bottoms out in a
    LogicalRDD scan, never re-embedding the edge pipeline — and repeated
    actions on the result stay stable (partitions cached, not recomputed
    through dead lineage)."""
    from dagger_spark.ops.dedup import connected_components

    n = 64
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = connected_components(vertices, edges, max_iters=20)
    plan = labels._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan  # lineage cut at the checkpoint boundary
    # the star-round edge pipeline (symmetrizing Union + distinct's
    # Deduplicate) must not be re-embedded ANYWHERE in the final plan:
    # above the checkpoint only roots' Aggregate + the vertex Join remain
    assert "Union" not in plan and "Deduplicate" not in plan
    first = sorted((r["id"], r["cluster"]) for r in labels.collect())
    second = sorted((r["id"], r["cluster"]) for r in labels.collect())
    assert first == second
    assert {c for _, c in first} == {0}


def test_incremental_dedup_semantics(spark):
    """Incoming batch vs existing corpus: a planted near-dup of a corpus
    doc is flagged with the right match; a novel doc passes clean; the
    corpus never self-joins (only new x old candidates exist)."""
    from dagger_spark.ops.dedup import (
        hashed_docs, incremental_dedup, minhash_signatures, shingled_docs,
    )

    corpus_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "red orange yellow green blue indigo violet pink brown black"),
    ]
    new_rows = [
        # near-dup of corpus doc 1 (one token changed)
        (10, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        # novel content
        (11, "completely different words with no overlap whatsoever here now"),
    ]
    mk = lambda rows: minhash_signatures(
        hashed_docs(shingled_docs(
            spark.createDataFrame(rows, "doc_id long, text string")))
    )
    out = {
        r["id"]: (r["is_dup"], r["match_id"])
        for r in incremental_dedup(mk(new_rows), mk(corpus_rows)).collect()
    }
    assert out[10] == (True, 1)
    assert out[11] == (False, None)


def test_rp_topk_exact_duplicate_is_rank_one(spark):
    import random

    from pyspark.sql import Row

    from dagger_spark.ops.similarity import brute_force_topk, rp_topk

    rng = random.Random(7)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(64)])
            for i in range(40)]
    rows.append(Row(vec_id=100, embedding=list(rows[0].embedding)))  # dup of 0
    df = spark.createDataFrame(rows)
    q = df.filter(df.vec_id == 0)
    got = rp_topk(df, q, k=5, out_dim=16, dim=64).collect()
    top = next(r for r in got if r["rank"] == 1)
    # identical inputs project identically: the planted duplicate must be
    # rank-1 at cosine exactly 1.0 even in 16-dim projected space
    assert top["neighbor_id"] == 100 and top["score"] == 1.0

    # recall is measured on CLUSTERED vectors: on uniform random data all
    # cosines are near-tied and JL's ~1/sqrt(16) distortion swamps the
    # gaps (the same documented worst case that puts LSH/PQ at 0.15 in
    # ann_recall).  With real cluster structure the projection preserves
    # the separations and top-5 overlap is high.
    centers = [[rng.choice((-1.0, 1.0)) for _ in range(64)] for _ in range(8)]
    crows = [
        Row(vec_id=i,
            embedding=[c + rng.uniform(-0.15, 0.15)
                       for c in centers[i % 8]])
        for i in range(40)
    ]
    cdf = spark.createDataFrame(crows)
    qs = cdf.filter(cdf.vec_id < 4)
    exact = brute_force_topk(cdf, qs, k=5).collect()
    approx = rp_topk(cdf, qs, k=5, out_dim=16, dim=64).collect()
    for qid in range(4):
        e = {r["neighbor_id"] for r in exact if r["query_id"] == qid}
        a = {r["neighbor_id"] for r in approx if r["query_id"] == qid}
        assert len(e & a) >= 3, (qid, e, a)


def test_rp_signs_deterministic():
    from dagger_spark.ops.similarity import rp_signs

    s = rp_signs(3, 64)
    assert s == rp_signs(3, 64)
    assert set(s) == {1.0, -1.0}
    assert rp_signs(4, 64) != s


def test_pagerank_int_star_graph_exact(spark):
    from pyspark.sql import Row

    from dagger_spark.ops.graph import pagerank_int

    # star: 0 <-> {1,2,3}; node 9 isolated
    pairs = [(0, i) for i in (1, 2, 3)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
        + [Row(src=b, dst=a) for a, b in pairs],
    )
    nodes = spark.createDataFrame([Row(id=i) for i in (0, 1, 2, 3, 9)])
    got = {r["id"]: (r["degree"], r["rank_micro"])
           for r in pagerank_int(nodes, edges, iters=10).collect()}

    # independent pure-Python recomputation of the integer iteration
    deg = {0: 3, 1: 1, 2: 1, 3: 1}
    r = {i: 1_000_000 for i in (0, 1, 2, 3, 9)}
    for _ in range(10):
        inc = {i: 0 for i in r}
        for a, b in pairs:
            inc[b] += r[a] // deg[a]
            inc[a] += r[b] // deg[b]
        r = {i: 150_000 + (85 * inc[i]) // 100 for i in r}
    assert got == {i: (deg.get(i, 0), r[i]) for i in r}
    # the hub out-ranks the leaves; the isolate holds the base rank
    assert got[0][1] > got[1][1] and got[9] == (0, 150_000)


def test_contrastive_triplets_semantics(spark):
    """Planted geometry pins the mining: the positive is the true nearest
    neighbor, the negative is never the anchor or the positive, and the
    margin is their score difference."""
    import hashlib

    from pyspark.sql import Row

    from dagger_spark.ops.similarity import contrastive_triplets

    vecs = [
        [1.0, 0.0, 0.0],   # 0: anchor
        [0.9, 0.1, 0.0],   # 1: its obvious positive
        [0.0, 1.0, 0.0],   # 2
        [0.0, 0.0, 1.0],   # 3
        [-1.0, 0.0, 0.0],  # 4
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    )
    out = contrastive_triplets(df, df.filter(df.vec_id == 0)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pos_id"] == 1 and r["pos_score"] > 0.99
    assert r["neg_id"] not in (0, 1)
    assert r["margin"] == round(r["pos_score"] - r["neg_score"], 6)
    # the negative is the md5-argmin over remaining candidates — recompute
    want = min(
        (hashlib.md5(f"0:{i}".encode()).hexdigest(), i) for i in (2, 3, 4)
    )[1]
    assert r["neg_id"] == want
