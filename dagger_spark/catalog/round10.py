"""Round-10 catalog additions.

Leads with the two round-9 verdict asks that earn new oracle-paired rows:
the INCREMENTAL-APPEND form of the materialized IVF+SQ8 index (ask #6 —
at 100 TB the common index operation is append, not rebuild) and the
CORPUS-SCALE form of MMR reranking (ask #4 — per-query applyInPandas
greedy: one shuffle, zero driver round-trips, state bounded by the
candidate list, the shape a million-query offline batch needs).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import (
    CatalogQuery,
    DataFrame,
    F,
    QUERIES,
    SparkSession,
    _load_wide,
    register,
)
from .round8 import _ivf_sq8_oracle
from .round9 import _MMR_K, _MMR_LAM, _MMR_TOP, _mmr_oracle


# ===========================================================================
# Incremental IVF+SQ8 index append (round-9 verdict ask #6)
# ===========================================================================


def _incremental_index(spark: SparkSession, sf_dir: str, n_centroids: int = 16) -> str:
    """Build the base index from the corpus MINUS a held-out delta, then
    APPEND the delta with the frozen grid/centroids — returns an index dir
    whose postings cover the full corpus but were never built in one shot.

    Delta selection keeps the append provably grid-safe: every vector that
    achieves a per-dimension min or max stays in the base (frozen grid ==
    full-corpus grid), as do the centroid seed ids (< n_centroids); the
    delta is the 32 largest remaining ids.  Idempotent per corpus
    fingerprint via an _APPENDED marker (a partial base build without the
    marker is wiped and redone — appending twice would duplicate postings).
    """
    import os
    import shutil

    from ..ops.ivf_index import (
        append_to_sq8_ivf_index,
        build_sq8_ivf_index,
        index_dir_for,
    )
    from ..sources.files import load_table

    idx = index_dir_for(sf_dir, n_centroids) + "_inc"
    marker = os.path.join(idx, "_APPENDED")
    if os.path.exists(marker):
        return idx
    if os.path.exists(idx):
        shutil.rmtree(idx, ignore_errors=True)  # base without append: redo

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "x"),
    )
    stats = vals.groupBy("j").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    ext = [
        r["vec_id"]
        for r in vals.join(F.broadcast(stats), "j")
        .filter((F.col("x") == F.col("mn")) | (F.col("x") == F.col("mx")))
        .select("vec_id")
        .distinct()
        .collect()
    ]  # bounded: <= 2*dim extreme achievers (+rare ties), build-time only
    delta_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .filter(~F.col("vec_id").isin(ext) & (F.col("vec_id") >= n_centroids))
        .orderBy(F.desc("vec_id"))
        .limit(32)
        .collect()
    ]
    base = emb.filter(~F.col("vec_id").isin(delta_ids))
    built = build_sq8_ivf_index(
        spark, sf_dir, n_centroids, corpus=base, tag="inc"
    )
    append_to_sq8_ivf_index(
        spark, built, emb.filter(F.col("vec_id").isin(delta_ids))
    )
    open(marker, "w").close()
    return built


@register(
    "ann_ivf_sq8_appended",
    None,  # oracle attached below: ann_ivf_sq8's composed oracle verbatim
    "The materialized IVF+SQ8 index's INCREMENTAL-APPEND path — the 100 TB "
    "common case (ops/ivf_index.append_to_sq8_ivf_index): new vectors are "
    "SQ8-encoded against the FROZEN per-dimension grid, assigned to the "
    "FROZEN coarse cells (both ride as plan-time literals), and their "
    "codes appended to the cells' postings partitions — cost proportional "
    "to the DELTA, never the corpus, vs the rebuild-only path that "
    "re-quantizes everything.  A grid-staleness gate REFUSES out-of-grid "
    "vectors (their codes would silently distort) — the rebuild signal.  "
    "This entry builds the base index minus a 32-vector delta, appends the "
    "delta, and answers top-k from the stitched index; results are "
    "bit-identical to the full one-shot build (grid kept complete by "
    "holding per-dim extreme achievers in the base — pinned by "
    "tests/test_ivf_index.py) and to ann_ivf_sq8's composed oracle",
)
def ann_ivf_sq8_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.ivf_index import sq8_ivf_topk

    idx = _incremental_index(spark, sf_dir, n_centroids=16)
    return sq8_ivf_topk(spark, idx, k=5, nprobe=2, n_queries=8)


QUERIES["ann_ivf_sq8_appended"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_appended"].fn,
    _ivf_sq8_oracle(),
    QUERIES["ann_ivf_sq8_appended"].description,
)


# ===========================================================================
# Corpus-scale MMR: per-query applyInPandas greedy (round-9 verdict ask #4)
# ===========================================================================

_MMR_GROUPED_SCHEMA = (
    "query_id bigint, mmr_rank int, neighbor_id bigint, mmr_score double"
)


def _mmr_greedy_pdf(pdf):
    """Exact per-query greedy MMR over one query's candidate list.

    Replicates the literal-loop form's arithmetic BIT-FOR-BIT so the two
    forms are interchangeable (parity pinned by test_round10_queries):
    pairwise sims multiply in float32 then accumulate sequentially in
    float64 (Spark's zip_with(x*y) over array<float> + aggregate into a
    double acc), rounding is decimal HALF_UP on the double's shortest repr
    (Spark Round semantics), selection orders by round(raw, 9) desc with
    neighbor_id tiebreak.
    """
    import numpy as np
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x: float, d: int) -> float:
        q = Decimal(1).scaleb(-d)
        return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

    pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
    qid = int(pdf["query_id"].iloc[0])
    ids = pdf["neighbor_id"].to_numpy()
    scores = pdf["score"].to_numpy(dtype=np.float64)
    V32 = np.array([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
    n = len(pdf)

    def seq_sum(prod32: np.ndarray) -> float:
        # float32 elementwise product, then left-to-right float64 fold —
        # cumsum IS sequential accumulation
        return float(np.cumsum(prod32.astype(np.float64))[-1]) if len(prod32) else 0.0

    norms = np.array([np.sqrt(seq_sum(V32[i] * V32[i])) for i in range(n)])
    sims = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            d = norms[i] * norms[j]
            s = rnd(seq_sum(V32[i] * V32[j]) / d, 6) if d > 0 else 0.0
            sims[i, j] = sims[j, i] = s

    lam, mu = _MMR_LAM, 1 - _MMR_LAM
    # round 1: best relevance, neighbor_id tiebreak (ids are sorted asc, so
    # argmax returns the first/lowest id among ties)
    first = int(np.argmax(scores))
    selected = [first]
    out = [(qid, 1, int(ids[first]), rnd(lam * scores[first] + 1e-9, 6))]
    for t in range(2, _MMR_K + 1):
        best, best_key = None, None
        for i in range(n):
            if i in selected:
                continue
            pen = max(sims[i, s] for s in selected)
            raw = lam * scores[i] - mu * pen
            key = (-rnd(raw, 9), int(ids[i]))
            if best_key is None or key < best_key:
                best, best_key, best_raw = i, key, raw
        selected.append(best)
        out.append((qid, t, int(ids[best]), rnd(best_raw + 1e-9, 6)))
    return pd.DataFrame(
        out, columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score"]
    )


@register(
    "mmr_rerank_grouped",
    None,  # generated oracle attached below (shared with the literal-loop)
    "MMR diversified reranking in its CORPUS-SCALE form: after the "
    "distributed relevance retrieval (the same brute_force_topk stage as "
    "mmr_rerank_embeddings), the greedy selection runs per query inside "
    "groupBy(query_id).applyInPandas — one shuffle keyed by query_id, "
    "ZERO driver round-trips, per-group state bounded by the candidate "
    "list (<= 20 vectors), Arrow-batched.  The literal-loop form "
    "(mmr_rerank_embeddings) pays ~8 driver round-trips and isin-literal "
    "growth per query BATCH — right for bounded interactive batches; this "
    "form is flat per query and is what a million-query offline rerank "
    "runs.  Arithmetic is replicated bit-for-bit (float32 products + "
    "sequential float64 accumulation + HALF_UP rounding), so the two "
    "forms return IDENTICAL rows — pinned by parity test and by sharing "
    "the unrolled-CTE oracle",
)
def mmr_rerank_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.similarity import brute_force_topk

    emb = _load_wide(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("embedding").isNotNull())
    queries = corpus.filter(F.col("vec_id") < 8)
    cand = brute_force_topk(corpus, queries, k=_MMR_TOP).select(
        "query_id", "neighbor_id", "score"
    )
    vecs = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")
    )
    # broadcast the CANDIDATE side (queries x 20 rows) against the corpus
    # scan — never the corpus
    feats = vecs.join(F.broadcast(cand), "neighbor_id").select(
        "query_id", "neighbor_id", "score", "vec"
    )
    out = feats.groupBy("query_id").applyInPandas(
        _mmr_greedy_pdf, schema=_MMR_GROUPED_SCHEMA
    )
    return out.orderBy("query_id", "mmr_rank")


QUERIES["mmr_rerank_grouped"] = CatalogQuery(
    QUERIES["mmr_rerank_grouped"].fn,
    _mmr_oracle(),
    QUERIES["mmr_rerank_grouped"].description,
)
