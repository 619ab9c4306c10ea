"""Round-11 catalog additions: the DELETE arm of the index/corpus
lifecycle (round-10 verdict asks #2 and #3).

Round 10 gave every maintenance family an APPEND path (IVF postings,
dedup bucket state, BM25 stats, IVM rollups); a 100 TB deployment with
takedown/TTL obligations needs the other half — retiring a vector or a
document without a rebuild.  ``ann_ivf_sq8_deleted`` exercises
ops/ivf_index's tombstone-delete -> probe-time anti-join -> compaction-
purge chain; ``minhash_retire_pairs_docs`` retires a document slice from
the dedup pair state.  Both oracles are full recomputes over the reduced
corpus — the same IVM correctness contract the append entries pinned.
"""

from __future__ import annotations

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


# ===========================================================================
# IVF+SQ8 tombstone delete (round-10 verdict ask #2)
# ===========================================================================

# the retired slice: deterministic, never a query (vec_id < 8) and never a
# centroid seed (vec_id < 16), so the frozen quantizer geometry is trivially
# unaffected and the oracle only has to drop NEIGHBORS
_DEL_MOD = 7


def _deleted_index(spark: SparkSession, sf_dir: str, n_centroids: int = 16) -> str:
    """Build a full one-shot index (own tagged dir — the canonical index
    stays untouched), then tombstone-delete the retired slice via the
    delta-cost vectors path.  Tombstones are left UNDRAINED so the catalog
    entry exercises the probe-time anti-join; the compaction purge is
    pinned separately in tests/test_ivf_delete.py.  Idempotent per corpus
    fingerprint via a _DELETED marker (a build without the marker is wiped
    and redone — deleting twice is harmless but rebuilding over live
    tombstones is not)."""
    import os
    import shutil

    from ..ops.ivf_index import (
        build_sq8_ivf_index,
        delete_from_sq8_ivf_index,
        index_dir_for,
    )
    from ..sources.files import load_table

    idx = index_dir_for(sf_dir, n_centroids) + "_del"
    marker = os.path.join(idx, "_DELETED")
    if os.path.exists(marker):
        return idx
    if os.path.exists(idx):
        shutil.rmtree(idx, ignore_errors=True)

    built = build_sq8_ivf_index(spark, sf_dir, n_centroids, tag="del")
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    retired = emb.filter(
        (F.pmod(F.col("vec_id"), F.lit(10)) == _DEL_MOD)
        & (F.col("vec_id") >= n_centroids)
    )
    delete_from_sq8_ivf_index(spark, built, vectors=retired)
    open(marker, "w").close()
    return built


def _ivf_sq8_deleted_oracle() -> str:
    """ann_ivf_sq8's composed oracle (full-corpus SQ8 grid — exactly the
    FROZEN grid the tombstone path keeps) with the retired slice excluded
    from the candidate set before ranking."""
    base = _ivf_sq8_oracle()
    anchor = "WHERE neighbor_id <> query_id"
    assert base.count(anchor) == 1, "ann_ivf oracle shape changed"
    return base.replace(
        anchor,
        anchor
        + f"\n        AND NOT (neighbor_id % 10 = {_DEL_MOD}"
        + " AND neighbor_id >= 16)",
    )


@register(
    "ann_ivf_sq8_deleted",
    None,  # composed oracle attached below
    "The materialized IVF+SQ8 index's DELETE path — the takedown/TTL half "
    "of the lifecycle ann_ivf_sq8_appended started "
    "(ops/ivf_index.delete_from_sq8_ivf_index): retired vectors become "
    "(vec_id, cell) tombstones under the index — cell recomputed from the "
    "FROZEN grid/centroid literals exactly as the build assigned it, so "
    "delete cost is proportional to the DELTA with zero index scans — and "
    "sq8_ivf_topk anti-joins them at probe time (the tombstone side is "
    "delete-delta-sized and broadcast; compaction physically drops the "
    "codes and drains the set).  Grid and centroids stay frozen: quantizer "
    "geometry is corpus statistics, not membership, so results equal an "
    "index over the reduced corpus under the same grid — pinned against a "
    "rebuild-without-deleted in tests/test_ivf_delete.py and against "
    "ann_ivf_sq8's composed oracle minus the retired slice here.  This "
    "entry deletes every 10th vector (mod 7, ids >= 16 so queries and "
    "centroid seeds survive) and answers top-k through the live tombstones",
)
def ann_ivf_sq8_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.ivf_index import sq8_ivf_topk

    idx = _deleted_index(spark, sf_dir, n_centroids=16)
    return sq8_ivf_topk(spark, idx, k=5, nprobe=2, n_queries=8)


QUERIES["ann_ivf_sq8_deleted"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_deleted"].fn,
    _ivf_sq8_deleted_oracle(),
    QUERIES["ann_ivf_sq8_deleted"].description,
)


# ===========================================================================
# Dedup-state document retirement (round-10 verdict ask #3)
# ===========================================================================

_RETIRE_MOD = 3


def _retire_pairs_oracle() -> str:
    """Full recompute of the minhash pair set over the REDUCED corpus (the
    retirement correctness contract), composed from the family's shared
    CTE chain with the retired slice dropped at the source."""
    from .docs import _DUCK_MINHASH_CTE

    anchor = "AS t FROM documents"
    assert _DUCK_MINHASH_CTE.count(anchor) == 1, "minhash CTE shape changed"
    reduced = _DUCK_MINHASH_CTE.replace(
        anchor, anchor + f" WHERE doc_id % 10 <> {_RETIRE_MOD}"
    )
    return (
        reduced
        + """
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM buckets l JOIN buckets r
      ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ORDER BY id_a, id_b
    """
    )


@register(
    "minhash_retire_pairs_docs",
    None,  # composed oracle attached below
    "Document retirement for the dedup state — the delete twin of "
    "minhash_delta_pairs_docs: a slice of documents (doc_id % 10 == "
    f"{_RETIRE_MOD}) is retired (takedown/TTL), and the maintained pair "
    "state is updated by SUBTRACTION — every pair touching a retired doc "
    "is invalidated and dropped; no other pair can change because minhash "
    "signatures and bucket memberships are strictly per-document.  That "
    "membership filter is pair-state-sized (and the corpus bucket table "
    "sheds the retired docs by the same anti-join), so retiring a slice "
    "at 100 TB costs the state scan, never a corpus re-shingle.  Output "
    "is the surviving pair state; its complement against "
    "minhash_pairs_docs is exactly the invalidated set.  Oracle: the "
    "registered minhash CTE chain recomputed over the REDUCED corpus — "
    "state-subtraction must be indistinguishable from recomputing without "
    "the retired docs, the same IVM contract the append entries pin",
)
def minhash_retire_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = QUERIES["minhash_pairs_docs"].fn(spark, sf_dir)
    alive = lambda c: F.pmod(c, F.lit(10)) != _RETIRE_MOD  # noqa: E731
    return pairs.filter(
        alive(F.col("id_a")) & alive(F.col("id_b"))
    ).orderBy("id_a", "id_b")


QUERIES["minhash_retire_pairs_docs"] = CatalogQuery(
    QUERIES["minhash_retire_pairs_docs"].fn,
    _retire_pairs_oracle(),
    QUERIES["minhash_retire_pairs_docs"].description,
)


# ===========================================================================
# Cluster retirement: affected-component recompute (the NON-trivial delete)
# ===========================================================================


def _retire_clusters_oracle() -> str:
    """dedup_clusters_docs' registered recursive-CTE oracle recomputed over
    the REDUCED corpus (both the shingle source and the final doc scan)."""
    base = QUERIES["dedup_clusters_docs"].oracle
    a1 = "AS t FROM documents"
    a2 = "FROM documents d"
    assert base.count(a1) == 1 and base.count(a2) == 1, (
        "dedup_clusters oracle shape changed"
    )
    return base.replace(
        a1, a1 + f" WHERE doc_id % 10 <> {_RETIRE_MOD}"
    ).replace(
        a2,
        f"FROM (SELECT * FROM documents WHERE doc_id % 10 <> {_RETIRE_MOD}) d",
    )


@register(
    "dedup_retire_clusters_docs",
    None,  # composed oracle attached below
    "Cluster-state document retirement — the NON-trivial half of dedup "
    "deletion: retiring a doc can SPLIT its near-dup cluster (the retired "
    "doc may be the bridge between two sub-groups), so unlike the pair "
    "state this cannot be maintained by subtraction alone.  The "
    "incremental algorithm is affected-component recompute: components "
    "holding no retired member keep their assignments VERBATIM (no edge "
    "they own can disappear); only the components containing retired docs "
    "have their surviving members re-clustered over their surviving pairs "
    "(the O(log n) large-star/small-star kernel on a subgraph).  Work is "
    "proportional to the AFFECTED components — retired-slice-sized, never "
    "the corpus.  Oracle: the registered recursive-CTE cluster closure "
    "recomputed over the reduced corpus; equality holds because removal "
    "only deletes edges/vertices, so reduced-graph components = unchanged "
    "components + recomputed sub-components (min-id labels agree side by "
    "side)",
)
def dedup_retire_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import connected_components

    # ONE persisted pair set drives both the maintained state and the
    # affected-subgraph recompute: dedup_clusters_docs' clusters are by
    # definition connected components over minhash_pairs_docs' pair list,
    # so building them directly from the shared persisted pairs removes
    # the second LSH bucket self-join the old dedup_clusters_docs call
    # re-ran (guide §2.4/§7.2 duplicated-subtree audit; oracle equality
    # re-proven — the composed oracle is unchanged).  clusters is
    # referenced three times below (affected/keep/members) — persist it
    # too (vertex-sized).
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = QUERIES["minhash_pairs_docs"].fn(spark, sf_dir).persist()
    clusters = (
        connected_components(
            docs.select(F.col("doc_id").alias("id")),
            pairs.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ),
        )
        .select(F.col("id").alias("doc_id"), "cluster")
        .persist()
    )
    retired = F.pmod(F.col("doc_id"), F.lit(10)) == _RETIRE_MOD

    # components touching the retired slice — retired-slice-sized, so the
    # broadcast semi/anti joins below are delta-bounded
    affected = clusters.filter(retired).select("cluster").distinct()
    keep = clusters.join(F.broadcast(affected), "cluster", "left_anti")
    members = clusters.join(
        F.broadcast(affected), "cluster", "left_semi"
    ).filter(~retired)
    alive = lambda c: F.pmod(c, F.lit(10)) != _RETIRE_MOD  # noqa: E731
    # a pair's endpoints share a component, so one semi-join on id_a
    # restricts the edge set to the affected subgraph
    sub_pairs = pairs.filter(
        alive(F.col("id_a")) & alive(F.col("id_b"))
    ).join(
        F.broadcast(members.select(F.col("doc_id").alias("id_a"))),
        "id_a",
        "left_semi",
    )
    re_cc = connected_components(
        members.select(F.col("doc_id").alias("id")),
        sub_pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
    )
    return (
        keep.select("doc_id", "cluster")
        .unionByName(
            re_cc.select(F.col("id").alias("doc_id"), "cluster")
        )
        .orderBy("doc_id")
    )


QUERIES["dedup_retire_clusters_docs"] = CatalogQuery(
    QUERIES["dedup_retire_clusters_docs"].fn,
    _retire_clusters_oracle(),
    QUERIES["dedup_retire_clusters_docs"].description,
)


# ===========================================================================
# Cluster-state append: affected-component recompute on admission
# ===========================================================================


@register(
    "dedup_append_clusters_docs",
    None,  # oracle attached below: dedup_clusters_docs' SQL VERBATIM
    "Cluster-state document ADMISSION — the append twin of "
    "dedup_retire_clusters_docs, completing the cluster lifecycle: a new "
    "doc slice (doc_id % 10 == 0, the same slice minhash_delta_pairs_docs "
    "admits) arrives against a maintained cluster state built WITHOUT it; "
    "the delta's LSH buckets join the corpus bucket table (delta-sized, "
    "never corpus x corpus) to find the new edges, and only the state "
    "components those edges touch are re-clustered together with the "
    "delta docs (connected delta docs can MERGE existing clusters — the "
    "dual of retirement's splits); every untouched component carries over "
    "verbatim, and unmatched delta docs become singletons.  Work is "
    "proportional to the delta plus its touched components.  Oracle: the "
    "registered dedup_clusters_docs SQL VERBATIM — maintained-after-append "
    "must be indistinguishable from clustering the full corpus from "
    "scratch, the IVM contract in its admission direction",
)
def dedup_append_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import connected_components

    is_delta = lambda c: F.pmod(c, F.lit(10)) == 0  # noqa: E731
    docs = _load_wide(spark, sf_dir, "documents")

    # ONE persisted pair set drives every pair-shaped input below: a
    # doc's LSH buckets are a pure function of its own signature, so the
    # state pair set (both endpoints outside the delta) and the admission
    # edge set (>= 1 delta endpoint) are exact FILTERS of the full
    # minhash_pairs_docs list — the old shape ran the bucket self-join
    # twice (full + non-delta inside dedup_clusters) plus a third
    # delta-vs-buckets join (guide §2.4/§7.2; oracle equality re-proven,
    # the oracle is dedup_clusters_docs' SQL verbatim as before).  In
    # production the admission edges come delta-shaped from the
    # maintained bucket table (dedup_state_*, minhash_delta_pairs_docs);
    # this entry is the from-scratch algebra-proof stand-in, which
    # already computes the full pair list for the affected-subgraph
    # restriction — sharing it is strictly fewer corpus passes.
    pairs_full = QUERIES["minhash_pairs_docs"].fn(spark, sf_dir).persist()

    # the maintained state (at rest in production; built here as the
    # local stand-in): components over the corpus WITHOUT the arriving
    # slice = CC over the both-endpoints-non-delta pair subset
    state_clusters = (
        connected_components(
            docs.filter(~is_delta(F.col("doc_id"))).select(
                F.col("doc_id").alias("id")
            ),
            pairs_full.filter(
                ~is_delta(F.col("id_a")) & ~is_delta(F.col("id_b"))
            ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        )
        .select(F.col("id").alias("doc_id"), "cluster")
        .persist()
    )

    # admission edges: every colliding pair with a delta endpoint
    new_pairs = pairs_full.filter(
        is_delta(F.col("id_a")) | is_delta(F.col("id_b"))
    )

    # state components gaining a new edge — delta-bounded
    touched_old = (
        new_pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(new_pairs.select(F.col("id_b").alias("doc_id")))
        .filter(~is_delta(F.col("doc_id")))
        .distinct()
    )
    affected = (
        state_clusters.join(F.broadcast(touched_old), "doc_id", "left_semi")
        .select("cluster")
        .distinct()
    )
    keep = state_clusters.join(F.broadcast(affected), "cluster", "left_anti")
    members = (
        state_clusters.join(F.broadcast(affected), "cluster", "left_semi")
        .select("doc_id")
        .unionByName(docs.filter(is_delta(F.col("doc_id"))).select("doc_id"))
    )
    # edges among the members: state edges live entirely inside state
    # components (so either both endpoints are affected or neither), new
    # edges have a delta endpoint whose old end made its component
    # affected — a both-endpoint membership restriction of the full pair
    # set is therefore exactly the affected subgraph (pairs_full is the
    # persisted frame from above — one pair computation for the query)
    m_a = F.broadcast(members.select(F.col("doc_id").alias("id_a")))
    m_b = F.broadcast(members.select(F.col("doc_id").alias("id_b")))
    edges = (
        pairs_full.join(m_a, "id_a", "left_semi")
        .join(m_b, "id_b", "left_semi")
    )
    re_cc = connected_components(
        members.select(F.col("doc_id").alias("id")),
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    return (
        keep.select("doc_id", "cluster")
        .unionByName(re_cc.select(F.col("id").alias("doc_id"), "cluster"))
        .orderBy("doc_id")
    )


QUERIES["dedup_append_clusters_docs"] = CatalogQuery(
    QUERIES["dedup_append_clusters_docs"].fn,
    QUERIES["dedup_clusters_docs"].oracle,
    QUERIES["dedup_append_clusters_docs"].description,
)


# ===========================================================================
# Rollup retraction: the IVM delete twin of events_incremental_rollup
# ===========================================================================


@register(
    "events_retire_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*)::BIGINT             AS n_events,
           round(sum(value) + 1e-9, 2)  AS sum_value
    FROM events WHERE event_id % 10 <> 0
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour_start, event_type
    """,
    "Incremental rollup RETRACTION (the delete twin of "
    "events_incremental_rollup): a slice of events (event_id % 10 == 0 — "
    "the same slice the append entry admits) is retired from the "
    "maintained hourly rollup by ALGEBRAIC SUBTRACTION — the retired "
    "slice's partial aggregate merges into the state with negated "
    "measures (counts and sums are group aggregates, so retraction is "
    "exact), and groups whose count reaches zero vanish.  The merge "
    "touches state-sized + delta-sized input, never the surviving "
    "history.  Oracle: full recompute over the reduced event set — "
    "retract-then-read must be indistinguishable from recomputing, the "
    "IVM contract in its deletion direction",
)
def events_retire_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import load_table

    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        ).agg(
            (F.count(F.lit(1)) * F.lit(sign)).cast("long").alias("n_events"),
            (F.sum("value") * F.lit(sign)).alias("__sv"),
        )

    state = partial(ev, 1)  # the maintained full rollup (at rest)
    retract = partial(ev.filter(F.pmod(F.col("event_id"), F.lit(10)) == 0), -1)
    return (
        state.unionAll(retract)
        .groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            # +1e-9 nudge (advice r11): state-minus-delta double arithmetic
            # can land a ulp across a .xx5 boundary from the oracle's direct
            # recompute — both engines nudge identically
            F.round(F.sum("__sv") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .filter(F.col("n_events") > 0)
        .orderBy("hour_start", "event_type")
    )


# ===========================================================================
# BM25 stats retraction: the retrieval-side delete twin
# ===========================================================================


@register(
    "bm25_retire_stats_docs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(coalesce(text, '')), '\\s+')
             END AS t
      FROM documents WHERE doc_id % 10 <> {_RETIRE_MOD}
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), per AS (
      SELECT term, count(*)::BIGINT AS doc_freq FROM (
        SELECT doc_id, unnest(list_distinct(t)) AS term FROM lens
      ) GROUP BY term
    ), st AS (
      SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens
    )
    SELECT term, doc_freq,
           round(ln((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)
                 + 1e-9, 6)                                   AS idf,
           n_docs,
           round(CAST(sum_dl AS DOUBLE) / n_docs + 1e-9, 6)   AS avgdl
    FROM per, st
    ORDER BY doc_freq DESC, term
    LIMIT 20
    """,
    "BM25 corpus-statistics RETRACTION — the delete twin of "
    "bm25_incremental_stats_docs: the retired slice's per-term document "
    "frequencies and length/count totals merge into the maintained stats "
    "with NEGATED measures (df/N/sum_dl are group aggregates, so "
    "retraction is exact), terms whose df reaches zero drop out of the "
    "vocabulary, and idf/avgdl re-derive from the retracted constants.  "
    "Retiring a slice costs one delta scan plus a vocabulary-sized merge "
    "— never a rescan of the surviving corpus.  Oracle: full recompute "
    "over the reduced corpus",
)
def bm25_retire_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") > 0)

    def partials(df: DataFrame, sign: int):
        per = (
            df.select("doc_id", F.explode(F.array_distinct("t")).alias("term"))
            .groupBy("term")
            .agg(
                (F.count(F.lit(1)) * F.lit(sign))
                .cast("long")
                .alias("doc_freq")
            )
        )
        st = df.agg(
            (F.count(F.lit(1)) * F.lit(sign)).cast("long").alias("n_docs"),
            (F.sum(F.size("t")) * F.lit(sign)).cast("long").alias("sum_dl"),
        )
        return per, st

    state_per, state_st = partials(lens, 1)  # maintained stats (at rest)
    retire_per, retire_st = partials(
        lens.filter(F.pmod(F.col("doc_id"), F.lit(10)) == _RETIRE_MOD), -1
    )
    per = (
        state_per.unionAll(retire_per)
        .groupBy("term")
        .agg(F.sum("doc_freq").cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") > 0)
    )
    st = state_st.unionAll(retire_st).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    )
    return (
        per.crossJoin(F.broadcast(st))
        .select(
            "term",
            "doc_freq",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
                    / (F.col("doc_freq") + F.lit(0.5))
                    + F.lit(1.0)
                )
                + F.lit(1e-9),
                6,
            ).alias("idf"),
            "n_docs",
            F.round(
                F.col("sum_dl").cast("double") / F.col("n_docs") + F.lit(1e-9),
                6,
            ).alias("avgdl"),
        )
        .orderBy(F.desc("doc_freq"), "term")
        .limit(20)
    )


# ===========================================================================
# Metadata-filtered vector search (same-label top-k)
# ===========================================================================


@register(
    "ann_filtered_topk_embeddings",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
      WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS query_id, v AS qv, label AS qlabel
      FROM e WHERE vec_id < 8
    ), s AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
             CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(qv, e.v)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.query_id
    ), r AS (
      SELECT query_id, neighbor_id, label, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, label, score, rank FROM r WHERE rank <= 5
    """,
    "Metadata-FILTERED vector search — the production retrieval shape "
    "every vector store ships (Milvus/pgvector 'filtered search'): top-k "
    "cosine neighbors restricted to candidates passing a metadata "
    "predicate, here label == the query's own label (the "
    "within-class/hard-positive shape; a static predicate is the "
    "degenerate case).  PRE-filter semantics: the predicate joins into "
    "the candidate set BEFORE ranking, so the engine always returns k "
    "matching neighbors — vs post-filtering a top-k list, which silently "
    "under-returns when matches are sparse.  Plan shape: the tiny query "
    "side broadcasts with the label-equality conjunct fused into the "
    "join condition, so Catalyst prunes candidates at the join, never "
    "materializing the unfiltered score set; at IVF scale the same "
    "predicate rides into the postings scan as a partition/row-group "
    "filter",
)
def ann_filtered_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..ops.similarity import cosine_from_norms, norm

    emb = _load_wide(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("__qn"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        norm(F.col("embedding")).alias("__cn"),
        "label",
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "label",
        F.round(
            cosine_from_norms(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


# ===========================================================================
# Filtered search ON the materialized index (payload-column pushdown)
# ===========================================================================


def _ivf_sq8_filtered_oracle() -> str:
    """ann_ivf_sq8's composed oracle with the same-label predicate added
    to the candidate set before ranking (labels looked up from the source
    table — the oracle's stand-in for the postings payload column)."""
    base = _ivf_sq8_oracle()
    anchor = "WHERE neighbor_id <> query_id"
    assert base.count(anchor) == 1, "ann_ivf oracle shape changed"
    with_label = base.replace(
        anchor,
        anchor
        + """
        AND (SELECT label FROM embeddings lx WHERE lx.vec_id = neighbor_id)
          = (SELECT label FROM embeddings ly WHERE ly.vec_id = query_id)""",
    )
    # surface the label column like the engine does
    tail = "SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5"
    assert with_label.count(tail) == 1, "ann_ivf oracle tail changed"
    return with_label.replace(
        tail,
        "SELECT query_id, neighbor_id, "
        "(SELECT label FROM embeddings lz WHERE lz.vec_id = neighbor_id) "
        "AS label, score, rank FROM r WHERE rank <= 5",
    )


@register(
    "ann_ivf_sq8_filtered",
    None,  # composed oracle attached below
    "Metadata-filtered search answered FROM THE MATERIALIZED INDEX alone "
    "(the production form of ann_filtered_topk_embeddings): postings "
    "layout v2 carries a label payload column beside the codes, so the "
    "filtered probe needs no join back to the source table — cells are "
    "pruned by the partition column (DPP from the broadcast query side), "
    "then the label-equality conjunct filters rows INSIDE the probed "
    "cells (at 100 TB, parquet row-group min/max stats on the payload "
    "column prune within cells too).  PRE-filter semantics: the predicate "
    "applies before ranking, so every returned row matches; queries with "
    "fewer than k same-label candidates in their probed cells return "
    "short lists — the honest IVF-recall trade, identical in the oracle.  "
    "Oracle composed from ann_ivf_sq8's registered SQL plus the label "
    "predicate",
)
def ann_ivf_sq8_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.ivf_index import build_sq8_ivf_index, sq8_ivf_topk

    idx = build_sq8_ivf_index(spark, sf_dir, n_centroids=16)
    return sq8_ivf_topk(
        spark, idx, k=5, nprobe=2, n_queries=8, filter_same_label=True
    )


QUERIES["ann_ivf_sq8_filtered"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_filtered"].fn,
    _ivf_sq8_filtered_oracle(),
    QUERIES["ann_ivf_sq8_filtered"].description,
)


# ===========================================================================
# Two-stage refined retrieval: SQ8 index recall -> exact re-scoring
# ===========================================================================

_REFINE_R = 20  # stage-1 candidate depth per query


def _ivf_sq8_refined_oracle() -> str:
    """Stage 1 = ann_ivf_sq8's composed oracle widened to top-R; stage 2 =
    exact cosine on the RAW vectors over those candidates, re-ranked."""
    base = _ivf_sq8_oracle()
    anchor = "WHERE rank <= 5"
    assert base.count(anchor) == 1, "ann_ivf_sq8 oracle tail changed"
    widened = base.replace(anchor, f"WHERE rank <= {_REFINE_R}")
    return f"""
    WITH cand AS (
      SELECT query_id, neighbor_id FROM ({widened})
    ), raw AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), rescored AS (
      SELECT c.query_id, c.neighbor_id,
             CASE WHEN sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v)) > 0
                  THEN round(list_dot_product(q.v, n.v)
                       / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)
                  ELSE 0.0 END AS score
      FROM cand c
      JOIN raw q ON q.vec_id = c.query_id
      JOIN raw n ON n.vec_id = c.neighbor_id
    ), rr AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM rescored
    )
    SELECT query_id, neighbor_id, score, rank FROM rr WHERE rank <= 5
    """


@register(
    "ann_ivf_sq8_refined",
    None,  # composed oracle attached below
    "Two-stage refined retrieval — the FAISS 'refine' deployment shape "
    "that recovers exact-distance quality from a quantized index: stage 1 "
    f"pulls top-{_REFINE_R} candidates per query from the materialized "
    "SQ8 index (cell-pruned, reconstruction-scored — 4x less memory "
    "traffic), stage 2 fetches ONLY those candidates' RAW vectors (a "
    "candidate-bounded broadcast join against the vector store — at "
    "100 TB a point-lookup tier, never a scan re-rank of the corpus) and "
    "re-scores them with exact cosine, returning the re-ranked top-5.  "
    "Quantization error affects only stage-1 RECALL, never the final "
    "ordering/scores of surviving candidates.  Oracle: ann_ivf_sq8's "
    "composed SQL widened to top-R as stage 1, raw-vector re-scoring as "
    "stage 2",
)
def ann_ivf_sq8_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..ops.ivf_index import build_sq8_ivf_index, sq8_ivf_topk
    from ..ops.similarity import cosine_from_norms, norm

    idx = build_sq8_ivf_index(spark, sf_dir, n_centroids=16)
    cand = sq8_ivf_topk(
        spark, idx, k=_REFINE_R, nprobe=2, n_queries=8
    ).select("query_id", "neighbor_id")

    raw = _load_wide(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    q = raw.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("__qn"),
    )
    # candidate list (queries x R rows) broadcasts against ONE raw scan;
    # the 8 query vectors then broadcast onto the surviving candidates
    rescored = (
        raw.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("cv"),
            norm(F.col("v")).alias("__cn"),
        )
        .join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


QUERIES["ann_ivf_sq8_refined"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_refined"].fn,
    _ivf_sq8_refined_oracle(),
    QUERIES["ann_ivf_sq8_refined"].description,
)


# ===========================================================================
# Grid-staleness gauge: the append path's rebuild-decision measurement
# ===========================================================================


@register(
    "sq8_grid_staleness_embeddings",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), base AS (SELECT * FROM e WHERE vec_id % 5 <> 4),
    delta AS (SELECT * FROM e WHERE vec_id % 5 = 4),
    bvals AS (
      SELECT generate_subscripts(v, 1) AS j, unnest(v) AS x FROM base
    ), grid AS (
      SELECT j, min(x) AS mn, max(x) AS mx FROM bvals GROUP BY j
    ), dvals AS (
      SELECT vec_id, generate_subscripts(v, 1) AS j, unnest(v) AS x
      FROM delta
    ), jd AS (
      SELECT dvals.vec_id, dvals.x, grid.mn, grid.mx,
             greatest(grid.mn - dvals.x, dvals.x - grid.mx, 0.0) AS over
      FROM dvals JOIN grid USING (j)
    ), pervec AS (
      SELECT vec_id,
             max(CASE WHEN over > 0 THEN 1 ELSE 0 END) AS oob,
             max(CASE WHEN mx > mn THEN over / (mx - mn) END) AS rel
      FROM jd GROUP BY vec_id
    ), counts AS (
      SELECT (SELECT count(*) FROM base)::BIGINT  AS n_base,
             (SELECT count(*) FROM delta)::BIGINT AS n_delta
    )
    SELECT n_base, n_delta,
           (SELECT coalesce(sum(oob), 0) FROM pervec)::BIGINT AS n_oob_vectors,
           round(CAST((SELECT coalesce(sum(oob), 0) FROM pervec) AS DOUBLE)
                 / n_delta + 1e-9, 6) AS oob_share,
           round(coalesce((SELECT max(rel) FROM pervec), 0.0) * 1e6
                 + 1e-9, 6) AS max_overshoot_ppm
    FROM counts
    """,
    "Grid-staleness gauge — the DECISION measurement behind the append "
    "path's refuse-or-rebuild gate (append_to_sq8_ivf_index rejects "
    "out-of-grid vectors; this gauge tells the operator how close an "
    "incoming slice is to tripping it): the corpus splits into the frozen "
    "base (vec_id % 5 != 4) and the arriving delta; the base's "
    "per-dimension [mn, mx] grid is computed once, and the delta reports "
    "how many of its vectors fall outside any dimension's range plus the "
    "worst relative overshoot in ppm of the dimension's span.  0 oob -> "
    "append freely; small overshoot -> clamp-distortion bound if forced; "
    "large -> rebuild.  Scale shape: one dim-keyed aggregate over the "
    "base (dim rows, broadcast back), one delta-sized scan, 1-row result",
)
def sq8_grid_staleness_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    base = e.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 4)
    delta = e.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 4)

    grid = (
        base.select(F.posexplode("v").alias("j", "x"))
        .groupBy("j")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    dvals = delta.select("vec_id", F.posexplode("v").alias("j", "x"))
    jd = dvals.join(F.broadcast(grid), "j").select(
        "vec_id",
        F.greatest(
            F.col("mn") - F.col("x"), F.col("x") - F.col("mx"), F.lit(0.0)
        ).alias("over"),
        F.col("mx"),
        F.col("mn"),
    )
    pervec = jd.groupBy("vec_id").agg(
        F.max(F.when(F.col("over") > 0, 1).otherwise(0)).alias("oob"),
        F.max(
            F.when(
                F.col("mx") > F.col("mn"),
                F.col("over") / (F.col("mx") - F.col("mn")),
            )
        ).alias("rel"),
    )
    n_base = base.agg(F.count(F.lit(1)).cast("long").alias("n_base"))
    n_delta = delta.agg(F.count(F.lit(1)).cast("long").alias("n_delta"))
    roll = pervec.agg(
        F.coalesce(F.sum("oob"), F.lit(0)).cast("long").alias("n_oob_vectors"),
        F.coalesce(F.max("rel"), F.lit(0.0)).alias("__rel"),
    )
    return (
        n_base.crossJoin(F.broadcast(n_delta))
        .crossJoin(F.broadcast(roll))
        .select(
            "n_base",
            "n_delta",
            "n_oob_vectors",
            F.round(
                F.col("n_oob_vectors").cast("double") / F.col("n_delta")
                + F.lit(1e-9),
                6,
            ).alias("oob_share"),
            F.round(F.col("__rel") * F.lit(1e6) + F.lit(1e-9), 6).alias(
                "max_overshoot_ppm"
            ),
        )
    )
