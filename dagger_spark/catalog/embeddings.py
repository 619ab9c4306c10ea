"""embeddings: similarity search.

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403

# ===========================================================================
# embeddings: similarity search
# ===========================================================================

_ANN_ORACLE = """
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
    c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings
         WHERE embedding IS NOT NULL),
    s AS (
      SELECT qid AS query_id, nid AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                  THEN round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
                  ELSE 0.0 END AS score
      FROM q, c WHERE nid <> qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_brute_force",
    _ANN_ORACLE,
    "exact cosine top-5 per query vector (broadcast queries, scan corpus)",
)
def ann_brute_force(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(emb, queries, k=5)


def _planes_sql(num_planes: int = 4, dim: int = 64) -> str:
    cases = []
    for p in range(num_planes):
        coeffs = ", ".join(repr(c) for c in _plane_coeffs(p, dim))
        cases.append(
            f"(CASE WHEN list_dot_product(v, [{coeffs}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        )
    return " || ".join(cases)


_ANN_LSH_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), bucketed AS (
      SELECT vec_id, v, {_planes_sql(4, 64)} AS bucket FROM e
    ), q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bucketed WHERE vec_id < 8),
    s AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)) > 0
                  THEN round(list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN bucketed c ON q.bucket = c.bucket AND c.vec_id <> q.qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_lsh",
    _ANN_LSH_ORACLE,
    "LSH-bucketed approximate top-5: sign-random-projection buckets, "
    "bucket-local candidate join (the 100 TB path)",
)
def ann_lsh(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return lsh_topk(emb, queries, k=5, num_planes=4, dim=64)


_NEARDUP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), b AS (
      SELECT vec_id, v, {_planes_sql(4, 64)} AS bucket FROM e
    ), pairs AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)) > 0
                  THEN round(list_dot_product(a.v, c.v)
                       / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
                  ELSE 0.0 END AS score
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, score FROM pairs WHERE score >= 0.35
"""

@register(
    "embedding_neardup",
    _NEARDUP_ORACLE,
    "embedding-cosine near-duplicate pairs, LSH-bucket-restricted self-join "
    "(n^2 -> sum of per-bucket squares at scale)",
)
def embedding_neardup(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return cosine_neardup_pairs(emb, threshold=0.35, num_planes=4, dim=64)


_ANN_IVF_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), corpus_cell AS (
      SELECT vec_id AS neighbor_id, v AS cv, cid AS cell FROM ranked WHERE rnk = 1
    ), query_cells AS (
      SELECT vec_id AS query_id, v AS qv, cid AS cell
      FROM ranked WHERE vec_id < 8 AND rnk <= 2
    ), s AS (
      SELECT query_id, neighbor_id,
             CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) > 0
                  THEN round(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)
                  ELSE 0.0 END AS score
      FROM query_cells q JOIN corpus_cell c USING (cell)
      WHERE neighbor_id <> query_id
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""

_KMEANS_STEP_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), member AS (
      SELECT vec_id, v, cid AS cell FROM ranked WHERE rnk = 1
    ), counts AS (
      SELECT cell, cast(count(*) AS bigint) AS n_members FROM member GROUP BY cell
    ), dims AS (
      SELECT cell, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM member
    ), means AS (
      SELECT cell, cast(dim AS bigint) AS dim, round(avg(x), 6) AS mean_x
      FROM dims GROUP BY cell, dim
    )
    SELECT m.cell, m.dim, m.mean_x, c.n_members
    FROM means m JOIN counts c USING (cell)
"""

@register(
    "kmeans_step_embeddings",
    _KMEANS_STEP_ORACLE,
    "one distributed k-means (Lloyd) iteration: map-side nearest-centroid "
    "assignment (the IVF quantizer's training step) + dim-wise centroid "
    "recompute via posexplode + grouped avg — one shuffle keyed by "
    "(cell, dim), long-form output so the oracle compares scalars",
)
def kmeans_step_embeddings(spark, sf_dir):
    from ..ops.similarity import kmeans_step

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return kmeans_step(emb, n_centroids=16)


@register(
    "ann_ivf",
    _ANN_IVF_ORACLE,
    "IVF-flat approximate top-5: 16-cell coarse quantizer shipped as "
    "literals (map-side assignment, no shuffle), nprobe=2 cell-local search",
)
def ann_ivf(spark, sf_dir):
    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=2)


_PQ_ANN_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cb AS (
      SELECT vec_id AS j, v FROM e WHERE vec_id < 16
    ), subs AS (
      SELECT unnest(generate_series(0, 7)) AS s
    ), cd AS (
      SELECT e.vec_id, subs.s, cb.j,
        round(list_dot_product(list_slice(e.v, subs.s*8+1, subs.s*8+8), list_slice(e.v, subs.s*8+1, subs.s*8+8))
            + list_dot_product(list_slice(cb.v, subs.s*8+1, subs.s*8+8), list_slice(cb.v, subs.s*8+1, subs.s*8+8))
            - 2*list_dot_product(list_slice(e.v, subs.s*8+1, subs.s*8+8), list_slice(cb.v, subs.s*8+1, subs.s*8+8)), 9) AS d
      FROM e, subs, cb
    ), codes AS (
      SELECT vec_id, s, j AS code FROM (
        SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn FROM cd
      ) t WHERE rn = 1
    ), code_list AS (
      SELECT vec_id, list(code ORDER BY s) AS cs FROM codes GROUP BY vec_id
    ), qlut1 AS (
      SELECT vec_id AS query_id, s, list(d ORDER BY j) AS lut_s
      FROM cd WHERE vec_id < 8 GROUP BY vec_id, s
    ), qlut AS (
      SELECT query_id, list(lut_s ORDER BY s) AS lut FROM qlut1 GROUP BY query_id
    ), adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, 9), i -> q.lut[i][c.cs[i] + 1])), 6) AS adist
      FROM qlut q, code_list c WHERE c.vec_id <> q.query_id
    ), r AS (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, adist, rank FROM r WHERE rank <= 5
"""

@register(
    "ann_pq_adc",
    _PQ_ANN_ORACLE,
    "product-quantization ANN (8 subspaces x 16 codewords, asymmetric "
    "distance): corpus reduced to 8-byte codes, query LUT broadcast — the "
    "memory-compressed scan path for 100 TB embedding corpora",
)
def ann_pq_adc(spark, sf_dir):
    from ..ops.similarity import pq_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return pq_topk(emb, queries, k=5, m=8, ksub=16)


def _ann_recall_oracle():
    """Compose the recall oracle from the four method oracles (each a full
    WITH..SELECT — DuckDB accepts CTEs inside subqueries)."""
    branches = []
    for method, osql in (
        ("ivf", _ANN_IVF_ORACLE),
        ("lsh", _ANN_LSH_ORACLE),
        ("pq", _PQ_ANN_ORACLE),
    ):
        branches.append(f"""
      SELECT '{method}' AS method, b.query_id,
             count(m.neighbor_id)::DOUBLE / 5 AS recall
      FROM brute b LEFT JOIN ({osql}) m
        ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
      GROUP BY b.query_id""")
    per = "\n      UNION ALL\n".join(branches)
    return f"""
    WITH brute AS (SELECT query_id, neighbor_id FROM ({_ANN_ORACLE}) tb),
    per AS ({per}
    )
    SELECT method, round(avg(recall), 6) AS avg_recall,
           round(min(recall), 6) AS min_recall,
           CAST(count(*) AS BIGINT) AS n_queries
    FROM per GROUP BY method
"""


@register(
    "ann_recall",
    _ann_recall_oracle(),
    "recall@5 of every approximate ANN method (LSH, IVF, PQ-ADC) against "
    "the exact brute-force top-5, per method avg/min over the query batch "
    "— the measure-don't-guess gauge for tuning nprobe/planes/codebooks; "
    "all four methods are deterministic so recall itself is oracle-exact. "
    "NB the synthetic corpus is ~uniform random vectors — the WORST case "
    "for sign-LSH and PQ (no cluster structure, near-tied scores): IVF "
    "still reaches ~0.9 here, LSH/PQ honestly report the floor",
)
def ann_recall(spark, sf_dir):
    from ..ops.similarity import pq_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    # persist the truth set: it is (queries x 5) rows, but its LINEAGE is
    # the full brute-force corpus scan, and the per-method recall join
    # below references it once PER METHOD — unpersisted, the physical
    # plan embeds three copies of the brute-force subtree (3x the corpus
    # scans; guide §2.4 "remove shuffles outright" / duplicated-subtree
    # audit §7.2).  Measured at sf0.1: plan drops from 3 BNLJ brute
    # branches + 32 parquet scans to 1 + cached reuse.
    brute = (
        brute_force_topk(emb, queries, k=5)
        .select("query_id", "neighbor_id")
        .persist()
    )
    methods = {
        "ivf": ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=2),
        "lsh": lsh_topk(emb, queries, k=5, num_planes=4, dim=64),
        "pq": pq_topk(emb, queries, k=5, m=8, ksub=16),
    }
    parts = []
    for method, df in methods.items():
        m = df.select(
            F.col("query_id").alias("m_qid"),
            F.col("neighbor_id").alias("m_nid"),
            F.lit(1).alias("__hit"),
        )
        per = (
            brute.join(
                m,
                (F.col("query_id") == F.col("m_qid"))
                & (F.col("neighbor_id") == F.col("m_nid")),
                "left",
            )
            .groupBy("query_id")
            .agg((F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / 5.0).alias("recall"))
            .select(F.lit(method).alias("method"), "query_id", "recall")
        )
        parts.append(per)
    per_all = parts[0]
    for p in parts[1:]:
        per_all = per_all.unionByName(p)
    return per_all.groupBy("method").agg(
        F.round(F.avg("recall"), 6).alias("avg_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
    )


_SEMDEDUP_ORACLE = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, e.v, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), ranked AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) AS rnk
      FROM assign
    ), member AS (
      SELECT vec_id, v, cid AS cell FROM ranked WHERE rnk = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM member a JOIN member b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) > 0
                 THEN round(list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                 ELSE 0.0 END >= 0.4
    )
    SELECT m.vec_id, m.cell, (d.vec_id IS NULL) AS kept
    FROM member m LEFT JOIN dropped d ON m.vec_id = d.vec_id
"""

@register(
    "semdedup_embeddings",
    _SEMDEDUP_ORACLE,
    "SemDeDup (arXiv:2303.09540) semantic dedup: 16-cell coarse quantizer, "
    "cluster-local triangular cosine prune at 0.4 — pair space is "
    "sum-of-per-cell-squares, never n^2",
)
def semdedup_embeddings(spark, sf_dir):
    from ..ops.similarity import semdedup

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return semdedup(emb, n_centroids=16, threshold=0.4)


