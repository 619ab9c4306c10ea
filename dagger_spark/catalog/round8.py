"""Round-8 additions: classifier evaluation (exact ROC-AUC on the
distributed rank family, Cohen's kappa between raters), PMI collocation
mining, per-source KL divergence and the cross-source near-dup matrix
for corpus governance, Matryoshka prefix-dimension retrieval recall,
per-label centroid similarity, contrastive hard-negative mining,
per-doc n-gram novelty, and a tokenizer fertility audit — the
model-quality / corpus-composition gauges a training-data pipeline runs
beside the filters the earlier rounds built.

Same pairing conventions as the rest of the catalog (see ._base): every
entry oracle-paired; counts stay exact integers; products that can reach
N^2-and-beyond cast to double BEFORE multiplying with identical
placement in both engines (the round-7 chi2 overflow lesson); sums of
doubles land behind round(…, 6) where magnitudes are O(1).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from .docs import _DUCK_TOKS  # noqa: F401
from .quality import _classifier_weights_sql


_CLS_SCORE_SQL = f"""
    g AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg
      FROM (SELECT doc_id, lang, lower(trim(coalesce(text, ''))) AS t
            FROM documents)
    ), sc AS (
      SELECT doc_id, (lang = 'en') AS en,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit_milli
      FROM g, (SELECT {{weights}} AS w)
    )"""


@register(
    "classifier_auc_docs",
    f"""
    WITH {_CLS_SCORE_SQL.format(weights=_classifier_weights_sql())},
    byscore AS (
      SELECT logit_milli AS s,
             count(*)::BIGINT                              AS n,
             sum(CASE WHEN en THEN 1 ELSE 0 END)::BIGINT   AS pos
      FROM sc GROUP BY logit_milli
    ), c AS (
      SELECT s, n, pos,
             sum(n) OVER (ORDER BY s)::BIGINT AS cum
      FROM byscore
    ), terms AS (
      SELECT CAST(pos * (2 * cum - n + 1) AS DOUBLE) AS t2, n, pos FROM c
    ), tot AS (
      SELECT sum(t2) AS s2,
             sum(pos)::BIGINT AS p,
             sum(n)::BIGINT   AS nt
      FROM terms
    )
    SELECT p                                              AS n_pos,
           nt - p                                         AS n_neg,
           round((s2 - CAST(p AS DOUBLE) * (p + 1))
                 / (2.0 * CAST(p AS DOUBLE) * CAST(nt - p AS DOUBLE))
                 + 1e-9, 6)                               AS auc
    FROM tot
    """,
    "Exact ROC-AUC of the hashing-trick quality classifier against the "
    "lang='en' label via the rank-sum (Mann-Whitney) identity with "
    "average-rank tie handling: AUC = (sum of positive ranks - P(P+1)/2) "
    "/ (P*N).  No per-row rank is ever materialized — scores collapse to "
    "a per-DISTINCT-SCORE aggregate (n, n_pos), the inclusive cumulative "
    "count comes from ops/rank.global_cumsum (two skew-free range-"
    "partitioned passes, never a data-sized single-partition window), and "
    "2*avg_rank = 2*cum - n + 1 keeps tie handling in exact int64 per "
    "term (each term <= n(s) * 2N, safe to ~2e9 rows); terms are cast to "
    "double BEFORE the final sum because their total reaches N^2.  The "
    "logit is the catalog's integer milli-unit score, so both engines "
    "rank the identical values; one final division, round(6)",
)
def classifier_auc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import global_cumsum
    from ..ops.text import char_trigrams, classifier_weights, hashing_trick_logit

    docs = _load_wide(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("lang") == "en").alias("en"),
        hashing_trick_logit(
            char_trigrams(F.col("text")), classifier_weights()
        ).alias("s"),
    )
    # persist the per-distinct-score rollup: global_cumsum reads its input
    # twice (boundary-sketch pass + the rank window), and byscore's
    # lineage is the md5-trigram hashing-trick scoring of every document
    # — unpersisted, that corpus pass runs twice (guide §7.2).  The frame
    # is distinct-logit-sized.
    byscore = scored.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("en"), 1).otherwise(0)).cast("long").alias("pos"),
    ).persist()
    c = global_cumsum(byscore, ["s"], "n", "cum")
    terms = c.select(
        (F.col("pos") * (2 * F.col("cum") - F.col("n") + 1))
        .cast("double")
        .alias("t2"),
        "n",
        "pos",
    )
    tot = terms.agg(
        F.sum("t2").alias("s2"),
        F.sum("pos").cast("long").alias("p"),
        F.sum("n").cast("long").alias("nt"),
    )
    return tot.select(
        F.col("p").alias("n_pos"),
        (F.col("nt") - F.col("p")).alias("n_neg"),
        F.round(
            (F.col("s2") - F.col("p").cast("double") * (F.col("p") + 1))
            / (
                F.lit(2.0)
                * F.col("p").cast("double")
                * (F.col("nt") - F.col("p")).cast("double")
            )
            + F.lit(1e-9),
            6,
        ).alias("auc"),
    )


@register(
    "pmi_collocations_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), bg AS (
      SELECT unnest(list_transform(
               range(1, len(t)), i -> [t[i], t[i + 1]])) AS p
      FROM toks WHERE len(t) >= 2
    ), bc AS (
      SELECT p[1] AS w1, p[2] AS w2, count(*)::BIGINT AS c_ab
      FROM bg GROUP BY p[1], p[2]
    ), uni AS (
      SELECT u AS tok, count(*)::BIGINT AS c
      FROM (SELECT unnest(t) AS u FROM toks) GROUP BY u
    ), tot AS (
      SELECT (SELECT sum(c)::BIGINT FROM uni)     AS nu,
             (SELECT sum(c_ab)::BIGINT FROM bc)   AS nb
    )
    SELECT w1, w2, c_ab,
           round(ln(CAST(c_ab AS DOUBLE) * CAST(nu AS DOUBLE)
                    * CAST(nu AS DOUBLE)
                    / (CAST(nb AS DOUBLE) * CAST(a.c AS DOUBLE)
                       * CAST(b.c AS DOUBLE)))
                 + 1e-9, 6) AS pmi
    FROM bc
    JOIN uni a ON a.tok = w1
    JOIN uni b ON b.tok = w2
    CROSS JOIN tot
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 30
    """,
    "Collocation mining: top-30 adjacent-token bigrams by pointwise "
    "mutual information, PMI = ln(p(ab) / (p(a) p(b))) with unigram "
    "probabilities from the token stream and bigram probability from the "
    "adjacent-pair stream, min count 5 — the classic phrase-vocabulary "
    "inducer (word2vec-phrases shape) run before tokenizer training.  "
    "Counts are exact integers; every product is cast to double FIRST "
    "(c_ab * Nu^2 reaches corpus-tokens^3 — int64 dies at ~2M tokens; "
    "the round-7 chi2 lesson applied at design time); one ln per "
    "surviving pair, identical tree both engines.  Shape: explode "
    "bigrams -> pair-keyed aggregate, two token-keyed equi-joins onto "
    "the unigram aggregate (vocab-sized, shuffle-safe), 1-row broadcast "
    "totals, top-30 via TakeOrderedAndProject",
)
def pmi_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("nu")).crossJoin(
        bc.agg(F.sum("c_ab").cast("long").alias("nb"))
    )
    a = uni.select(F.col("tok").alias("__ta"), F.col("c").alias("__ca"))
    b = uni.select(F.col("tok").alias("__tb"), F.col("c").alias("__cb"))
    joined = (
        bc.filter(F.col("c_ab") >= 5)
        .join(a, F.col("w1") == F.col("__ta"))
        .join(b, F.col("w2") == F.col("__tb"))
        .join(F.broadcast(tot))
    )
    pmi = F.round(
        F.log(
            F.col("c_ab").cast("double")
            * F.col("nu").cast("double")
            * F.col("nu").cast("double")
            / (
                F.col("nb").cast("double")
                * F.col("__ca").cast("double")
                * F.col("__cb").cast("double")
            )
        )
        + F.lit(1e-9),
        6,
    )
    return (
        joined.select("w1", "w2", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(30)
    )


@register(
    "source_kl_divergence_docs",
    f"""
    WITH toks AS (
      SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), st AS (
      SELECT source, tok, count(*)::BIGINT AS c FROM toks
      GROUP BY source, tok
    ), ct AS (
      SELECT tok, sum(c)::BIGINT AS ctot FROM st GROUP BY tok
    ), ts AS (
      SELECT source, sum(c)::BIGINT AS t FROM st GROUP BY source
    ), tt AS (
      SELECT sum(c)::BIGINT AS tall FROM st
    )
    SELECT st.source,
           ts.t                                            AS n_tokens,
           count(*)::BIGINT                                AS n_types,
           round(sum((CAST(st.c AS DOUBLE) / CAST(ts.t AS DOUBLE))
                     * ln((CAST(st.c AS DOUBLE) / CAST(ts.t AS DOUBLE))
                          / (CAST(ct.ctot AS DOUBLE)
                             / CAST(tt.tall AS DOUBLE))))
                 + 1e-9, 6)                                AS kl_nats
    FROM st
    JOIN ct USING (tok)
    JOIN ts ON ts.source = st.source
    CROSS JOIN tt
    GROUP BY st.source, ts.t
    ORDER BY st.source
    """,
    "Corpus-governance divergence gauge: per source, KL(P_source || "
    "P_corpus) over token unigram distributions in nats — 'how far does "
    "this crawl's language drift from the blend?', the quantity mixture "
    "rebalancing (DoReMi-style) monitors per ingest.  No smoothing "
    "needed in closed form: every source token exists in the corpus "
    "distribution (q > 0 always) and absent tokens contribute p·ln(p/q) "
    "= 0, so the sum runs over the source's own (source, token) rows "
    "only.  Shape: one explode -> (source, token)-keyed aggregate, the "
    "corpus distribution RE-AGGREGATED from that same table (no second "
    "scan), token-keyed equi-join, source-keyed rollup, 1-row broadcast "
    "total; per-term doubles behind round(6) where KL is O(1)",
)
def source_kl_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ct = st.groupBy("tok").agg(F.sum("c").cast("long").alias("ctot"))
    ts = st.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    tt = st.agg(F.sum("c").cast("long").alias("tall"))
    p = F.col("c").cast("double") / F.col("t").cast("double")
    q = F.col("ctot").cast("double") / F.col("tall").cast("double")
    return (
        st.join(ct, "tok")
        .join(F.broadcast(ts), "source")
        .join(F.broadcast(tt))
        .groupBy("source", "t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(F.sum(p * F.log(p / q)) + F.lit(1e-9), 6).alias(
                "kl_nats"
            ),
        )
        .select(
            "source",
            F.col("t").alias("n_tokens"),
            "n_types",
            "kl_nats",
        )
        .orderBy("source")
    )


_MATRYOSHKA_DIMS = (8, 16, 32, 64)


@register(
    "matryoshka_recall_embeddings",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5
    ), d AS (
      SELECT unnest([8, 16, 32, 64]) AS dims
    ), s AS (
      SELECT q.qid AS query_id, e.vec_id AS neighbor_id, d.dims,
             CASE WHEN sqrt(list_dot_product(q.qv[1:d.dims],
                                             q.qv[1:d.dims]))
                       * sqrt(list_dot_product(e.v[1:d.dims],
                                               e.v[1:d.dims])) > 0
                  THEN round(list_dot_product(q.qv[1:d.dims],
                                              e.v[1:d.dims])
                             / (sqrt(list_dot_product(q.qv[1:d.dims],
                                                      q.qv[1:d.dims]))
                                * sqrt(list_dot_product(e.v[1:d.dims],
                                                        e.v[1:d.dims]))),
                             6)
                  ELSE 0.0 END AS score
      FROM q, e, d WHERE e.vec_id <> q.qid
    ), r AS (
      SELECT query_id, neighbor_id, dims,
             row_number() OVER (PARTITION BY query_id, dims
                                ORDER BY score DESC, neighbor_id) AS rk
      FROM s
    ), topk AS (
      SELECT query_id, neighbor_id, dims FROM r WHERE rk <= 10
    ), fullk AS (
      SELECT query_id, neighbor_id FROM topk WHERE dims = 64
    )
    SELECT t.query_id AS query_id,
           t.dims AS dims,
           CAST(count(f.neighbor_id) AS BIGINT)        AS n_hits,
           CAST(count(f.neighbor_id) AS DOUBLE) / 10.0 AS recall
    FROM topk t
    LEFT JOIN fullk f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY t.query_id, t.dims
    ORDER BY t.query_id, t.dims
    """,
    "Matryoshka-representation retrieval gauge: exact cosine top-10 per "
    "query at PREFIX dimensions 8/16/32/64 (MRL-trained embeddings front-"
    "load information, so truncated prefixes are the standard cheap "
    "first-stage retriever), scored as recall@10 against the full-"
    "dimension top-10 — the curve that decides how many dims the ANN "
    "index actually needs.  Same plan skeleton as ann_brute_force: "
    "queries are a literal-class broadcast (vec_id < 5 over the scan), "
    "prefix dots/norms via slice+zip_with+aggregate in codegen, per-"
    "(query, dims) top-10 on a bounded window, then a tiny equi-join of "
    "the 200-row top-k table against its own dims=64 slice.  Scores "
    "round(6) BEFORE ranking with a neighbor_id tiebreak, so both "
    "engines rank identically",
)
def matryoshka_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = (
        _load_wide(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )

    def pre(col, d):
        return F.slice(col, 1, d)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        *[F.sqrt(dot(pre(F.col("v"), d), pre(F.col("v"), d))).alias(f"cn{d}")
          for d in _MATRYOSHKA_DIMS],
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        *[F.sqrt(dot(pre(F.col("v"), d), pre(F.col("v"), d))).alias(f"qn{d}")
          for d in _MATRYOSHKA_DIMS],
    )
    joined = corpus.join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    )
    per_dim = [
        F.struct(
            F.lit(d).alias("dims"),
            F.when(
                F.col(f"qn{d}") * F.col(f"cn{d}") > 0,
                F.round(
                    dot(pre(F.col("qv"), d), pre(F.col("cv"), d))
                    / (F.col(f"qn{d}") * F.col(f"cn{d}")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
        for d in _MATRYOSHKA_DIMS
    ]
    stacked = joined.select(
        "query_id", "neighbor_id", F.explode(F.array(*per_dim)).alias("x")
    ).select("query_id", "neighbor_id", "x.dims", "x.score")
    w = Window.partitionBy("query_id", "dims").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    topk = (
        stacked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id", "dims")
    )
    fullk = topk.filter(F.col("dims") == 64).select(
        F.col("query_id").alias("__fq"), F.col("neighbor_id").alias("__fn")
    )
    return (
        topk.join(
            fullk,
            (F.col("query_id") == F.col("__fq"))
            & (F.col("neighbor_id") == F.col("__fn")),
            "left",
        )
        .groupBy("query_id", "dims")
        .agg(
            F.count("__fn").cast("long").alias("n_hits"),
            (F.count("__fn").cast("double") / F.lit(10.0)).alias("recall"),
        )
        .orderBy("query_id", "dims")
    )


@register(
    "label_centroid_sim_embeddings",
    """
    WITH e AS (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS j
      FROM embeddings WHERE embedding IS NOT NULL
    ), cent AS (
      SELECT label, j, avg(v) AS m FROM e GROUP BY label, j
    ), nrm AS (
      SELECT label, sum(m * m) AS sq FROM cent GROUP BY label
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             sum(a.m * b.m) AS dot
      FROM cent a JOIN cent b ON a.j = b.j AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           round(dot / sqrt(na.sq * nb.sq) + 1e-9, 6) AS cosine
    FROM dots
    JOIN nrm na ON na.label = label_a
    JOIN nrm nb ON nb.label = label_b
    ORDER BY label_a, label_b
    """,
    "Per-class centroid similarity matrix: mean vector per label, "
    "pairwise cosine across labels — the cluster-separability readout "
    "(which classes will a classifier or dedup stage confuse?) that "
    "also powers centroid-seeded IVF.  Shape: one posexplode -> "
    "(label, dim)-keyed mean (centroid table = labels x 64 rows, "
    "corpus-size-independent), dim-keyed self-equi-join for the "
    "label-pair dots (never a cartesian over vectors), label-keyed "
    "norms joined back.  Cross-engine: centroid means differ only in "
    "double summation order (~1e-15); the single cosine division lands "
    "behind +1e-9 round(6)",
)
def label_centroid_sim_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        _load_wide(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "j", "v"
            ),
        )
    )
    cent = emb.groupBy("label", "j").agg(F.avg("v").alias("m"))
    nrm = cent.groupBy("label").agg(F.sum(F.col("m") * F.col("m")).alias("sq"))
    a = cent.select(
        F.col("label").alias("label_a"), "j", F.col("m").alias("__ma")
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("j").alias("__jb"),
        F.col("m").alias("__mb"),
    )
    dots = (
        a.join(b, (F.col("j") == F.col("__jb"))
               & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("__ma") * F.col("__mb")).alias("dot"))
    )
    na = nrm.select(F.col("label").alias("__la"), F.col("sq").alias("__sa"))
    nb = nrm.select(F.col("label").alias("__lb"), F.col("sq").alias("__sb"))
    return (
        dots.join(na, F.col("label_a") == F.col("__la"))
        .join(nb, F.col("label_b") == F.col("__lb"))
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot") / F.sqrt(F.col("__sa") * F.col("__sb"))
                + F.lit(1e-9),
                6,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "novelty_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_transform(
               list_distinct(
                 CASE WHEN len(t) >= 5
                      THEN list_transform(range(1, len(t) - 3),
                                          i -> array_to_string(t[i:i+4], ' '))
                      ELSE []::VARCHAR[] END),
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS g
      FROM toks
    ), firsts AS (
      SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
    ), per_doc AS (
      SELECT sh.doc_id,
             count(*)::BIGINT AS n_shingles,
             sum(CASE WHEN firsts.first_doc < sh.doc_id
                      THEN 1 ELSE 0 END)::BIGINT AS n_repeated
      FROM sh JOIN firsts USING (g)
      GROUP BY sh.doc_id
    )
    SELECT toks.doc_id,
           coalesce(per_doc.n_shingles, 0)::BIGINT  AS n_shingles,
           coalesce(per_doc.n_repeated, 0)::BIGINT  AS n_repeated,
           CASE WHEN per_doc.n_shingles > 0
                THEN round(1.0 - CAST(per_doc.n_repeated AS DOUBLE)
                           / CAST(per_doc.n_shingles AS DOUBLE) + 1e-9, 6)
                ELSE NULL END                       AS novelty
    FROM toks LEFT JOIN per_doc USING (doc_id)
    ORDER BY toks.doc_id
    """,
    "Per-document n-gram NOVELTY (memorization-risk gauge): the fraction "
    "of a doc's distinct 5-token shingles whose FIRST corpus occurrence "
    "(min doc_id as ingest order) is its own — the per-doc readout of "
    "'how much of this document is already in the training set', the "
    "quantity dedup thresholds are tuned against (Lee et al. 2022 "
    "measure the span form; winnowing/substring_dedup here detect spans, "
    "this scores documents).  Shape: one explode of DISTINCT shingles "
    "HASHED to 60-bit ints BEFORE the shuffle (ops/dedup.shingle_hashes, "
    "the minhash convention — 8-byte keys instead of ~40-byte strings "
    "through the groupBy and the join-back; the DuckDB twin hashes with "
    "the identical md5-15-hex cast), one shingle-keyed min aggregate, "
    "one shingle-keyed join back, one doc-keyed rollup — the exact-dedup "
    "cost envelope, no pairwise anything.  Short docs (< 5 tokens) carry "
    "NULL novelty explicitly",
)
def novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import shingle_hashes
    from ..ops.quality import word_ngrams
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = base.select(
        "doc_id",
        F.explode(
            shingle_hashes(F.array_distinct(word_ngrams(F.col("t"), 5)))
        ).alias("g"),
    )
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_repeated"),
        )
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("n_repeated").cast("double")
                    / F.col("n_shingles").cast("double")
                    + F.lit(1e-9),
                    6,
                ),
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def _kappa_oracle() -> str:
    """Compose the kappa oracle from the two raters' own registered
    oracles (nested-CTE subqueries), so the rater definitions can never
    drift between this query and theirs."""
    gq = QUERIES["gopher_quality_docs"].oracle
    cq = QUERIES["quality_classifier_docs"].oracle
    return f"""
    WITH gq AS ({gq}), cq AS ({cq}),
    j AS (
      SELECT cq.keep AS a, gq.passes AS b
      FROM cq JOIN gq USING (doc_id)
    ), m AS (
      SELECT count(*)::BIGINT                                  AS n,
             sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT        AS ay,
             sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT        AS by,
             sum(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT    AS agree
      FROM j
    )
    SELECT n                                                   AS n_docs,
           ay                                                  AS classifier_yes,
           by                                                  AS gopher_yes,
           agree                                               AS n_agree,
           round((CAST(n AS DOUBLE) * CAST(agree AS DOUBLE)
                  - (CAST(ay AS DOUBLE) * CAST(by AS DOUBLE)
                     + CAST(n - ay AS DOUBLE) * CAST(n - by AS DOUBLE)))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - (CAST(ay AS DOUBLE) * CAST(by AS DOUBLE)
                       + CAST(n - ay AS DOUBLE) * CAST(n - by AS DOUBLE)))
                 + 1e-9, 6)                                    AS kappa
    FROM m
    """


@register(
    "classifier_kappa_docs",
    None,  # oracle attached below: composed from the raters' oracles
    "Cohen's kappa agreement between the two quality raters the catalog "
    "already ships — the hashing-trick classifier's keep and the Gopher "
    "rule gate's passes: chance-corrected agreement, THE gauge for 'is "
    "the cheap model filter actually measuring the same thing as the "
    "rule filter, or just the base rate?'.  Counts exact int64; the "
    "n^2-reaching expected-agreement products cast to double BEFORE "
    "multiplying (chi2 lesson); single division, round(6).  Shape: both "
    "raters are narrow projections over one scan each, doc-keyed "
    "equi-join, grand-total aggregate (1 row).  The oracle SQL is "
    "COMPOSED from the raters' own registered oracles as nested CTEs, so "
    "rater semantics cannot drift between queries",
)
def classifier_kappa_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        QUERIES["quality_classifier_docs"]
        .fn(spark, sf_dir)
        .select("doc_id", F.col("keep").alias("a"))
    )
    b = (
        QUERIES["gopher_quality_docs"]
        .fn(spark, sf_dir)
        .select("doc_id", F.col("passes").alias("b"))
    )
    m = a.join(b, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("long").alias("ay"),
        F.sum(F.when(F.col("b"), 1).otherwise(0)).cast("long").alias("by"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    nd, ayd, byd = (
        F.col("n").cast("double"),
        F.col("ay").cast("double"),
        F.col("by").cast("double"),
    )
    pe = ayd * byd + (F.col("n") - F.col("ay")).cast("double") * (
        F.col("n") - F.col("by")
    ).cast("double")
    return m.select(
        F.col("n").alias("n_docs"),
        F.col("ay").alias("classifier_yes"),
        F.col("by").alias("gopher_yes"),
        F.col("agree").alias("n_agree"),
        F.round(
            (nd * F.col("agree").cast("double") - pe) / (nd * nd - pe)
            + F.lit(1e-9),
            6,
        ).alias("kappa"),
    )


# attach the composed oracle (QUERIES entry is already registered above)
QUERIES["classifier_kappa_docs"] = CatalogQuery(
    QUERIES["classifier_kappa_docs"].fn,
    _kappa_oracle(),
    QUERIES["classifier_kappa_docs"].description,
)


@register(
    "hard_negatives_embeddings",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
      WHERE vec_id < 8
    ), s AS (
      SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
             e.label AS neighbor_label,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(q.qv, e.v)
                             / (sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN e ON e.vec_id <> q.qid AND e.label <> q.qlabel
    ), r AS (
      SELECT query_id, neighbor_id, neighbor_label, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, neighbor_label, score, rank
    FROM r WHERE rank <= 3
    """,
    "Hard-negative mining for contrastive embedding training: per query "
    "vector, the top-3 most-similar corpus vectors carrying a DIFFERENT "
    "label — the highest-loss negatives InfoNCE batches are built from "
    "(random negatives are too easy to shape the metric space).  Same "
    "literal-class broadcast-queries skeleton as ann_brute_force with "
    "the cross-label predicate riding the join; at corpus scale the "
    "bucketed ANN variants supply the candidates and this exact form is "
    "the verify stage.  Scores round(6) before ranking, neighbor_id "
    "tiebreak — both engines rank identically",
)
def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = (
        _load_wide(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("v").alias("cv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("cn"),
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("qn"),
    )
    scored = corpus.join(
        F.broadcast(queries),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neighbor_label") != F.col("qlabel")),
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.when(
            F.col("qn") * F.col("cn") > 0,
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def _source_dup_oracle() -> str:
    """Composed from minhash_pairs_docs' own registered oracle (nested
    CTE), so the near-dup pair definition cannot drift between queries."""
    pairs = QUERIES["minhash_pairs_docs"].oracle
    return f"""
    WITH pairs AS ({pairs}),
    src AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT least(a.source, b.source)    AS source_a,
             greatest(a.source, b.source) AS source_b
      FROM pairs
      JOIN src a ON a.doc_id = pairs.id_a
      JOIN src b ON b.doc_id = pairs.id_b
    ), pc AS (
      SELECT source_a, source_b, count(*)::BIGINT AS n_pairs
      FROM tagged GROUP BY source_a, source_b
    ), sizes AS (
      SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
    )
    SELECT pc.source_a, pc.source_b, pc.n_pairs,
           sa.n AS n_docs_a, sb.n AS n_docs_b,
           round(CAST(pc.n_pairs AS DOUBLE) * 1000000.0
                 / (CASE WHEN pc.source_a = pc.source_b
                         THEN CAST(sa.n AS DOUBLE) * CAST(sa.n - 1 AS DOUBLE)
                              / 2.0
                         ELSE CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)
                    END)
                 + 1e-9, 6) AS dup_ppm
    FROM pc
    JOIN sizes sa ON sa.source = pc.source_a
    JOIN sizes sb ON sb.source = pc.source_b
    ORDER BY pc.source_a, pc.source_b
    """


@register(
    "source_dup_matrix_docs",
    None,  # oracle attached below: composed from minhash_pairs_docs'
    "Cross-source duplication matrix at DOCUMENT granularity: verified "
    "MinHash near-dup pairs rolled up by unordered source pair, "
    "normalized per candidate-pair space (n_a*n_b across sources, "
    "n(n-1)/2 within) in parts-per-million — 'which crawl is re-crawling "
    "which', the doc-level complement of kmv_source_overlap_docs' "
    "vocabulary view and the governance table dedup budgets are set "
    "from.  Pure composition: the banded-LSH pair stage is "
    "minhash_pairs_docs' own (its oracle is embedded verbatim as a "
    "nested CTE so the pair definition cannot drift), then two doc-keyed "
    "source joins, a pair-keyed rollup, and broadcast size joins; "
    "n^2-reaching denominators double-cast before multiplying",
)
def source_dup_matrix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = QUERIES["minhash_pairs_docs"].fn(spark, sf_dir)
    docs = _load_wide(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    tagged = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
    )
    pc = tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    sizes = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sa = sizes.select(F.col("source").alias("__la"), F.col("n").alias("n_docs_a"))
    sb = sizes.select(F.col("source").alias("__lb"), F.col("n").alias("n_docs_b"))
    denom = F.when(
        F.col("source_a") == F.col("source_b"),
        F.col("n_docs_a").cast("double")
        * (F.col("n_docs_a") - 1).cast("double")
        / F.lit(2.0),
    ).otherwise(
        F.col("n_docs_a").cast("double") * F.col("n_docs_b").cast("double")
    )
    return (
        pc.join(F.broadcast(sa), F.col("source_a") == F.col("__la"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("__lb"))
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            "n_docs_a",
            "n_docs_b",
            F.round(
                F.col("n_pairs").cast("double") * F.lit(1000000.0) / denom
                + F.lit(1e-9),
                6,
            ).alias("dup_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


QUERIES["source_dup_matrix_docs"] = CatalogQuery(
    QUERIES["source_dup_matrix_docs"].fn,
    _source_dup_oracle(),
    QUERIES["source_dup_matrix_docs"].description,
)


@register(
    "fertility_by_lang_docs",
    f"""
    WITH t AS (
      SELECT lang,
             len({_DUCK_TOKS}) AS n_words,
             length(coalesce(text, '')) AS n_chars_txt,
             len(regexp_extract_all(coalesce(text, ''),
                 '[A-Za-z]{{1,4}}|[0-9]|[^A-Za-z0-9\\s]')) AS n_sub
      FROM documents
    )
    SELECT lang,
           count(*)::BIGINT        AS n_docs,
           sum(n_words)::BIGINT    AS n_words,
           sum(n_sub)::BIGINT      AS n_subtokens,
           round(CAST(sum(n_sub) AS DOUBLE)
                 / CAST(greatest(sum(n_words), 1) AS DOUBLE) + 1e-9, 6)
                                   AS fertility,
           round(CAST(sum(n_chars_txt) AS DOUBLE)
                 / CAST(greatest(sum(n_sub), 1) AS DOUBLE) + 1e-9, 6)
                                   AS chars_per_subtoken
    FROM t GROUP BY lang ORDER BY lang
    """,
    "Tokenizer fertility audit by language: subword tokens per "
    "whitespace word and characters per subword token, aggregated per "
    "lang over the catalog's deterministic BPE-ish subword proxy "
    "(ops/text.bpe_ish_token_count's regex) — THE fairness gauge for "
    "multilingual tokenizers (a high-fertility language pays more "
    "sequence length per sentence; vocabulary allocation is tuned "
    "against exactly this table).  Integer sums, two final divisions; "
    "one narrow projection + one lang-keyed aggregate — no joins, no "
    "explode",
)
def fertility_by_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import bpe_ish_token_count, token_count

    docs = _load_wide(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        token_count(F.col("text")).alias("n_words"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_txt"),
        bpe_ish_token_count(F.col("text")).alias("n_sub"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
            F.round(
                F.sum("n_sub").cast("double")
                / F.greatest(F.sum("n_words"), F.lit(1)).cast("double")
                + F.lit(1e-9),
                6,
            ).alias("fertility"),
            F.round(
                F.sum("n_chars_txt").cast("double")
                / F.greatest(F.sum("n_sub"), F.lit(1)).cast("double")
                + F.lit(1e-9),
                6,
            ).alias("chars_per_subtoken"),
        )
        .orderBy("lang")
    )


_PSI_CUTS = (15.0, 35.0, 70.0, 150.0)
_PSI_REFS = (25, 25, 25, 15, 10)


@register(
    "events_psi_drift_windows",
    f"""
    WITH b AS (
      SELECT date_trunc('day', ts) AS wstart,
             ((CASE WHEN coalesce(value, 0) >= 15.0  THEN 1 ELSE 0 END)
            + (CASE WHEN coalesce(value, 0) >= 35.0  THEN 1 ELSE 0 END)
            + (CASE WHEN coalesce(value, 0) >= 70.0  THEN 1 ELSE 0 END)
            + (CASE WHEN coalesce(value, 0) >= 150.0 THEN 1 ELSE 0 END))
               AS bk
      FROM events
    ), c AS (
      SELECT wstart, bk, count(*)::DOUBLE AS c FROM b GROUP BY wstart, bk
    ), n AS (
      SELECT wstart, sum(c) AS n FROM c GROUP BY wstart
    ), ks AS (
      SELECT unnest(range(0, 5)) AS bk,
             unnest([{', '.join(str(float(r)) for r in _PSI_REFS)}]) AS r
    ), g AS (
      SELECT n.wstart, ks.bk, coalesce(c.c, 0.0) AS c, n.n, ks.r
      FROM n CROSS JOIN ks
      LEFT JOIN c ON c.wstart = n.wstart AND c.bk = ks.bk
    ), s AS (
      SELECT wstart, any_value(n) AS n,
             sum(((c + 0.5) / (n + 2.5) - (r + 0.5) / ({float(sum(_PSI_REFS))} + 2.5))
                 * ln(((c + 0.5) / (n + 2.5))
                      / ((r + 0.5) / ({float(sum(_PSI_REFS))} + 2.5)))) AS raw
      FROM g GROUP BY wstart
    )
    SELECT wstart                                   AS window_start,
           wstart + INTERVAL 1 DAY                  AS window_end,
           CAST(n AS BIGINT)                        AS n,
           round(raw + 1e-9, 6)                     AS psi,
           CASE WHEN raw < 0.1 THEN 'stable'
                WHEN raw < 0.25 THEN 'moderate'
                ELSE 'shifted' END                  AS verdict
    FROM s ORDER BY window_start
    """,
    "Windowed PSI drift monitor over the live event stream "
    "(streaming/drift.psi_drift_stream run on the batch frame — the SAME "
    "code path the streaming twin executes, batch==stream pinned in "
    "tests/test_drift_stream.py): each event-time day's value "
    "distribution scored against a FROZEN reference histogram (plan-time "
    "literal cut points + counts, the training-snapshot shape).  Absent "
    "buckets fold in closed form — the PSI projection walks all k bucket "
    "indices over the collect_list'd (bucket, count) map, which is "
    "BOUNDED at k entries per window (sketch-sized, never data-sized).  "
    "Laplace p=(c+0.5)/(n+0.5k) matches drift_psi_docs' convention; "
    "shape: one codegen bucketing projection, one (window, bucket) "
    "count, one window rollup",
)
def events_psi_drift_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import psi_drift_stream

    events = load_table(spark, sf_dir, "events")
    return psi_drift_stream(
        events, "value", list(_PSI_CUTS), list(_PSI_REFS),
        ts_col="ts", window="1 day",
    ).orderBy("window_start")


def _ivf_sq8_oracle() -> str:
    """IVF oracle re-based onto the SQ8-reconstructed corpus: the
    registered ann_ivf oracle minus its own raw `e` CTE, with `e` now
    the per-dimension-quantized reconstruction (sq8_error_embeddings'
    arithmetic verbatim) — both building blocks stay single-sourced."""
    ivf = QUERIES["ann_ivf"].oracle
    head, _, tail = ivf.partition("), cents AS (")
    assert "WITH e AS (" in head and tail, "ann_ivf oracle shape changed"
    return f"""
    WITH raw AS (
      SELECT vec_id,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS j1
      FROM embeddings WHERE embedding IS NOT NULL
    ), vals AS (
      SELECT vec_id, j1 - 1 AS j, v FROM raw
    ), st AS (
      SELECT j, min(v) AS mn, max(v) AS mx FROM vals GROUP BY j
    ), q8 AS (
      SELECT vals.vec_id, vals.j, st.mn, st.mx,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE CAST(round((vals.v - st.mn) * 255.0
                                  / (st.mx - st.mn)) AS BIGINT)
             END AS code
      FROM vals JOIN st USING (j)
    ), e AS (
      SELECT vec_id,
             list(mn + code * (mx - mn) / 255.0 ORDER BY j) AS v
      FROM q8 GROUP BY vec_id
    ), cents AS ({tail}
    """


@register(
    "ann_ivf_sq8",
    None,  # oracle attached below: composed from ann_ivf's
    "IVF over an int8-quantized corpus — the production ANN memory "
    "configuration (FAISS IVF,SQ8): sq8_quantize's per-dimension 256-"
    "level reconstruction replaces the raw vectors for BOTH coarse "
    "assignment and scoring (queries included, the symmetric-distance "
    "variant), then ops/similarity.ivf_topk runs unchanged — cell-"
    "pruned candidate join, plan-time centroid literals, top-5 per "
    "query.  4x less memory per vector with retrieval quality degraded "
    "only by the quantization error sq8_error_embeddings gauges.  "
    "Oracle COMPOSED from ann_ivf's registered SQL with its corpus CTE "
    "swapped for the reconstruction (single-sourced building blocks).  "
    "Shape adds one (id)-keyed re-assembly aggregate over the exploded "
    "code frame; everything else is ann_ivf's plan",
)
def ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.similarity import ivf_topk, sq8_quantize

    emb = _load_wide(spark, sf_dir, "embeddings")
    sq = sq8_quantize(emb)
    # persist the reconstructed corpus: ivf_topk reads it THREE times
    # (the plan-time centroid collect, the corpus side, and the query
    # filter), and its lineage is the full quantize/explode/regroup pass
    # — unpersisted, that pass runs three times (guide §7.2).  In a
    # production IVF-SQ8 deployment this frame is the at-rest index; the
    # cache is the bounded local stand-in.
    recon = sq.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "recon"))),
            lambda x: x["recon"],
        ).alias("embedding")
    ).persist()
    return ivf_topk(
        recon,
        recon.filter(F.col("vec_id") < 8),
        k=5,
        n_centroids=16,
        nprobe=2,
    )


QUERIES["ann_ivf_sq8"] = CatalogQuery(
    QUERIES["ann_ivf_sq8"].fn,
    _ivf_sq8_oracle(),
    QUERIES["ann_ivf_sq8"].description,
)
