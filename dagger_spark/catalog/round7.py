"""Round-7 additions: the privacy-audit triad tail (l-diversity,
t-closeness), credit-style WOE binning on the distributed rank family,
a mergeable KMV distinct sketch with hash-proven group→ALL rollup and
pairwise set-operation estimates, DSIR importance weights, MaxSim
late-interaction retrieval over model-free feature-hash embeddings,
int8 scalar quantization, and chi-square token selection.

Same pairing conventions as the rest of the catalog (see ._base): every
entry oracle-paired, integer arithmetic wherever exactness is cheap, the
few float ops either single-division (bit-exact cross-engine) or
+1e-9-nudged round(…, 6) sums.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from .docs import _DUCK_TOKS  # noqa: F401


_shared_sql(
    "l_diversity_docs",
    """
    WITH cls AS (
      SELECT lang,
             CAST(floor(n_chars / 500.0) AS BIGINT) AS size_bucket,
             source
      FROM documents
    ), g AS (
      SELECT lang, size_bucket,
             count(*) AS n,
             count(DISTINCT source) AS l_distinct
      FROM cls GROUP BY lang, size_bucket
    )
    SELECT lang, size_bucket,
           CAST(n AS BIGINT)          AS n,
           CAST(l_distinct AS BIGINT) AS l_distinct,
           (l_distinct < 3)           AS l_violation,
           (n < 5)                    AS k_violation
    FROM g
    """,
    "l-diversity audit — the governance gate k_anonymity_docs stops short "
    "of: a quasi-identifier class (lang, 500-char size bucket) can satisfy "
    "k-anonymity yet expose its members when the SENSITIVE attribute "
    "(source) is near-constant inside it; distinct-l < 3 flags exactly "
    "that (Machanavajjhala et al.).  One grouped distinct-aggregate; the "
    "class table is cardinality-sized.  floor(n/500.0) instead of integer "
    "division keeps one SQL text (DuckDB's int '/' is float, Spark's is "
    "not)",
)


@register(
    "orders_woe_binning",
    """
    WITH o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             (o_orderstatus = 'F') AS bad
      FROM orders
    ), b AS (
      SELECT cents, bad,
             ntile(10) OVER (ORDER BY cents, o_orderkey) AS bin
      FROM o
    ), g AS (
      SELECT bin,
             count(*) AS n,
             sum(CASE WHEN bad THEN 1 ELSE 0 END) AS n_bad
      FROM b GROUP BY bin
    ), t AS (
      SELECT sum(n_bad) AS bad_t, sum(n) - sum(n_bad) AS good_t FROM g
    )
    SELECT bin,
           CAST(g.n AS BIGINT)     AS n,
           CAST(g.n_bad AS BIGINT) AS n_bad,
           round(ln(((g.n_bad + 0.5) / (t.bad_t + 5.0))
                    / ((g.n - g.n_bad + 0.5) / (t.good_t + 5.0))) + 1e-9,
                 6) AS woe,
           round((((g.n_bad + 0.5) / (t.bad_t + 5.0))
                  - ((g.n - g.n_bad + 0.5) / (t.good_t + 5.0)))
                 * ln(((g.n_bad + 0.5) / (t.bad_t + 5.0))
                      / ((g.n - g.n_bad + 0.5) / (t.good_t + 5.0)))
                 + 1e-9,
                 6) AS iv_term
    FROM g g, t t
    """,
    "Weight-of-evidence feature binning — the credit-scoring / feature-"
    "engineering staple: o_totalprice deciled into 10 bins (Spark side on "
    "ops/rank.global_ntile, the two-pass range-partitioned ntile — NO "
    "single-partition window; the oracle uses SQL ntile over the same "
    "unique (cents, orderkey) ordering, the equivalence "
    "window_rank_showcase already pins), each bin scored "
    "ln(bad%/good%) with the standard +0.5/+5 Laplace smoothing, plus its "
    "information-value term.  Integer counts; the float tail is two "
    "divisions and one ln per bin — no long float sums — nudged "
    "round(…, 6)",
)
def orders_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import global_ntile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderstatus") == "F").alias("bad"),
    )
    binned = global_ntile(
        o, ["cents", "o_orderkey"], 10, "bin", part_key="cents"
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("bad"), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
    )
    t = g.agg(
        F.sum("n_bad").alias("bad_t"),
        (F.sum("n") - F.sum("n_bad")).alias("good_t"),
    )
    bad_rate = (F.col("n_bad") + 0.5) / (F.col("bad_t") + 5.0)
    good_rate = (F.col("n") - F.col("n_bad") + 0.5) / (
        F.col("good_t") + 5.0
    )
    woe = F.log(bad_rate / good_rate)
    return g.join(F.broadcast(t)).select(
        "bin",
        "n",
        "n_bad",
        F.round(woe + 1e-9, 6).alias("woe"),
        F.round((bad_rate - good_rate) * woe + 1e-9, 6).alias("iv_term"),
    )


@register(
    "kmv_distinct_events",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM events WHERE user_id IS NOT NULL
    ), per AS (
      SELECT event_type,
             list_slice(list_sort(list(h)), 1, 64) AS mins
      FROM h GROUP BY event_type
      UNION ALL
      SELECT '__ALL__' AS event_type,
             list_slice(list_sort(list(DISTINCT h)), 1, 64) AS mins
      FROM h
    )
    SELECT event_type,
           CAST(len(mins) AS BIGINT)  AS n_kept,
           mins[len(mins)]            AS kth_min,
           CASE WHEN len(mins) < 64 THEN CAST(len(mins) AS DOUBLE)
                ELSE round((63.0 * 1152921504606846976.0) / mins[64], 3)
           END                        AS est_distinct
    FROM per
    """,
    "KMV (k-minimum-values) distinct sketch, k=64, over distinct users "
    "per event type — the MERGEABLE cardinality summary "
    "(ops/sketch.kmv_sketch): k smallest 60-bit md5 hashes per group, "
    "estimator (k-1)*2^60/h_(k), exact below k.  The '__ALL__' row is "
    "computed by MERGING the per-type sketches (kmv_merge), while the "
    "oracle computes ALL directly from the raw distinct hashes — the "
    "hash gate therefore PROVES merge losslessness (k smallest of a "
    "union of per-group k-smallest sets == k smallest of the union), "
    "the same group-to-ALL discipline as the HDR sketch family.  All "
    "integer except one final division; per-group top-k runs salted "
    "(ops/sketch docstring) so no cardinality-sized window partition "
    "exists",
)
def kmv_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sketch import kmv_estimate, kmv_merge, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    per_type = kmv_sketch(ev, "user_id", ["event_type"], k=64)
    merged_all = kmv_merge(
        per_type.withColumn("event_type", F.lit("__ALL__")),
        ["event_type"],
        k=64,
    )
    return kmv_estimate(
        per_type.unionByName(merged_all), ["event_type"], k=64
    )


@register(
    "dsir_weights_docs",
    f"""
    WITH tk AS (
      SELECT doc_id, (lang = 'en') AS it, unnest({_DUCK_TOKS}) AS tok
      FROM documents
    ), st AS (
      SELECT tok,
             sum(CASE WHEN it THEN 1 ELSE 0 END) AS ct,
             count(*) AS cs
      FROM tk GROUP BY tok
    ), tot AS (
      SELECT sum(ct) AS tt, sum(cs) AS ts, count(*) AS v FROM st
    )
    SELECT tk.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln((st.ct + 1.0) / (tot.tt + tot.v))
                     - ln((st.cs + 1.0) / (tot.ts + tot.v))) + 1e-9,
                 6) AS dsir_weight
    FROM tk JOIN st USING (tok), tot
    GROUP BY tk.doc_id
    """,
    "DSIR importance weights (Xie et al. 2023) with lang='en' as the "
    "target domain: per-document log-likelihood ratio of the target vs "
    "whole-corpus unigram LMs, add-one smoothed over the observed "
    "vocabulary — the published recipe for resampling a domain-matched "
    "training subset out of a web corpus.  One explode, one token-keyed "
    "aggregate, one vocab join back, one doc-keyed sum; totals ride a "
    "1-row broadcast.  ln-term sums are order-sensitive doubles, so both "
    "engines nudge +1e-9 before round(…, 6) (the share-rounding "
    "convention)",
)
def dsir_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import dsir_weights

    docs = _load_wide(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en")


_MAXSIM_TERMS = [("hash", "join"), ("scan",), ("merge", "sort")]
_MAXSIM_DIM, _MAXSIM_CHUNK = 16, 32


def _maxsim_query_rows() -> list:
    """(qt, j, w) rows of the query-term matrix — driver-side twin of the
    worker hashing (ops/text.signed_feature_hash_py), deterministic."""
    from ..ops.text import signed_feature_hash_py

    rows = []
    for qt, term in enumerate(_MAXSIM_TERMS):
        acc: dict = {}
        for tok in term:
            j, s = signed_feature_hash_py(tok, _MAXSIM_DIM)
            acc[j] = acc.get(j, 0) + s
        rows += [(qt, j, w) for j, w in sorted(acc.items()) if w != 0]
    return rows


def _maxsim_oracle() -> str:
    qvals = ", ".join(f"({qt}, {j}, {w})" for qt, j, w in _maxsim_query_rows())
    d, c = _MAXSIM_DIM, _MAXSIM_CHUNK
    return f"""
    WITH d AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    tk AS (
      SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
      FROM d
    ),
    hv AS (
      SELECT doc_id,
             CAST(floor((pos - 1) / {c}.0) AS BIGINT) AS chunk_id,
             (('0x' || substr(md5(tok), 1, 15))::BIGINT % {2 * d}) AS j2
      FROM tk
    ),
    vec AS (
      SELECT doc_id, chunk_id, j2 % {d} AS j,
             sum(CASE WHEN j2 < {d} THEN 1 ELSE -1 END) AS v
      FROM hv GROUP BY doc_id, chunk_id, j2 % {d}
      HAVING sum(CASE WHEN j2 < {d} THEN 1 ELSE -1 END) != 0
    ),
    qm AS (SELECT * FROM (VALUES {qvals}) AS t(qt, j, w)),
    nch AS (
      SELECT doc_id, CAST(ceil(len(t) / {c}.0) AS BIGINT) AS nch
      FROM d WHERE len(t) > 0
    ),
    dots AS (
      SELECT v.doc_id, v.chunk_id, q.qt, sum(v.v * q.w) AS dot
      FROM vec v JOIN qm q USING (j)
      GROUP BY v.doc_id, v.chunk_id, q.qt
    ),
    perq AS (
      SELECT dd.doc_id, dd.qt,
             CASE WHEN count(*) < max(n.nch)
                  THEN greatest(max(dd.dot), 0)
                  ELSE max(dd.dot) END AS mx
      FROM dots dd JOIN nch n USING (doc_id)
      GROUP BY dd.doc_id, dd.qt
    )
    SELECT doc_id, CAST(sum(mx) AS BIGINT) AS score
    FROM perq GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 10
    """


@register(
    "maxsim_retrieval_docs",
    _maxsim_oracle(),
    "ColBERT-style late-interaction retrieval with a MODEL-FREE embedding "
    "stage: every 32-token chunk becomes a 16-dim signed feature-hash "
    "vector (ops/text.feature_hash_chunk_vectors — Weinberger hashing, "
    "pure integers, stored sparse), query terms hash through the "
    "identical driver-side twin, and MaxSim scores sum each term's best "
    "chunk dot product.  The absent-chunk zero is handled EXACTLY: a "
    "chunk sharing no dimension with a term has dot 0, so when a doc has "
    "more chunks than dot rows the per-term max clamps at >= 0 (chunk "
    "counts come from the token stream, not the sparse frame, so a "
    "fully-cancelled chunk still counts).  Scale: posexplode + keyed "
    "aggregate for vectors, broadcast query matrix, top-10 via "
    "TakeOrderedAndProject — no global sort materialized.  Integer "
    "arithmetic end to end; the oracle replays hashing, sparsity, clamp "
    "and tie-broken top-k verbatim",
)
def maxsim_retrieval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import feature_hash_chunk_vectors, token_count

    docs = _load_wide(spark, sf_dir, "documents")
    vecs = feature_hash_chunk_vectors(
        docs, dim=_MAXSIM_DIM, chunk_tokens=_MAXSIM_CHUNK
    ).filter(F.col("v") != 0)
    qm = spark.createDataFrame(_maxsim_query_rows(), "qt int, j int, w long")
    nch = docs.select(
        "doc_id",
        F.ceil(token_count(F.col("text")) / F.lit(float(_MAXSIM_CHUNK)))
        .cast("long")
        .alias("nch"),
    ).filter(F.col("nch") > 0)
    dots = (
        vecs.join(F.broadcast(qm), "j")
        .groupBy("doc_id", "chunk_id", "qt")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    per_q = (
        dots.join(nch, "doc_id")
        .groupBy("doc_id", "qt")
        .agg(
            F.max("dot").alias("mx"),
            F.count(F.lit(1)).alias("nrows"),
            F.max("nch").alias("nch"),
        )
        .select(
            "doc_id",
            "qt",
            F.when(
                F.col("nrows") < F.col("nch"),
                F.greatest(F.col("mx"), F.lit(0)),
            )
            .otherwise(F.col("mx"))
            .alias("mx"),
        )
    )
    return (
        per_q.groupBy("doc_id")
        .agg(F.sum("mx").cast("long").alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


@register(
    "sq8_error_embeddings",
    """
    WITH e AS (
      SELECT vec_id,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS j1
      FROM embeddings WHERE embedding IS NOT NULL
    ), vals AS (
      SELECT vec_id, j1 - 1 AS j, v FROM e
    ), st AS (
      SELECT j, min(v) AS mn, max(v) AS mx FROM vals GROUP BY j
    ), q AS (
      SELECT vals.vec_id, vals.j, vals.v, st.mn, st.mx,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE CAST(round((vals.v - st.mn) * 255.0
                                  / (st.mx - st.mn)) AS BIGINT)
             END AS code
      FROM vals JOIN st USING (j)
    ), r AS (
      SELECT *, mn + code * (mx - mn) / 255.0 AS recon FROM q
    )
    SELECT CAST(j AS INT)                         AS j,
           CAST(count(*) AS BIGINT)               AS n,
           CAST(min(code) AS BIGINT)              AS code_min,
           CAST(max(code) AS BIGINT)              AS code_max,
           round(avg((v - recon) * (v - recon)) * 1e6 + 1e-9, 6)
                                                  AS mse_e6,
           round(max(abs(v - recon)) * 1000 + 1e-9, 6)
                                                  AS max_abs_err_e3
    FROM r GROUP BY j
    """,
    "int8 scalar quantization error gauge (ops/similarity.sq8_quantize) — "
    "the 4x-memory ANN lever: per-dimension corpus min/max define a "
    "256-level grid; this reports per-dimension code range (pinning the "
    "full 0..255 span is used) and reconstruction error (mse x 1e6, "
    "max-abs x 1e3 — scaled into the catalog's +1e-9 round(6) "
    "convention).  Codes are bit-reproducible cross-engine: every float "
    "op is elementwise with an identical expression tree, and both "
    "engines round half-away-from-zero on the non-negative grid "
    "position.  One posexplode + dim-keyed aggregate (dim rows, "
    "broadcast back) + codegen map + dim-keyed error rollup",
)
def sq8_error_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.similarity import sq8_quantize

    emb = _load_wide(spark, sf_dir, "embeddings")
    q = sq8_quantize(emb)
    err = F.col("v") - F.col("recon")
    return q.groupBy(F.col("j").cast("int").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("code").alias("code_min"),
        F.max("code").alias("code_max"),
        F.round(F.avg(err * err) * 1e6 + 1e-9, 6).alias("mse_e6"),
        F.round(F.max(F.abs(err)) * 1000 + 1e-9, 6).alias("max_abs_err_e3"),
    )


_shared_sql(
    "t_closeness_docs",
    """
    WITH cls AS (
      SELECT lang, CAST(floor(n_chars / 500.0) AS BIGINT) AS size_bucket,
             source
      FROM documents
    ), cg AS (
      SELECT lang, size_bucket, source, count(*) AS n
      FROM cls GROUP BY lang, size_bucket, source
    ), ct AS (
      SELECT lang, size_bucket, sum(n) AS class_n
      FROM cg GROUP BY lang, size_bucket
    ), gt AS (
      SELECT source, count(*) AS gn FROM cls GROUP BY source
    ), tot AS (SELECT count(*) AS t FROM cls)
    , j AS (
      SELECT cg.lang, cg.size_bucket,
             sum(abs(cg.n / CAST(ct.class_n AS DOUBLE)
                     - gt.gn / CAST(tot.t AS DOUBLE))) AS sum_abs,
             sum(gt.gn / CAST(tot.t AS DOUBLE))        AS sum_pg,
             max(ct.class_n)                           AS class_n
      FROM cg
      JOIN gt ON cg.source IS NOT DISTINCT FROM gt.source
      JOIN ct ON cg.lang IS NOT DISTINCT FROM ct.lang
             AND cg.size_bucket IS NOT DISTINCT FROM ct.size_bucket
      CROSS JOIN tot
      GROUP BY cg.lang, cg.size_bucket
    )
    SELECT lang, size_bucket,
           CAST(class_n AS BIGINT) AS n,
           round((sum_abs + (1 - sum_pg)) / 2 + 1e-9, 6) AS t_distance,
           (round((sum_abs + (1 - sum_pg)) / 2 + 1e-9, 6) > 0.3)
             AS t_violation
    FROM j
    """,
    "t-closeness — the third rung of the privacy-audit ladder "
    "(k_anonymity_docs, l_diversity_docs, here): a class can be large AND "
    "diverse yet still leak when its sensitive-attribute DISTRIBUTION "
    "deviates from the corpus-wide one; for categorical attributes the "
    "earth-mover distance reduces to total variation = L1/2 over the FULL "
    "source domain.  Sources ABSENT from a class contribute their global "
    "mass p_g exactly — folded in CLOSED FORM as (1 - sum of present "
    "p_g), so the plan is two EQUI-joins (class counts x global domain "
    "on source, x class totals on the QI key) instead of a class x "
    "domain cross join: the first draft's CROSS JOIN planned a "
    "BroadcastNestedLoopJoin with a data-derived build side and the "
    "catalog-wide BNLJ checker rejected it — this is the checker doing "
    "its job.  Null-safe joins keep NULL-valued quasi-identifiers as "
    "their own classes, matching GROUP BY; the 1-row grand total is the "
    "only broadcast.  t > 0.3 flags, evaluated on the rounded value so "
    "both engines flag identically",
)


@register(
    "kmv_source_overlap_docs",
    f"""
    WITH tk AS (
      SELECT DISTINCT source,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
      FROM (SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents)
    ), sk AS (
      SELECT source, list_slice(list_sort(list(h)), 1, 128) AS mins
      FROM tk GROUP BY source
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.mins AS ma, b.mins AS mb,
             list_slice(list_sort(list_distinct(
               list_concat(a.mins, b.mins))), 1, 128) AS mu
      FROM sk a JOIN sk b ON a.source < b.source
    ), m AS (
      SELECT source_a, source_b,
             CAST(len(mu) AS BIGINT) AS n_union_kept,
             CAST(len(list_filter(mu,
                    h -> list_contains(ma, h) AND list_contains(mb, h)))
                  AS BIGINT) AS x_common,
             mu[len(mu)] AS max_u
      FROM pairs
    )
    SELECT source_a, source_b, n_union_kept, x_common,
           round(x_common / CAST(n_union_kept AS DOUBLE) + 1e-9, 6)
             AS jaccard_est,
           CASE WHEN n_union_kept < 128 THEN CAST(n_union_kept AS DOUBLE)
                ELSE round((127.0 * 1152921504606846976.0) / max_u, 3)
           END AS union_est,
           CASE WHEN n_union_kept < 128 THEN CAST(x_common AS DOUBLE)
                ELSE round(x_common / 128.0 *
                       round((127.0 * 1152921504606846976.0) / max_u, 3), 3)
           END AS inter_est
    FROM m
    """,
    "Pairwise cross-source vocabulary overlap from KMV sketches ALONE "
    "(ops/sketch.kmv_pairwise_overlap, Beyer et al. 2007) — the corpus-"
    "governance matrix ('how much does crawl B duplicate crawl A's "
    "vocabulary?') computed WITHOUT touching the raw data again: the k "
    "smallest of two sketches' union is the union's own KMV sketch "
    "(merge closure), membership of those minima in both inputs gives "
    "jaccard ~ x/k, and |A∩B| follows from the union estimator — the "
    "set-operation capability HLL fundamentally lacks.  Every estimate "
    "is EXACT below k (this corpus's per-source vocabularies exceed "
    "k=128, so the estimator arm is the one exercised and hash-gated).  "
    "Sketches collapse to one k-element array row per source; the pair "
    "space is sources squared; all set arithmetic is codegen'd array "
    "functions",
)
def kmv_source_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sketch import kmv_pairwise_overlap, kmv_sketch
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    sk = kmv_sketch(toks, "tok", ["source"], k=128)
    return kmv_pairwise_overlap(sk, "source", k=128)


@register(
    "chi2_tokens_docs",
    f"""
    WITH d AS (
      SELECT doc_id, (lang = 'en') AS en,
             list_distinct({_DUCK_TOKS}) AS t
      FROM documents
    ), pres AS (
      SELECT doc_id, en, unnest(t) AS tok FROM d
    ), tot AS (
      SELECT sum(CASE WHEN en THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN en THEN 0 ELSE 1 END) AS n_non
      FROM d
    ), st AS (
      SELECT tok,
             sum(CASE WHEN en THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN en THEN 0 ELSE 1 END) AS b
      FROM pres GROUP BY tok
    ), y AS (
      SELECT tok, a, b,
             CAST(a * (n_non - b) - b * (n_en - a) AS DOUBLE) AS diff,
             CAST(a + b AS DOUBLE)
               * CAST((n_en - a) + (n_non - b) AS DOUBLE)
               * CAST(a + (n_en - a) AS DOUBLE)
               * CAST(b + (n_non - b) AS DOUBLE)              AS denom,
             n_en + n_non                                     AS nt
      FROM st, tot
    )
    SELECT tok,
           CAST(a AS BIGINT) AS n_target,
           CAST(b AS BIGINT) AS n_rest,
           round(CAST(nt AS DOUBLE) * diff * diff / denom, 6) AS chi2
    FROM y WHERE denom > 0
    ORDER BY chi2 DESC, tok LIMIT 30
    """,
    "Chi-square token selection for the quality-classifier feature stage "
    "— the classic 2x2 contingency test per token (document-level "
    "presence vs the lang='en' label), chi2 = N(ad-bc)^2 / "
    "((a+b)(c+d)(a+c)(b+d)).  Counts and the (ad-bc) determinant stay "
    "exact int64 (each a*d product is <= N^2/4, safe to ~6e9 docs); the "
    "determinant and the four denominator FACTORS are then cast to "
    "double BEFORE any further product — the 4-factor denominator and "
    "diff^2 reach N^4/16, which would silently wrap int64 past ~175k "
    "docs in Spark's non-ANSI mode while DuckDB raises.  Identical "
    "cast placement in both engines keeps the IEEE expression trees "
    "bit-equal, so the top-30 ordering (chi2 desc, token) stays "
    "deterministic.  One explode of DISTINCT tokens per doc, one "
    "token-keyed aggregate, a 1-row broadcast total, top-30 via "
    "TakeOrderedAndProject",
)
def chi2_tokens_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    pres = docs.select(
        (F.col("lang") == "en").alias("en"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    )
    tot = docs.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("n_non"),
    )
    st = pres.groupBy("tok").agg(
        F.sum(F.when(F.col("en"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("en"), 0).otherwise(1)).alias("b"),
    )
    y = st.join(F.broadcast(tot))
    c = F.col("n_en") - F.col("a")
    d = F.col("n_non") - F.col("b")
    # (ad - bc) is exact int64 (each product <= N^2/4); everything past it
    # is double — the 4-factor denominator and diff^2 reach N^4/16, which
    # wraps int64 silently past ~175k docs under Spark's non-ANSI mode.
    diff = (F.col("a") * d - F.col("b") * c).cast("double")
    denom = (
        (F.col("a") + F.col("b")).cast("double")
        * (c + d).cast("double")
        * (F.col("a") + c).cast("double")
        * (F.col("b") + d).cast("double")
    )
    nt = F.col("n_en") + F.col("n_non")
    return (
        y.select(
            "tok",
            F.col("a").cast("long").alias("n_target"),
            F.col("b").cast("long").alias("n_rest"),
            F.round(nt.cast("double") * diff * diff / denom, 6).alias("chi2"),
            denom.alias("__denom"),
        )
        .filter(F.col("__denom") > 0)
        .drop("__denom")
        .orderBy(F.col("chi2").desc(), "tok")
        .limit(30)
    )
