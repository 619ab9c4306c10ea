"""training-data hygiene: Gopher gates, repetition, PII, chunking, decontamination.

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403
from .docs import (  # noqa: F401
    _DUCK_MINHASH_CTE, _DUCK_TOKS, _dedup_stage, _duck_lsh_cte,
)
from .events import events_rules_engine  # noqa: F401

# ===========================================================================
# Training-data hygiene (ops/quality.py): Gopher gates, repetition, PII,
# chunking, benchmark decontamination
# ===========================================================================

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

@register(
    "gopher_quality_docs",
    f"""
    WITH base AS (
      SELECT doc_id, coalesce(text, '') AS txt, {_DUCK_TOKS} AS t,
             list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                        x -> trim(x)), x -> x <> '') AS ls
      FROM documents
    ), raw AS (
      SELECT doc_id,
             len(t) AS n_words,
             coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS sum_len,
             len(regexp_extract_all(txt, '#'))
               + len(regexp_extract_all(txt, '\\.\\.\\.'))
               + len(regexp_extract_all(txt, '…')) AS n_symbols,
             len(ls) AS n_lines,
             len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*')
                                      OR starts_with(x, '•'))) AS n_bullet,
             len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS n_ellipsis,
             len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
             len(list_filter(t, x -> lower(x) IN ({_GOPHER_STOP_SQL}))) AS n_stop_hits
      FROM base
    ), ratios AS (
      SELECT doc_id, n_words, n_lines, n_stop_hits,
             CASE WHEN n_words > 0 THEN sum_len::DOUBLE / n_words ELSE 0 END AS mean_len,
             CASE WHEN n_words > 0 THEN n_symbols::DOUBLE / n_words ELSE 0 END AS symbol_r,
             CASE WHEN n_lines > 0 THEN n_bullet::DOUBLE / n_lines ELSE 0 END AS bullet_r,
             CASE WHEN n_lines > 0 THEN n_ellipsis::DOUBLE / n_lines ELSE 0 END AS ellipsis_r,
             CASE WHEN n_words > 0 THEN n_alpha_words::DOUBLE / n_words ELSE 0 END AS alpha_r
      FROM raw
    )
    SELECT doc_id, n_words, n_lines, n_stop_hits,
           round(mean_len + 1e-9, 6) AS mean_word_len,
           round(symbol_r + 1e-9, 6) AS symbol_word_ratio,
           round(bullet_r + 1e-9, 6) AS bullet_line_ratio,
           round(ellipsis_r + 1e-9, 6) AS ellipsis_line_ratio,
           round(alpha_r + 1e-9, 6) AS alpha_word_ratio,
           (n_words BETWEEN 50 AND 100000
            AND mean_len BETWEEN 3.0 AND 10.0
            AND symbol_r <= 0.1 AND bullet_r <= 0.9 AND ellipsis_r <= 0.3
            AND alpha_r >= 0.8 AND n_stop_hits >= 2) AS passes
    FROM ratios
    """,
    "Gopher appendix-A quality gates (Rae et al. 2021): word/line stats, "
    "symbol/bullet/ellipsis ratios, stopword presence, composite pass flag",
)
def gopher_quality_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    s = gopher_stats(F.col("text"))
    # flags evaluate the UNROUNDED ratios (same expression both engines);
    # rounded copies are for the hash compare only (+1e-9 parks dyadic
    # boundary values off the .xxxxxx5 tie, same convention as text_stats)
    return docs.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["n_lines"].alias("n_lines"),
        s["n_stop_hits"].alias("n_stop_hits"),
        F.round(s["mean_word_len"] + F.lit(1e-9), 6).alias("mean_word_len"),
        F.round(s["symbol_word_ratio"] + F.lit(1e-9), 6).alias("symbol_word_ratio"),
        F.round(s["bullet_line_ratio"] + F.lit(1e-9), 6).alias("bullet_line_ratio"),
        F.round(s["ellipsis_line_ratio"] + F.lit(1e-9), 6).alias("ellipsis_line_ratio"),
        F.round(s["alpha_word_ratio"] + F.lit(1e-9), 6).alias("alpha_word_ratio"),
        gopher_pass(s).alias("passes"),
    )


@register(
    "repetition_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id, len(t) AS n_words,
             CASE WHEN len(t) >= 2
                  THEN [array_to_string(list_slice(t, i, i + 1), ' ')
                        FOR i IN range(1, len(t))]
                  ELSE []::VARCHAR[] END AS g2,
             CASE WHEN len(t) >= 3
                  THEN [array_to_string(list_slice(t, i, i + 2), ' ')
                        FOR i IN range(1, len(t) - 1)]
                  ELSE []::VARCHAR[] END AS g3
      FROM toks
    )
    SELECT doc_id, n_words,
           round(CASE WHEN len(g2) > 0
                      THEN (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
                      ELSE 0 END + 1e-9, 6) AS dup_frac_2gram,
           round(CASE WHEN len(g3) > 0
                      THEN (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3)
                      ELSE 0 END + 1e-9, 6) AS dup_frac_3gram
    FROM grams
    """,
    "C4/Gopher intra-doc repetition: fraction of duplicate 2-/3-gram "
    "occurrences; linear in doc length (no pairwise work)",
)
def repetition_docs(spark, sf_dir):
    from ..ops.quality import repetition_stats_from_tokens

    docs = _load_wide(spark, sf_dir, "documents")
    # tokenize ONCE into a real column: word_ngrams slices its input inside
    # a transform lambda, and outer non-attribute expressions are
    # re-evaluated per element — inline tokens(text) here costs O(n_tokens)
    # regex splits per row (25 s -> ~2 s at sf0.1)
    staged = docs.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    )
    r = repetition_stats_from_tokens(F.col("__toks"))
    return staged.select(
        "doc_id",
        F.size(F.col("__toks")).cast("long").alias("n_words"),
        F.round(r["dup_frac_2gram"] + F.lit(1e-9), 6).alias("dup_frac_2gram"),
        F.round(r["dup_frac_3gram"] + F.lit(1e-9), 6).alias("dup_frac_3gram"),
    )


def _pii_aug_spark():
    """Deterministic PII augmentation: the synthetic corpus carries no PII,
    so the catalog query plants doc_id-derived emails/IPs/phones on a subset
    — the cross-engine hash then pins Java-regex vs RE2 parity on real
    matches, not on a table of zeros.  The SQL twin mirrors this exactly."""
    d = F.col("doc_id")
    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when((d % 3) == 0,
               F.concat(F.lit(" reach user"), d.cast("string"),
                        F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when((d % 5) == 0,
               F.concat(F.lit(" from host 10."), (d % 200).cast("string"),
                        F.lit(".0.7 logged"))).otherwise(F.lit("")),
        F.when((d % 7) == 0,
               F.concat(F.lit(" call +1415555"),
                        ((d % 9000) + 1000).cast("string"))).otherwise(F.lit("")),
    )


_PII_AUG_SQL = (
    "coalesce(text, '')"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' from host 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.7 logged' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call +1415555' || CAST(doc_id % 9000 + 1000 AS VARCHAR)"
    " ELSE '' END"
)

_PII_PAT = dict(PII_PATTERNS)

@register(
    "pii_scan_docs",
    f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS txt FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(txt, '{_PII_PAT["email"]}')) AS n_email,
           len(regexp_extract_all(txt, '{_PII_PAT["ipv4"]}')) AS n_ipv4,
           len(regexp_extract_all(txt, '{_PII_PAT["phone"]}')) AS n_phone,
           (len(regexp_extract_all(txt, '{_PII_PAT["email"]}'))
            + len(regexp_extract_all(txt, '{_PII_PAT["ipv4"]}'))
            + len(regexp_extract_all(txt, '{_PII_PAT["phone"]}'))) > 0 AS has_pii,
           md5(regexp_replace(regexp_replace(regexp_replace(txt,
               '{_PII_PAT["email"]}', '<EMAIL>', 'g'),
               '{_PII_PAT["ipv4"]}', '<IPV4>', 'g'),
               '{_PII_PAT["phone"]}', '<PHONE>', 'g')) AS redacted_hash
    FROM aug
    """,
    "PII scan + redaction over doc_id-salted text: per-kind match counts "
    "and the md5 of the globally-redacted text (regex parity across engines)",
)
def pii_scan_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    aug = _pii_aug_spark()
    c = pii_counts(aug)
    return docs.select(
        "doc_id",
        c["email"].alias("n_email"),
        c["ipv4"].alias("n_ipv4"),
        c["phone"].alias("n_phone"),
        ((c["email"] + c["ipv4"] + c["phone"]) > 0).alias("has_pii"),
        F.md5(redact_pii(aug)).alias("redacted_hash"),
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 16, 12

@register(
    "chunk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_CHUNK_STRIDE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, ((s - 1) // {_CHUNK_STRIDE}) + 1 AS chunk_idx,
             s AS chunk_start, list_slice(t, s, s + {_CHUNK_SIZE} - 1) AS c
      FROM starts
    )
    SELECT doc_id, chunk_idx, chunk_start,
           len(c) AS n_chunk_tokens,
           md5(array_to_string(c, ' ')) AS chunk_hash
    FROM chunks
    WHERE len(c) > 0
    """,
    f"RAG-style token-window chunking: size {_CHUNK_SIZE}, stride "
    f"{_CHUNK_STRIDE} (overlapping); explode-only, no shuffle",
)
def chunk_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_CHUNK_STRIDE))
    ex = df.select("doc_id", "t", F.posexplode(starts).alias("pos", "s"))
    chunk = F.slice(F.col("t"), F.col("s"), _CHUNK_SIZE)
    return (
        ex.select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("chunk_idx"),
            F.col("s").cast("long").alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .filter(F.col("n_chunk_tokens") > 0)
    )


_DECON_K, _DECON_MOD = 5, 17

@register(
    "decontam_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= {_DECON_K}
                  THEN list_distinct([md5(array_to_string(
                           list_slice(t, i, i + {_DECON_K} - 1), ' '))
                       FOR i IN range(1, len(t) - {_DECON_K} + 2)])
                  ELSE []::VARCHAR[] END AS gs
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ), bench AS (
      SELECT DISTINCT g FROM ex WHERE doc_id % {_DECON_MOD} = 0
    ), train AS (
      SELECT doc_id, g FROM ex WHERE doc_id % {_DECON_MOD} <> 0
    ), hits AS (
      SELECT train.doc_id, count(*) AS n_overlap
      FROM train JOIN bench USING (g) GROUP BY train.doc_id
    ), sizes AS (
      SELECT doc_id, len(gs) AS n_grams FROM grams
    )
    SELECT hits.doc_id, n_overlap, n_grams,
           round(n_overlap::DOUBLE / n_grams + 1e-9, 6) AS contamination
    FROM hits JOIN sizes ON hits.doc_id = sizes.doc_id
    """,
    f"benchmark decontamination: {_DECON_K}-gram shingle overlap of the "
    f"corpus against a broadcast eval set (doc_id % {_DECON_MOD} = 0); "
    "the contaminated docs and their overlap counts",
)
def decontam_docs(spark, sf_dir):
    """Eval-set n-gram decontamination (the GPT-3/Gopher procedure): shingle
    both sides, hash, and report corpus docs sharing any shingle with the
    benchmark.  Scale shape: the benchmark shingle set is tiny relative to
    the corpus, so it is BROADCAST — the corpus side never shuffles; the
    only shuffle is the per-doc overlap count (one hash aggregate)."""
    docs = _load_wide(spark, sf_dir, "documents")
    # staged token column: see repetition_docs — word_ngrams over an inline
    # tokens(text) re-runs the split per n-gram inside the transform lambda
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    grams = F.array_distinct(
        F.transform(word_ngrams(F.col("__toks"), _DECON_K), lambda g: F.md5(g)))
    ex = staged.select("doc_id", F.explode(grams).alias("g"))
    bench = ex.filter((F.col("doc_id") % _DECON_MOD) == 0).select("g").distinct()
    train = ex.filter((F.col("doc_id") % _DECON_MOD) != 0)
    # both sides are per-doc-distinct, so plain count == distinct count
    hits = (train.join(F.broadcast(bench), "g")
                 .groupBy("doc_id").agg(F.count("g").alias("n_overlap")))
    sizes = staged.select("doc_id", F.size(grams).alias("n_grams"))
    return hits.join(sizes, "doc_id").select(
        "doc_id", "n_overlap",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round(F.col("n_overlap") / F.col("n_grams") + F.lit(1e-9), 6)
         .alias("contamination"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: the engine's identity query — multi-rule detection
    fan-in over the events table."""
    return events_rules_engine(spark, sf_dir)


_CDD_SIZE = 20  # chunk-dedup: non-overlapping 20-token chunks


@register(
    "chunk_dedup_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_CDD_SIZE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, s,
             md5(array_to_string(list_slice(t, s, s + {_CDD_SIZE} - 1), ' ')) AS h,
             len(list_slice(t, s, s + {_CDD_SIZE} - 1)) AS n
      FROM starts WHERE len(list_slice(t, s, s + {_CDD_SIZE} - 1)) > 0
    ), ranked AS (
      SELECT doc_id, s, n,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS occ
      FROM chunks
    )
    SELECT doc_id,
           cast(count(*) AS bigint)                          AS n_chunks,
           cast(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS bigint)
                                                             AS n_kept,
           cast(sum(CASE WHEN occ = 1 THEN n ELSE 0 END) AS bigint)
                                                             AS kept_tokens,
           round(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6)                              AS kept_frac
    FROM ranked GROUP BY doc_id
    """,
    "CCNet/Lee-et-al-style chunk-level exact dedup (this corpus has no "
    "newlines, so 'paragraph' = non-overlapping 20-token chunk): hash "
    "every chunk, keep only each hash's GLOBAL first occurrence "
    "(deterministic (doc_id, start) order), report per-doc survival.  "
    "Scale shape: explode + one hash-keyed window + one per-doc rollup — "
    "the dedup decision never materializes text, only 16-byte hashes",
)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_CDD_SIZE))
    chunk = F.slice(F.col("t"), F.col("s"), _CDD_SIZE)
    ex = (
        df.select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id", "s",
            F.md5(F.array_join(chunk, " ")).alias("h"),
            F.size(chunk).alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    occ = F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "s"))
    ranked = ex.withColumn("occ", occ)
    kept = F.when(F.col("occ") == 1, 1).otherwise(0)
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("occ") == 1, F.col("n")).otherwise(0))
         .cast("long").alias("kept_tokens"),
        F.round(F.sum(kept).cast("double") / F.count(F.lit(1)), 6)
         .alias("kept_frac"),
    )


_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-doc BM25 score (k1/b constants above) for the fixed
    ``_BM25_TERMS`` query — the shared scoring stage of bm25_topk_docs
    (top-20 cut) and hybrid_rrf_docs (corpus-wide rank): tf via a filter
    lambda over the token array, df/avgdl as 1-row broadcast aggregates;
    only matching (doc, term, tf) triples reach the scoring aggregate."""
    lens = (
        docs.select("doc_id", tokens(F.col("text")).alias("t"))
        .withColumn("dl", F.size("t"))
        .filter(F.col("dl") > 0)
    )
    stats = lens.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n")
    )
    q = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    tf = lens.crossJoin(F.broadcast(q)).select(
        "doc_id", "dl", "term",
        F.size(F.filter("t", lambda x: x == F.col("term"))).alias("f"),
    )
    dfreq = tf.groupBy("term").agg(
        F.sum(F.when(F.col("f") > 0, 1).otherwise(0)).alias("nd")
    )
    idf = F.log(
        (F.col("n") - F.col("nd") + 0.5) / (F.col("nd") + 0.5) + 1.0
    )
    contrib = idf * (F.col("f") * (_BM25_K1 + 1.0)) / (
        F.col("f")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.filter(F.col("f") > 0)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )


@register(
    "bm25_topk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n FROM lens
    ), q AS (SELECT unnest(['spark', 'hash', 'window']) AS term),
    tf AS (
      SELECT l.doc_id, l.dl, q.term,
             len(list_filter(l.t, x -> x = q.term)) AS f
      FROM lens l CROSS JOIN q
    ), df AS (
      SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS nd
      FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             sum(
               ln((s.n - df.nd + 0.5) / (df.nd + 0.5) + 1.0)
               * (tf.f * ({_BM25_K1} + 1.0))
               / (tf.f + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * tf.dl / s.avgdl))
             ) AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats s
      WHERE tf.f > 0
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    "BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed term set: tf via "
    "a filter lambda over the token array, df/avgdl as 1-row broadcast "
    "aggregates — the corpus is scanned once and never shuffled on "
    "content; only (doc, term, tf) triples for MATCHING docs reach the "
    "scoring aggregation.  Deterministic top-20 with doc_id tiebreak",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    return (
        _bm25_scores(spark, docs)
        .withColumnRenamed("score", "bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@register(
    "dedup_canonical_docs",
    _DUCK_MINHASH_CTE.replace("WITH toks", "WITH RECURSIVE toks") + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), clusters AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster,
             length(coalesce(d.text, '')) AS nlen
      FROM documents d
      LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
        ON d.doc_id = m.a
    ), ranked AS (
      SELECT doc_id, cluster, nlen,
             row_number() OVER (
               PARTITION BY cluster ORDER BY nlen DESC, doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY cluster) AS csize
      FROM clusters
    )
    SELECT cast(doc_id AS bigint) AS doc_id,
           cast(cluster AS bigint) AS cluster,
           cast(csize AS bigint) AS cluster_size,
           (rk = 1) AS keep
    FROM ranked
    """,
    "dedup END-TO-END: near-dup clusters (LSH graph -> connected "
    "components) -> one CANONICAL survivor per cluster (longest text, "
    "doc_id tiebreak — the keep-best policy of production dedup, vs "
    "keep-arbitrary) -> per-doc keep/drop verdict with cluster size.  "
    "The canonical choice is one window over the cluster assignment; "
    "oracle replays the whole chain via recursive-CTE closure",
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..ops.dedup import dedup_clusters

    docs = _load_wide(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    # both sides are corpus-sized (one row per doc) so broadcast is wrong at
    # scale; shuffle-hash keeps the doc_id-keyed join sort-free
    sized = clusters.join(
        docs.select(
            "doc_id", F.length(F.coalesce(F.col("text"), F.lit(""))).alias("nlen")
        ).hint("shuffle_hash"),
        "doc_id",
    )
    w = Window.partitionBy("cluster").orderBy(F.col("nlen").desc(), "doc_id")
    return sized.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.count(F.lit(1)).over(Window.partitionBy("cluster"))
         .cast("long").alias("cluster_size"),
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "weighted_sample_docs",
    """
    WITH w AS (
      SELECT doc_id, source, n_chars,
             ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
               % 1000000) + 1) / 1000000.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, cast(n_chars AS bigint) AS n_chars,
           round(pow(u, 1.0 / n_chars), 6) AS es_key
    FROM w
    -- rank by the ROUNDED key: JVM Math.pow and libm pow may differ by
    -- 1 ulp, and an unrounded ORDER BY would let that flip the rank-50
    -- cutoff between engines (same discipline as pq_topk's in-plan norms)
    ORDER BY round(pow(u, 1.0 / n_chars), 6) DESC, doc_id
    LIMIT 50
    """,
    "weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "key = u^(1/w) with w = char count and u a DETERMINISTIC md5-derived "
    "uniform, top-k by key — the distributed one-pass weighted reservoir "
    "(any executor can compute keys locally; only the top-k heap "
    "merges).  Deterministic u makes the sample reproducible across "
    "engines/runs/partitionings, same policy as docs_hash_sample",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 1000000
            + 1
        )
        / 1000000.0
    )
    key = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    return (
        docs.select(
            "doc_id", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(50)
    )


@register(
    "heavy_hitters_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), exact AS (
      SELECT tok, count(*) AS freq FROM toks GROUP BY tok
      ORDER BY freq DESC, tok LIMIT 20
    ), sample_counts AS (
      SELECT tok, count(*) AS sfreq FROM toks
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
      GROUP BY tok
    ), cand AS (
      SELECT tok FROM sample_counts ORDER BY sfreq DESC, tok LIMIT 40
    )
    SELECT e.tok, cast(e.freq AS bigint) AS freq,
           (c.tok IS NOT NULL) AS found_by_sample
    FROM exact e LEFT JOIN cand c ON e.tok = c.tok
    ORDER BY e.freq DESC, e.tok
    """,
    "heavy hitters with the two-pass scale pattern instrumented: pass 1 "
    "counts a 20% hash-sample and keeps 2k candidates (at 100 TB this is "
    "the only full-vocabulary aggregation, over 1/5 the data); pass 2 is "
    "the exact top-20 with a flag showing the sample pass found it — on "
    "any heavy-tailed corpus the flag is all-true, making the "
    "sample-then-verify shortcut's safety measurable, not assumed",
)
def heavy_hitters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    exact = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok").limit(20)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    cand = (
        toks.filter(bucket < 20)
        .groupBy("tok").agg(F.count(F.lit(1)).alias("sfreq"))
        .orderBy(F.col("sfreq").desc(), "tok").limit(40)
        .select("tok", F.lit(True).alias("__hit"))
    )
    return (
        exact.join(F.broadcast(cand), "tok", "left")
        .select(
            "tok", F.col("freq").cast("long").alias("freq"),
            F.coalesce(F.col("__hit"), F.lit(False)).alias("found_by_sample"),
        )
        .orderBy(F.col("freq").desc(), "tok")
    )


@register(
    "token_entropy_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
    ), withn AS (
      SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM tf
    )
    SELECT doc_id,
           cast(min(n) AS bigint) AS n_tokens,
           cast(count(*) AS bigint) AS n_types,
           round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)) + 0.0, 6)
             AS entropy,
           round(count(*)::DOUBLE / min(n), 6) AS ttr
    FROM withn GROUP BY doc_id
    """,
    "per-document token-distribution entropy (-sum p ln p) + type-token "
    "ratio: the information-density quality signal (low entropy = "
    "repetitive/templated text, the same family as the Gopher repetition "
    "gates but distribution-level).  One (doc, token) aggregate, then a "
    "doc-keyed window + rollup — the window rides the same hash "
    "partitioning as the aggregate, so one real shuffle",
)
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    withn = tf.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    p = F.col("c").cast("double") / F.col("n")
    return withn.groupBy("doc_id").agg(
        F.min("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        # + 0.0 canonicalizes IEEE negative zero: a single-type doc is
        # -(1*ln 1) = -0.0 under one engine's fold and +0.0 under the
        # other's; -0.0 + 0.0 = +0.0 in both (fuzz-corpus catch)
        F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("entropy"),
        F.round(F.count(F.lit(1)).cast("double") / F.min("n"), 6).alias("ttr"),
    )


_PACK_L, _PACK_SHARDS = 2048, 8  # block length in CHARS (no token column)


@register(
    "pack_sequences_docs",
    f"""
    WITH d AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard, n_chars
      FROM documents WHERE n_chars > 0
    ), cum AS (
      SELECT doc_id, shard, n_chars,
             sum(n_chars) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum_end
      FROM d
    ), placed AS (
      SELECT shard, doc_id, n_chars,
             (cum_end - n_chars) // {_PACK_L} AS seq_first,
             (cum_end - 1) // {_PACK_L} AS seq_last
      FROM cum
    )
    SELECT shard, cast(seq_first AS bigint) AS seq_id,
           cast(count(*) AS bigint) AS n_docs_starting,
           cast(sum(n_chars) AS bigint) AS chars_started,
           cast(sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END)
                AS bigint) AS n_docs_spilling
    FROM placed
    GROUP BY shard, seq_first
    ORDER BY shard, seq_id
    """,
    f"training-sequence packing (concat-and-chop, GPT style): docs "
    f"concatenate in doc_id order and chop into {_PACK_L}-char blocks "
    f"(chars stand in for tokens; the table has no token count); "
    f"each doc's start/end block comes from a running-sum window.  "
    f"Packing is PER-SHARD (doc_id % {_PACK_SHARDS}) because a single "
    f"global running sum is inherently sequential — shards pack "
    f"independently and in parallel at any scale, the standard "
    f"data-parallel packing layout.  Output: per block, docs starting "
    f"in it, their token mass, and how many spill into the next block",
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    d = docs.select(
        "doc_id", (F.col("doc_id") % _PACK_SHARDS).alias("shard"), "n_chars"
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = d.withColumn("cum_end", F.sum("n_chars").over(w)).select(
        "shard", "doc_id", "n_chars",
        F.floor((F.col("cum_end") - F.col("n_chars")) / _PACK_L).alias("seq_first"),
        F.floor((F.col("cum_end") - 1) / _PACK_L).alias("seq_last"),
    )
    return (
        placed.groupBy("shard", "seq_first")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_starting"),
            F.sum("n_chars").cast("long").alias("chars_started"),
            F.sum(
                F.when(F.col("seq_last") > F.col("seq_first"), 1).otherwise(0)
            ).cast("long").alias("n_docs_spilling"),
        )
        .select(
            "shard", F.col("seq_first").cast("long").alias("seq_id"),
            "n_docs_starting", "chars_started", "n_docs_spilling",
        )
        .orderBy("shard", "seq_id")
    )


@register(
    "incremental_dedup_docs",
    _duck_lsh_cte(3, 8, 2) + """
    , nb AS (SELECT * FROM buckets WHERE doc_id % 10 = 0),
    ob AS (SELECT * FROM buckets WHERE doc_id % 10 <> 0),
    cand AS (
      SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
      FROM nb JOIN ob ON nb.b = ob.b AND nb.bucket = ob.bucket
    ), ver AS (
      SELECT c.new_id, c.old_id,
             round(len(list_intersect(a.hs, b.hs))::DOUBLE
                   / (len(a.hs) + len(b.hs)
                      - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
      FROM cand c
      JOIN hsh a ON c.new_id = a.doc_id
      JOIN hsh b ON c.old_id = b.doc_id
    ), best AS (
      SELECT new_id, old_id, jaccard,
             row_number() OVER (
               PARTITION BY new_id ORDER BY jaccard DESC, old_id
             ) AS rk
      FROM ver WHERE jaccard >= 0.2
    )
    SELECT d.doc_id AS id,
           (b.new_id IS NOT NULL) AS is_dup,
           b.old_id AS match_id,
           b.jaccard
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.doc_id = b.new_id
    WHERE d.doc_id % 10 = 0
    """,
    "incremental ingest dedup — an INCOMING batch (doc_id % 10 = 0, ~10%) "
    "checked against the EXISTING corpus without any corpus self-join: "
    "the batch's LSH bucket table broadcasts, the corpus bucket stream "
    "filters map-side with zero corpus shuffle, and only colliding "
    "(new, old) candidates reach the Jaccard verify; per new doc the best "
    "match (highest jaccard, old-id tiebreak) or a clean is_dup=false.  "
    "The production shape self-join dedup cannot express: daily ingest "
    "cost scales with the batch, not the corpus",
)
def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import incremental_dedup

    sigs = _dedup_stage(spark, sf_dir)
    new_sigs = sigs.filter((F.col("id") % 10) == 0)
    corpus_sigs = sigs.filter((F.col("id") % 10) != 0)
    return incremental_dedup(
        new_sigs, corpus_sigs, threshold=0.2, bands=8, num_hashes=16
    )


_ZIPF_DOCS_PATH = "/tmp/dagger_zipf_docs_v1.parquet"  # seed-pinned fixture


@register(
    "jaccard_zipf_join",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM read_parquet('{_ZIPF_DOCS_PATH}')
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.t, b.t)) AS nint,
             len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS nuni
      FROM d a JOIN d b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, round(nint::DOUBLE / nuni, 6) AS jaccard
    FROM p WHERE 10 * nint >= 9 * nuni
    """,
    "exact Jaccard self-join with the prefix filter PRUNING on-camera: a "
    "seed-pinned Zipfian corpus (1200 docs, log-uniform vocab, 40 planted "
    ">=0.9 copies — the realistic head/tail shape, unlike the driver "
    "documents table whose ~200-token shared vocab makes the qualifying "
    "output itself quadratic) runs UNCAPPED; the oracle brute-forces all "
    "~719k pairs so the hash gate proves the pruned plan loses nothing. "
    "Candidate count vs n(n-1)/2 is asserted in tests/test_zipf_jaccard.py "
    "(~0.1%: rarest-first prefixes almost never collide across unrelated "
    "docs)",
)
def jaccard_zipf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures import write_zipf_docs_parquet
    from ..ops.dedup import jaccard_prefix_join

    write_zipf_docs_parquet(_ZIPF_DOCS_PATH)
    docs = spark.read.parquet(_ZIPF_DOCS_PATH)
    return jaccard_prefix_join(docs)


def _pipeline_verdict_oracle() -> str:
    """Compose the verdict oracle from the three component oracles (each a
    full WITH..SELECT — DuckDB accepts CTEs, including RECURSIVE ones,
    inside subqueries; same technique as the ann_recall oracle)."""
    q = QUERIES["gopher_quality_docs"].oracle
    c = QUERIES["dedup_canonical_docs"].oracle
    d = QUERIES["decontam_docs"].oracle
    return f"""
    SELECT b.doc_id,
           coalesce(q.passes, FALSE) AS passes_quality,
           coalesce(c.keep, FALSE) AS is_canonical,
           coalesce(d.contamination >= 0.05, FALSE) AS is_contaminated,
           (b.doc_id % {_DECON_MOD} = 0) AS is_benchmark,
           (coalesce(q.passes, FALSE) AND coalesce(c.keep, FALSE)
            AND NOT coalesce(d.contamination >= 0.05, FALSE)
            AND b.doc_id % {_DECON_MOD} <> 0) AS keep
    FROM documents b
    LEFT JOIN ({q}) q ON b.doc_id = q.doc_id
    LEFT JOIN ({c}) c ON b.doc_id = c.doc_id
    LEFT JOIN ({d}) d ON b.doc_id = d.doc_id
    """


def pipeline_verdict_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _load_wide(spark, sf_dir, "documents").select("doc_id")
    q = QUERIES["gopher_quality_docs"].fn(spark, sf_dir).select(
        "doc_id", F.col("passes")
    )
    c = QUERIES["dedup_canonical_docs"].fn(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("__can")
    )
    d = QUERIES["decontam_docs"].fn(spark, sf_dir).select(
        "doc_id", "contamination"
    )
    passes = F.coalesce(F.col("passes"), F.lit(False))
    canonical = F.coalesce(F.col("__can"), F.lit(False))
    contaminated = F.coalesce(
        F.col("contamination") >= 0.05, F.lit(False)
    )
    bench = (F.col("doc_id") % _DECON_MOD) == 0
    return (
        # every side is corpus-sized AND stats-less (the quality/decontam
        # sides now descend from a repartition, the canonical side from
        # checkpointed CC labels — both hide scan statistics), so Spark
        # would default each join to sort-merge; shuffle-hash needs no
        # sort and broadcast would be wrong at the design point
        base.join(q.hint("shuffle_hash"), "doc_id", "left")
        .join(c.hint("shuffle_hash"), "doc_id", "left")
        .join(d.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            passes.alias("passes_quality"),
            canonical.alias("is_canonical"),
            contaminated.alias("is_contaminated"),
            bench.alias("is_benchmark"),
            (passes & canonical & ~contaminated & ~bench).alias("keep"),
        )
    )


QUERIES["pipeline_verdict_docs"] = CatalogQuery(
    pipeline_verdict_docs,
    _pipeline_verdict_oracle(),
    "the WHOLE cleaning pipeline as one DAG — every document's final "
    "keep/drop verdict with its reasons: Gopher quality gates AND "
    "near-dup canonical survivorship (LSH -> connected components -> "
    "keep-longest) AND n-gram benchmark decontamination (>= 5% "
    "contaminated shingles drops), benchmark split excluded.  One Spark "
    "job, one scan per signal family; the oracle composes the three "
    "component oracles as subquery CTEs so the hash gate verifies the "
    "END-TO-END decision, not just the parts",
)


def _rp_proj_sql(out_dim: int = 16, dim: int = 64) -> str:
    from ..ops.similarity import rp_signs

    comps = []
    for j in range(out_dim):
        signs = ", ".join(repr(s) for s in rp_signs(j, dim))
        comps.append(f"list_dot_product(v, [{signs}]::DOUBLE[])")
    return "[" + ", ".join(comps) + "]"


@register(
    "ann_rp",
    f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ), p AS (
      SELECT vec_id, {_rp_proj_sql(16, 64)} AS pv FROM e
    ), q AS (SELECT vec_id AS qid, pv AS qv FROM p WHERE vec_id < 8),
    s AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(c.pv, c.pv)) > 0
                  THEN round(list_dot_product(q.qv, c.pv)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.pv, c.pv))), 6)
                  ELSE 0.0 END AS score
      FROM q JOIN p c ON c.vec_id <> q.qid
    ), r AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
    """,
    "ANN via Johnson–Lindenstrauss random projection (Achlioptas ±1 sign "
    "matrix, md5-derived so both engines replay it): 64 -> 16 dims, then "
    "exact cosine top-5 over the short vectors — 4x less per-comparison "
    "compute and 4x fewer at-rest vector bytes.  The 5th rung of the ANN "
    "ladder (brute/LSH/IVF/PQ/RP): where PQ compresses via codebooks and "
    "scans with LUTs, RP keeps plain float arithmetic on a sketch column "
    "projected ONCE at write time.  Exact duplicates stay rank-1 at score "
    "1.0 (identical inputs project identically)",
)
def ann_rp(spark, sf_dir):
    from ..ops.similarity import rp_topk

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    return rp_topk(emb, queries, k=5, out_dim=16, dim=64)


@register(
    "bpe_pair_counts_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), words AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(
               range(1, greatest(length(w) - 1, 0) + 1),
               i -> substr(w, i, 2))) AS pair,
             c
      FROM words
    )
    SELECT pair, sum(c)::BIGINT AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
    """,
    "BPE tokenizer-training pair statistics (the Sennrich et al. merge-"
    "selection inner loop, first iteration): corpus -> word-frequency "
    "table FIRST (one shuffle, map-side combine — exactly how real BPE "
    "training scales: distinct words are millions where corpus tokens are "
    "trillions), then adjacent symbol pairs explode off the SMALL word "
    "table weighted by word count; deterministic top-50 merge candidates.  "
    "The op a pipeline runs before training a tokenizer on its own corpus",
)
def bpe_pair_counts_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grams = F.when(
        F.length(F.col("w")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(F.col("w")) - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = words.select(F.col("c"), F.explode(grams).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


_WS = "[ \\t\\n\\r\\f]"  # explicit class: Python/Java \\s is Unicode, RE2 ASCII


@register(
    "html_strip_docs",
    f"""
    WITH h AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || doc_id || '</title>'
             || '<style>p{{margin:0}}</style></head><body>'
             || '<script type="text/javascript">var t = "' || doc_id
             || '";</script><h1>Doc ' || doc_id || '</h1><p>'
             || coalesce(text, '') || '</p><em>fin</em></body></html>'
               AS html,
             coalesce(text, '') AS src
      FROM documents
    ), s AS (
      SELECT doc_id, src, html,
             regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
             trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               html,
               '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '{_WS}+', ' ', 'g')) AS clean_text
      FROM h
    )
    SELECT doc_id, title,
           length(clean_text) AS n_chars_clean,
           clean_text = trim(regexp_replace(
             'Doc ' || doc_id || ' Doc ' || doc_id || ' ' || src || ' fin',
             '{_WS}+', ' ', 'g')) AS clean_ok,
           clean_text
    FROM s
    """,
    "HTML -> text extraction, the stage every web-scale corpus passes "
    "first: documents wrapped in a deterministic page (title, style, an "
    "inline script) are stripped back — script/style blocks REMOVED "
    "bodily (the boilerplate trap naive tag-stripping misses), remaining "
    "tags to spaces, whitespace collapsed with an explicit [ tnrf] class "
    "(Java regex \\\\s is Unicode, RE2's is ASCII — the sentences_docs "
    "lesson), title extracted separately.  clean_ok proves lossless "
    "recovery of the source text per row; pure regexp column expressions, "
    "zero shuffles",
)
def html_strip_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    src = F.coalesce(F.col("text"), F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "), did, F.lit("</title>"),
        F.lit("<style>p{margin:0}</style></head><body>"),
        F.lit('<script type="text/javascript">var t = "'), did,
        F.lit('";</script><h1>Doc '), did, F.lit("</h1><p>"),
        src, F.lit("</p><em>fin</em></body></html>"),
    )
    staged = docs.select("doc_id", src.alias("__src"), html.alias("__html"))
    ws = "[ \\t\\n\\r\\f]"
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("__html"),
                        r"(?s)<script[^>]*>.*?</script>", " "),
                    r"(?s)<style[^>]*>.*?</style>", " "),
                r"<[^>]+>", " "),
            ws + "+", " ")
    )
    expected = F.trim(
        F.regexp_replace(
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"),
                F.lit(" Doc "), F.col("doc_id").cast("string"),
                F.lit(" "), F.col("__src"), F.lit(" fin"),
            ),
            ws + "+", " ")
    )
    s2 = staged.select(
        "doc_id",
        F.regexp_extract(F.col("__html"), "<title>([^<]*)</title>", 1)
        .alias("title"),
        clean.alias("clean_text"),
        expected.alias("__expected"),
    )
    return s2.select(
        "doc_id",
        "title",
        F.length("clean_text").cast("long").alias("n_chars_clean"),
        (F.col("clean_text") == F.col("__expected")).alias("clean_ok"),
        "clean_text",
    )


_PHRASE = ("table", "hash")


@register(
    "phrase_search_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), idx AS (
      SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos
      FROM toks
    ),
    p0 AS (SELECT doc_id, pos AS start FROM idx WHERE term = '{_PHRASE[0]}'),
    p1 AS (SELECT doc_id, pos - 1 AS start FROM idx WHERE term = '{_PHRASE[1]}')
    SELECT p0.doc_id, count(*) AS n_matches, min(p0.start) AS first_pos
    FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id AND p0.start = p1.start
    GROUP BY p0.doc_id
    """,
    "positional phrase search over an inverted index — the retrieval "
    "shape BM25 can't express: tokens posexplode to (term, doc, pos) "
    "postings, each phrase word's postings FILTER FIRST (tiny lists; at "
    "100 TB the index is partitioned by term and only the phrase's "
    "postings are read), then co-positional equi-join on (doc, start "
    "offset) finds exact adjacency; per-doc match count + first position "
    "(1-based).  Postings joins hinted shuffle-hash — both sides are "
    "same-scale filtered streams, sort-merge would pay an unneeded sort",
)
def phrase_search_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    idx = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    )
    m = None
    for i, w in enumerate(_PHRASE):
        p = idx.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        m = p if m is None else m.join(p.hint("shuffle_hash"), ["doc_id", "start"])
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.min("start") + 1).cast("long").alias("first_pos"),
    )


@register(
    "corpus_diff_docs",
    """
    WITH a AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 <> 0
    ), b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 13 <> 0
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h IS DISTINCT FROM b.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           a.h AS old_hash, b.h AS new_hash
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
    "corpus snapshot diff — the daily data-versioning pass: two snapshots "
    "(old drops doc_id%11=0, new drops %13=0 and edits %7=0) reduce to "
    "(id, content-hash) and full-outer-join into added/removed/changed/"
    "unchanged verdicts.  Only 16-byte hashes join, never content; at "
    "100 TB both snapshots bucket by doc_id so the diff is co-located "
    "map-side — the hint keeps same-scale sides off sort-merge",
)
def corpus_diff_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    # presence comes from explicit flags, NOT hash nullness: md5(NULL text)
    # is NULL for a PRESENT doc, which would misread as added/removed —
    # and the changed-comparison is null-safe for the same reason
    # (fuzz-corpus catch)
    a = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.md5(F.col("text")).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    b = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    j = a.join(b.hint("shuffle_hash"), "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), "changed")
        .otherwise("unchanged")
        .alias("status"),
        "old_hash",
        "new_hash",
    )


_shared_sql(
    "dq_checks_orders",
    """
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS violations,
           (SELECT count(*) FROM orders) AS population
    UNION ALL
    SELECT 'orders_key_unique',
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_qty_range',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 50),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders_price_nonneg',
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice < 0),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.1),
           (SELECT count(*) FROM lineitem)
    """,
    "Deequ-style declarative data-quality suite over the relational "
    "tables — the ingest gate every warehouse runs: referential "
    "integrity (anti-join existence checks Catalyst turns into "
    "broadcast/hash anti joins), key uniqueness, NULL and range "
    "constraints, each reported as (check, violations, population) so "
    "downstream alerting thresholds on the ratio.  Shared SQL text runs "
    "verbatim in both engines; each subquery is one aggregate over one "
    "scan, and at 100 TB the checks batch into a single pass per table "
    "with conditional aggregation",
)


_shared_sql(
    "scd2_customer_priority",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority AS p,
             date_trunc('second', o_orderdate) AS d, o_orderkey AS k,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ), changes AS (
      SELECT o_custkey, p, d, k FROM ordered
      WHERE prev IS NULL OR p <> prev
    )
    SELECT o_custkey, p AS priority, d AS valid_from,
           lead(d) OVER (
             PARTITION BY o_custkey ORDER BY d, k
           ) AS valid_to,
           (lead(d) OVER (
             PARTITION BY o_custkey ORDER BY d, k
           ) IS NULL) AS is_current
    FROM changes
    """,
    "CDC -> SCD Type-2 compaction, the warehouse-history staple: each "
    "customer's order-priority CHANGE points (lag() drops consecutive "
    "repeats) become versioned rows with [valid_from, valid_to) ranges "
    "via lead(), open-ended current row flagged.  Both windows ride ONE "
    "hash partitioning on the entity key — one shuffle total at any "
    "scale; deterministic (date, orderkey) tiebreak.  Shared SQL text "
    "runs verbatim in both engines",
)


def _gapfill_sql(grid_expr: str) -> str:
    """One query text, one dialect hole: the dense-grid explode is
    ``explode(sequence(...))`` in Spark, ``unnest(generate_series(...))``
    in DuckDB; everything else is shared verbatim."""
    return f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(avg(value), 6) AS v
      FROM events WHERE user_id % 20 = 0
      GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly
      GROUP BY user_id
    ), grid AS (
      SELECT user_id, {grid_expr} AS h FROM bounds
    ), joined AS (
      SELECT g.user_id, g.h, hr.v,
             count(hr.v) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING
             ) AS grp
      FROM grid g LEFT JOIN hourly hr
        ON g.user_id = hr.user_id AND g.h = hr.h
    )
    SELECT user_id, h AS hour, (v IS NULL) AS filled,
           max(v) OVER (PARTITION BY user_id, grp) AS value_ff
    FROM joined
    """


_shared_sql(
    "events_gapfill",
    _gapfill_sql("explode(sequence(h0, h1, INTERVAL 1 HOUR))"),
    "time-series gap-fill + forward-fill, the resampling op Spark has no "
    "native verb for: per-user hourly averages land on a DENSE hour grid "
    "(sequence explode between each user's own bounds) and gaps carry "
    "the last observation forward.  The fill uses the "
    "count-over-preceding trick — count(v) over preceding rows is "
    "constant within each observation's fill-run, so max(v) per (user, "
    "run) IS the forward fill — which runs identically in both engines "
    "(last_value IGNORE NULLS is the intent, but engines disagree on "
    "IGNORE NULLS in window frames; the trick sidesteps it).  Agg, "
    "fill-run window, and run-max all ride user-keyed partitionings; "
    "user_id % 20 keeps the demo grid bounded",
    oracle_sql=_gapfill_sql("unnest(generate_series(h0, h1, INTERVAL 1 HOUR))"),
)


def _debounce_sql(epoch_expr: str) -> str:
    """One text, one dialect hole: seconds-since-epoch is
    ``unix_timestamp(ts)`` in Spark, ``epoch(ts)`` in DuckDB."""
    e = epoch_expr
    return f"""
    WITH err AS (
      SELECT user_id, date_trunc('second', ts) AS ts
      FROM events WHERE event_type = 'error'
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR {e.format(c="ts")} - {e.format(c="lag(ts) OVER w")}
                       > 1800
                  THEN 1 ELSE 0 END AS re_armed
      FROM err
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             sum(re_armed) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS episode
      FROM flagged
    )
    SELECT user_id, CAST(episode AS BIGINT) AS episode,
           min(ts) AS alert_ts,
           count(*) - 1 AS n_suppressed,
           CAST({e.format(c="max(ts)")} - {e.format(c="min(ts)")}
                AS BIGINT) AS episode_span_s
    FROM sessions GROUP BY user_id, episode
    """


@register(
    "events_alert_debounce",
    _debounce_sql("epoch({c})"),
    "alert debouncing, the SIEM noise-control staple: per (user, error) "
    "stream, emit the FIRST alert of each burst and suppress followers "
    "until a quiet gap of 30 min re-arms — the gap-session semantics "
    "(quiet period extends while events keep coming), expressed as the "
    "classic lag-flag + running-sum sessionization with first/count per "
    "episode.  All three windows ride ONE user-keyed partitioning "
    "(single shuffle); the fixed-window-from-emission variant (chained "
    "throttle) is inherently stateful and lives in the timeframe engine's "
    "episode suppression (rules/timeframe.py).  Reports suppressed count "
    "and episode span so the noise reduction is itself measured",
)
def events_alert_debounce(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_debounce_sql("unix_timestamp({c})"))


@register(
    "events_pattern_match",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(s) AS n_events,
           len(regexp_extract_all(s, 'vc+p')) AS n_patterns,
           len(regexp_extract_all(s, 'vc+p')) > 0 AS matched
    FROM seq
    """,
    "MATCH_RECOGNIZE-style event-sequence pattern matching (the SQL-2016 "
    "feature Spark lacks): per-user event types collapse — ordered by "
    "(ts, event_id), initials only — into one string per user, and the "
    "row-pattern 'view, one-or-more clicks, purchase' becomes the regex "
    "vc+p counted non-overlapping.  One user-keyed shuffle; the sequence "
    "string is bounded by the user's event count, and at 100 TB the "
    "same shape runs windowed (pattern within session) rather than "
    "whole-history.  Initials are distinct across the 5 event types, so "
    "the encoding is lossless here; a general encoder maps types to "
    "single codepoints first",
)
def events_pattern_match(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"), F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("s")
    )
    n = F.coalesce(F.regexp_count(F.col("s"), F.lit("vc+p")), F.lit(0))
    return seq.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        n.cast("long").alias("n_patterns"),
        (n > 0).alias("matched"),
    )


def _pattern_sessions_sql(agg: str, count_matches: str) -> str:
    """One text, two dialect holes: ordered string aggregation is
    ``string_agg(c, '') WITHIN GROUP (ORDER BY ...)`` in Spark 4 but
    ``string_agg(c, '' ORDER BY ...)`` in DuckDB, and list length is
    ``size`` vs ``len``."""
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS i,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, i,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, event_id, ts, i,
             cast(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    ), seq AS (
      SELECT user_id, session_id,
             {agg} AS s,
             date_trunc('second', min(ts)) AS session_start
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, session_start,
           cast(length(s) AS BIGINT) AS n_events,
           cast({count_matches} AS BIGINT) AS n_patterns
    FROM seq
    WHERE {count_matches} > 0
    """


@register(
    "events_pattern_match_sessions",
    _pattern_sessions_sql(
        "string_agg(i, '' ORDER BY ts, event_id)",
        "len(regexp_extract_all(s, 'vc*p'))",
    ),
    "the 100 TB form of events_pattern_match, previously only documented "
    "in its docstring: the row-pattern 'view, then clicks, then "
    "purchase' (vc*p: the session variant relaxes clicks to zero-or-"
    "more — gap sessions in this corpus are minutes long, so the "
    "conversion often skips the click) matched WITHIN each 30-min gap "
    "session instead of over a "
    "user's whole history, so the per-group sequence string is bounded by "
    "session length (minutes of activity) rather than corpus lifetime — "
    "the difference between O(session) and O(years-of-events) state per "
    "key.  Reuses events_sessionization's gaps-and-islands session ids "
    "(lag + running sum, ONE user-keyed shuffle shared by both windows "
    "and the final group), then string_agg WITHIN GROUP orders initials "
    "per session and the regex counts non-overlapping matches.  Emits "
    "only matched sessions — the alert shape",
)
def events_pattern_match_sessions(spark, sf_dir):
    load_tables(spark, sf_dir, names=("events",))
    return spark.sql(_pattern_sessions_sql(
        "string_agg(i, '') WITHIN GROUP (ORDER BY ts, event_id)",
        "size(regexp_extract_all(s, 'vc*p', 0))",
    ))


def _hierarchy_sql(intdiv: str) -> str:
    """One text, one dialect hole: integer division is ``DIV`` in Spark
    SQL, ``//`` in DuckDB."""
    return f"""
    WITH RECURSIVE chain(custkey, anc, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      WHERE c_custkey BETWEEN 1 AND 500
      UNION ALL
      SELECT custkey, anc {intdiv} 2, depth + 1 FROM chain WHERE anc > 1
    )
    SELECT ch.custkey,
           max(ch.depth) AS depth,
           count(*) AS chain_len,
           round(sum(a.c_acctbal), 2) AS chain_balance
    FROM chain ch JOIN customer a ON a.c_custkey = ch.anc
    GROUP BY ch.custkey
    """


@register(
    "customer_hierarchy",
    _hierarchy_sql("//"),
    "hierarchical rollup via RECURSIVE CTE — the Spark 4 SQL surface "
    "(org charts, category trees, BOM explosions) exercised end-to-end: "
    "each customer walks a synthetic binary-tree ancestor chain "
    "(parent = custkey div 2) accumulating depth and the SUM of account "
    "balances along the chain, the classic hierarchical aggregate.  The "
    "recursion is DAG-bounded (ancestors strictly decrease), which "
    "matters: Spark supports only UNION ALL recursion, so cyclic-graph "
    "closures stay with the iterative connected-components operator — "
    "the boundary between the two is documented here on purpose.  One "
    "dialect hole (DIV vs //); both engines run the same text otherwise",
)
def customer_hierarchy(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(_hierarchy_sql("DIV"))


_shared_sql(
    "events_winsorized_stats",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), b AS (
      SELECT event_type,
             percentile_cont(0.0625) WITHIN GROUP (ORDER BY vm) AS lo,
             percentile_cont(0.9375) WITHIN GROUP (ORDER BY vm) AS hi
      FROM v GROUP BY event_type
    ), bi AS (
      -- the bounds interpolate integer micro-units at dyadic 1/16
      -- fractions, so lo*16 and hi*16 are EXACT integers — everything
      -- downstream is integer arithmetic and the means are each ONE
      -- double division (a float avg() sums in engine-specific order and
      -- diverged by 1 ulp on a 6-decimal fuzz corpus)
      SELECT event_type,
             CAST(round(lo * 16) AS BIGINT) AS lo16,
             CAST(round(hi * 16) AS BIGINT) AS hi16
      FROM b
    )
    SELECT e.event_type,
           count(*) AS n,
           round(CAST(sum(e.vm) AS BIGINT) / (count(*) * 1e6) + 1e-9, 6)
             AS raw_mean,
           round(CAST(sum(least(greatest(e.vm * 16, b.lo16), b.hi16))
                      AS BIGINT) / (count(*) * 16e6) + 1e-9, 6)
             AS winsorized_mean,
           round(b.lo16 / 16e6 + 1e-9, 6) AS p_lo,
           round(b.hi16 / 16e6 + 1e-9, 6) AS p_hi
    FROM v e JOIN bi b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.lo16, b.hi16
    """,
    "winsorized robust statistics per group — the outlier-resistant "
    "aggregate metrics pipelines report next to raw means: exact "
    "percentile bounds over integer micro-units (DYADIC fractions 1/16 "
    "and 15/16, the percentile_prices rule — the interpolation "
    "x + (y-x)*k/16 over integers is exactly representable, so bound*16 "
    "is an exact integer), values clipped into [lo, hi] via "
    "least/greatest in 16ths-of-micro units, then each mean is one "
    "integer sum + one double division — order-free where a float avg() "
    "diverges by summation order.  Two passes over the group (bounds agg "
    "+ clipped agg), both riding the same group-key partitioning; the "
    "bounds side is group-cardinality-sized and broadcasts at scale",
)


@register(
    "classifier_calibration_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg,
             lang
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t, lang
            FROM documents)
    ), s AS (
      SELECT doc_id, lang,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit
      FROM g, (SELECT {{weights}} AS w)
    ), q AS (
      SELECT lang, count(*) AS n,
             round(percentile_cont(0.375)
                   WITHIN GROUP (ORDER BY logit), 6) AS thr_625
      FROM s GROUP BY lang
    )
    SELECT q.lang, q.n, q.thr_625,
           round(sum(CASE WHEN s.logit >= q.thr_625 THEN 1 ELSE 0 END)
                 / q.n::DOUBLE + 1e-9, 6) AS actual_keep_rate
    FROM s JOIN q ON s.lang = q.lang
    GROUP BY q.lang, q.n, q.thr_625
    """.format(weights="[" + ", ".join(
        str(w) for w in __import__(
            "dagger_spark.ops.text", fromlist=["classifier_weights"]
        ).classifier_weights()) + "]"),
    "classifier CALIBRATION, the step between training and gating: the "
    "per-language keep threshold is DERIVED from the logit distribution "
    "(the 37.5% quantile keeps the top 62.5% — dyadic fraction per the "
    "percentile_prices interpolation rule) instead of hand-picked, and "
    "the actually-achieved keep rate at that threshold is emitted beside "
    "it (interpolated thresholds between integer logits need not attain "
    "the nominal rate exactly — the gap is data, not error).  Completes "
    "the model-filter family: train (weights) -> calibrate (threshold) "
    "-> gate (policy table).  Quantiles per group ride one lang-keyed "
    "partitioning; the threshold table is lang-cardinality-sized and "
    "broadcasts at scale",
)
def classifier_calibration_docs(spark, sf_dir):
    from ..ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", char_trigrams(F.col("text")).alias("__tg")
    )
    s = staged.select(
        "doc_id", "lang",
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit"),
    )
    q = s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile_cont(0.375) WITHIN GROUP (ORDER BY logit)"), 6)
        .alias("thr_625"),
    )
    j = s.join(F.broadcast(q), "lang")
    return j.groupBy("lang", "n", "thr_625").agg(
        F.round(
            F.sum(F.when(F.col("logit") >= F.col("thr_625"), 1).otherwise(0))
            / F.col("n").cast("double")
            + F.lit(1e-9),
            6,
        ).alias("actual_keep_rate")
    ).select("lang", "n", "thr_625", "actual_keep_rate")


#: per-language classifier-logit thresholds (milli-units) — policy AS DATA
_LANG_POLICY = (("en", 0), ("de", -50), ("es", -50), ("fr", -100))
_LANG_POLICY_DEFAULT = 50


@register(
    "quality_policy_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg,
             lang
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t, lang
            FROM documents)
    ), s AS (
      SELECT doc_id, lang,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit_milli
      FROM g, (SELECT {{weights}} AS w)
    ), pol AS (
      SELECT * FROM (VALUES {{policy_rows}}) v(lang, thr)
    )
    SELECT s.doc_id, s.lang, s.logit_milli,
           CAST(coalesce(p.thr, {_LANG_POLICY_DEFAULT}) AS BIGINT)
             AS threshold,
           s.logit_milli >= coalesce(p.thr, {_LANG_POLICY_DEFAULT}) AS keep
    FROM s LEFT JOIN pol p ON s.lang = p.lang
    """.format(
        weights="[" + ", ".join(
            str(w) for w in __import__(
                "dagger_spark.ops.text", fromlist=["classifier_weights"]
            ).classifier_weights()
        ) + "]",
        policy_rows=", ".join(f"('{l}', {t})" for l, t in _LANG_POLICY),
    ),
    "policy-table gating, the config-as-data pattern: per-LANGUAGE "
    "classifier-logit thresholds live in a tiny policy table (broadcast "
    "joined; unknown languages fall back to a stricter default) instead "
    "of being baked into code — retuning a language's bar is a data "
    "change, no redeploy.  Composes the oracle-verified hashing-trick "
    "classifier; thresholds are integer milli-units so the gate decision "
    "is parity-exact.  NULL lang takes the default path in both engines "
    "(LEFT JOIN miss -> coalesce)",
)
def quality_policy_docs(spark, sf_dir):
    from ..ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", char_trigrams(F.col("text")).alias("__tg")
    )
    scored = staged.select(
        "doc_id", "lang",
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit_milli"),
    )
    policy = spark.createDataFrame(
        list(_LANG_POLICY), "lang string, thr long"
    )
    j = scored.join(F.broadcast(policy), "lang", "left")
    thr = F.coalesce(F.col("thr"), F.lit(_LANG_POLICY_DEFAULT))
    return j.select(
        "doc_id", "lang", "logit_milli",
        thr.cast("long").alias("threshold"),
        (F.col("logit_milli") >= thr).alias("keep"),
    )


@register(
    "events_hll_intersect",
    """
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events
              WHERE user_id IS NOT NULL),
    cnt AS (SELECT event_type, count(*) AS c FROM tu GROUP BY event_type),
    px AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS ci
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(ca.c AS BIGINT) AS exact_a,
           CAST(cb.c AS BIGINT) AS exact_b,
           CAST(ca.c + cb.c - px.ci AS BIGINT) AS exact_union,
           CAST(px.ci AS BIGINT) AS exact_intersect,
           TRUE AS intersect_within_band
    FROM px
    JOIN cnt ca ON ca.event_type = px.type_a
    JOIN cnt cb ON cb.event_type = px.type_b
    """,
    "HLL set-INTERSECTION estimation via inclusion-exclusion (est_a + "
    "est_b - est_union over mergeable sketches) for every event-type "
    "pair — the audience-overlap question sketches answer without "
    "rescanning raw data at 100 TB.  Same BOUNDED-oracle shape as "
    "events_hll_rollup: Spark computes approx AND exact, emits exact "
    "plus a within-band flag (10% of the union: differencing amplifies "
    "sketch error ~3x over a single estimate at lgConfigK=12's ~1.6% "
    "rsd, so the loose band is the honest one), the oracle pins exact "
    "counts and TRUE — a broken union/estimate flips the flag",
)
def events_hll_intersect(spark, sf_dir):
    # NULL user_ids excluded EXPLICITLY on both sides: sketches and
    # count_distinct skip NULLs while a DISTINCT projection keeps the NULL
    # row — the fuzz corpus caught the one-off (mirrored in the oracle)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk"),
        F.count_distinct("user_id").cast("long").alias("exact"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"),
        F.col("exact").alias("exact_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"),
        F.col("exact").alias("exact_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate(F.col("sk_a"))
    est_b = F.hll_sketch_estimate(F.col("sk_b"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b")))
    est_i = est_a + est_b - est_u
    tu = ev.select("event_type", "user_id").distinct()
    inter = (
        tu.alias("x")
        .join(
            tu.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    j = pairs.join(inter, ["type_a", "type_b"])
    exact_union = (
        F.col("exact_a") + F.col("exact_b") - F.col("exact_intersect")
    )
    return j.select(
        "type_a", "type_b", "exact_a", "exact_b",
        exact_union.cast("long").alias("exact_union"),
        "exact_intersect",
        (
            F.abs(est_i - F.col("exact_intersect"))
            <= 0.10 * exact_union.cast("double")
        ).alias("intersect_within_band"),
    )


@register(
    "contrastive_triplets",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS anchor_id, v AS qv FROM e WHERE vec_id < 32
    ), s AS (
      SELECT q.anchor_id, e.vec_id AS cand_id,
             CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score,
             md5(q.anchor_id::VARCHAR || ':' || e.vec_id::VARCHAR) AS h
      FROM q JOIN e ON e.vec_id <> q.anchor_id
    ), rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY score DESC, cand_id) AS rk
      FROM s
    ), pos AS (
      SELECT anchor_id, cand_id AS pos_id, score AS pos_score
      FROM rk WHERE rk = 1
    ), neg AS (
      SELECT anchor_id, cand_id AS neg_id, score AS neg_score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY anchor_id ORDER BY h, cand_id) AS nk
        FROM rk WHERE rk > 1
      ) WHERE nk = 1
    )
    SELECT anchor_id, pos_id, pos_score, neg_id, neg_score,
           round(pos_score - neg_score, 6) AS margin
    FROM pos JOIN neg USING (anchor_id)
    """,
    "contrastive training-triplet mining for embedding models: per "
    "anchor, the POSITIVE is its exact cosine top-1 and the NEGATIVE a "
    "deterministic hash-random corpus row (min md5(anchor:cand), "
    "positive and self excluded) — the (anchor, positive, "
    "random-negative) batch shape contrastive losses train on, with the "
    "margin reported so near-tie anchors are visible in the data.  ONE "
    "scored pass serves both roles (queries broadcast, corpus scanned "
    "once, two windows over the same anchor-keyed partitioning); swap "
    "bucketed ANN in for the positive when exact top-1 is too expensive "
    "at scale",
)
def contrastive_triplets(spark, sf_dir):
    from ..ops.similarity import contrastive_triplets as _ct

    emb = _load_wide(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return _ct(emb, emb.filter(F.col("vec_id") < 32))


def _pagerank_oracle(iters: int = 10) -> str:
    """The SAME integer iteration unrolled as chained CTEs (standard SQL
    forbids aggregation in a recursive member, and unrolling mirrors the
    Spark loop literally anyway)."""
    parts = [_DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), deg AS (
      SELECT src, count(*) AS deg FROM sym GROUP BY src
    ), e AS (
      SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src)
    ), r0 AS (
      SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS r FROM documents
    )"""]
    for k in range(1, iters + 1):
        parts.append(f""", r{k} AS (
      SELECT n.doc_id AS id,
             CAST(150000 + (85 * coalesce(sum(pr.r // e.deg), 0)) // 100
                  AS BIGINT) AS r
      FROM documents n
      LEFT JOIN e ON e.dst = n.doc_id
      LEFT JOIN r{k - 1} pr ON pr.id = e.src
      GROUP BY n.doc_id
    )""")
    parts.append(f"""
    SELECT r{iters}.id AS doc_id,
           coalesce(deg.deg, 0)::BIGINT AS degree,
           r{iters}.r AS rank_micro
    FROM r{iters} LEFT JOIN deg ON deg.src = r{iters}.id
    """)
    return "".join(parts)


@register(
    "pagerank_docs",
    _pagerank_oracle(10),
    "integer-scaled PageRank over the document SIMILARITY graph (the LSH "
    "candidate pairs the dedup family already computes, symmetrized) — "
    "the centrality-as-quality-weight signal CommonCrawl-scale pipelines "
    "apply before sampling.  Ten damped Pregel rounds, each ONE src-keyed "
    "join + ONE dst-keyed aggregate (two shuffles/round at any scale), "
    "lineage truncated per round like connected_components, stats-less "
    "joins hinted shuffle-hash.  Ranks are micro-unit INTEGERS (r div "
    "deg contributions, (85*sum) div 100 damping): every sum is "
    "order-free, so the oracle — the same ten iterations unrolled as "
    "chained CTEs — matches hash-exactly; floor division sheds mass, so "
    "this is a deterministic centrality score, not a distribution",
)
def pagerank_docs(spark, sf_dir):
    from ..ops.dedup import minhash_candidate_pairs
    from ..ops.graph import pagerank_int

    docs = _load_wide(spark, sf_dir, "documents")
    # persist the pair list: the symmetrization below references it twice
    # (union of both directions), and pagerank_int's edge build runs both
    # branches in one materialization — unpersisted, the LSH bucket
    # self-join executes twice (guide §7.2 duplicated-subtree audit)
    cand = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    ).persist()
    sym = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        cand.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    # stride 5 = two localCheckpoint jobs for the 10 rounds (after r5/r10)
    # vs stride 3's four; measured at sf0.1/local[32]: 5.4-5.6 s vs
    # 5.9-9.0 s.  The plan runs ≤5 iterations deep — fine for this
    # two-shuffle round shape; graphs that pressure executor memory
    # should drop back toward 1 (see pagerank_int's docstring).
    return pagerank_int(
        nodes, sym, iters=10, checkpoint_every=5
    ).withColumnRenamed("id", "doc_id")


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           round((count(*) - count({c})) / count(*)::DOUBLE + 1e-9, 6)
             AS null_frac,
           count(DISTINCT {c}) AS n_distinct,
           min({c})::VARCHAR AS min_value,
           max({c})::VARCHAR AS max_value
    FROM documents"""


@register(
    "profile_documents",
    " UNION ALL ".join(
        _profile_col_sql(c)
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    ),
    "one-pass table profiling, the ingest-time data-quality pass: per "
    "column — null count/fraction, EXACT distinct count, min/max "
    "aggregated on the native type then cast to string.  All columns "
    "profile in ONE aggregation job (the countDistinct set rewrites to a "
    "single expand+aggregate: one shuffle total), per-column rows explode "
    "from the single result row driver-side.  At 100 TB swap exact "
    "distinct for approx_count_distinct (see events_approx_distinct); "
    "exact is kept here so the oracle can verify it",
)
def profile_documents(spark, sf_dir):
    from ..ops.quality import profile_table

    docs = _load_wide(spark, sf_dir, "documents")
    return profile_table(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _classifier_weights_sql() -> str:
    from ..ops.text import classifier_weights

    return "[" + ", ".join(str(w) for w in classifier_weights()) + "]"


@register(
    "quality_classifier_docs",
    f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> substr(t, i, 3))) AS tg
      FROM (SELECT doc_id, lower(trim(coalesce(text, ''))) AS t
            FROM documents)
    ), s AS (
      SELECT doc_id, len(tg) AS n_feats,
             coalesce(list_sum(list_transform(
               tg, x -> w[('0x' || substr(md5(x), 1, 8))::BIGINT % 1024 + 1]
             )), 0)::BIGINT AS logit_milli
      FROM g, (SELECT {_classifier_weights_sql()} AS w)
    )
    SELECT doc_id, n_feats, logit_milli,
           round(1.0 / (1.0 + exp(-(logit_milli / 1000.0))) + 1e-9, 6) AS score,
           logit_milli > 0 AS keep
    FROM s
    """,
    "model-based quality filter in the fastText / hashing-trick serving "
    "shape: distinct char trigrams -> md5 hash bucket (dim 1024) -> "
    "weight-vector lookup -> logit fold -> sigmoid score + keep decision.  "
    "The weight vector is a plan-time Literal (a trained model's weights "
    "broadcast into codegen), buckets are md5-derived so both engines "
    "embed the identical array, and the weights are INTEGER milli-units so "
    "the per-doc logit is an order-free integer sum (a float fold would "
    "depend on element order and break cross-engine parity).  Zero "
    "shuffles: the entire classifier is one narrow projection — the 100 TB "
    "shape for cheap model-based filtering before any expensive stage",
)
def quality_classifier_docs(spark, sf_dir):
    from ..ops.text import (
        char_trigrams, classifier_weights, hashing_trick_logit,
    )
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", char_trigrams(F.col("text")).alias("__tg")
    )
    scored = staged.select(
        "doc_id",
        F.size(F.col("__tg")).cast("long").alias("n_feats"),
        hashing_trick_logit(F.col("__tg"), classifier_weights())
        .alias("logit_milli"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "logit_milli",
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("logit_milli") / F.lit(1000.0))))
            + F.lit(1e-9),
            6,
        ).alias("score"),
        (F.col("logit_milli") > 0).alias("keep"),
    )


@register(
    "unigram_logprob_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ), vocab AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), stats AS (
      SELECT sum(c) AS n_total, count(*) AS n_vocab FROM vocab
    ), lp AS (
      SELECT tok,
             CAST(round(ln((c + 1.0) / (n_total + n_vocab)) * 1e6)
                  AS BIGINT) AS lp_micro
      FROM vocab, stats
    ), per_doc AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             sum(l.lp_micro)::BIGINT AS sum_lp_micro
      FROM tok t JOIN lp l ON t.tok = l.tok
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, sum_lp_micro,
           round(sum_lp_micro / (n_tokens * 1e6) + 1e-9, 6) AS avg_logprob,
           round(exp(-round(sum_lp_micro / (n_tokens * 1e6) + 1e-9, 6))
                 + 1e-9, 4) AS perplexity
    FROM per_doc
    """,
    "unigram-LM document scoring, the CCNet-style perplexity quality "
    "signal: pass 1 aggregates corpus token counts (ONE shuffle on token, "
    "map-side combine), pass 2 broadcasts the add-one-smoothed log-prob "
    "table and folds per-document average log-prob + perplexity.  "
    "Per-token log-probs are rounded to integer micro-nats BEFORE the "
    "per-doc sum so the aggregation is order-free (float sums across "
    "partitions are not), and perplexity exponentiates the already-rounded "
    "average so both engines exp the same clean double.  Zero-token "
    "documents drop out (no tokens to score).  Scale note: this corpus's "
    "vocab broadcasts; at open-vocab 100 TB the per-doc join shuffles on "
    "token instead — same plan minus the hint, and the Zipf head still "
    "map-side-combines",
)
def unigram_logprob_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("n_vocab")
    )
    lp = vocab.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.round(
            F.log((F.col("c") + F.lit(1.0))
                  / (F.col("n_total") + F.col("n_vocab"))) * 1e6,
            0,
        ).cast("long").alias("lp_micro"),
    )
    per_doc = (
        tok.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
    )
    avg = F.round(
        F.col("sum_lp_micro") / (F.col("n_tokens") * F.lit(1e6))
        + F.lit(1e-9),
        6,
    )
    return per_doc.select(
        "doc_id", "n_tokens", "sum_lp_micro", avg.alias("avg_logprob")
    ).withColumn(
        "perplexity",
        F.round(F.exp(-F.col("avg_logprob")) + F.lit(1e-9), 4),
    )


@register(
    "winnowing_docs",
    """
    WITH h AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(t) - 7, 1) + 1),
               i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT
             ) AS hs
      FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
    ), w AS (
      SELECT doc_id, len(hs) AS n_grams,
             list_sort(list_distinct(list_transform(
               range(1, greatest(len(hs) - 15, 1) + 1),
               i -> list_min(list_slice(hs, i, i + 15))))) AS fps
      FROM h
    )
    SELECT doc_id, n_grams,
           len(fps) AS n_fingerprints,
           round(len(fps)::DOUBLE / greatest(n_grams - 15, 1) + 1e-9, 6)
             AS density,
           array_to_string(fps, '|') AS fingerprints
    FROM w
    """,
    "Schleimer winnowing (the MOSS fingerprint): 8-char-gram 60-bit "
    "hashes, window-16 minima, distinct sorted fingerprint set per "
    "document — every 16-gram span contributes a fingerprint, so any two "
    "documents sharing a >=23-char substring share one.  Pure per-row "
    "array expressions (hash array staged as an attribute so the window "
    "transform doesn't re-hash per window), zero shuffles; expected "
    "density 2/(w+1) ~ 0.118 is emitted as a checked value.  The upgrade "
    "over doc_fingerprint's single global-min: position-local minima "
    "survive partial edits, the property substring-level near-dup "
    "detection actually needs",
)
def winnowing_docs(spark, sf_dir):
    from ..ops.text import char_kgram_hashes, winnow_fingerprints
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", char_kgram_hashes(F.col("text"), 8).alias("__hs")
    )
    w2 = staged.select(
        "doc_id",
        F.size(F.col("__hs")).cast("long").alias("n_grams"),
        winnow_fingerprints(F.col("__hs"), 16).alias("__fps"),
    )
    return w2.select(
        "doc_id",
        "n_grams",
        F.size(F.col("__fps")).cast("long").alias("n_fingerprints"),
        F.round(
            F.size(F.col("__fps"))
            / F.greatest(F.col("n_grams") - 15, F.lit(1))
            + F.lit(1e-9),
            6,
        ).alias("density"),
        F.concat_ws("|", F.col("__fps").cast("array<string>"))
        .alias("fingerprints"),
    )


