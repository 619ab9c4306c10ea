"""continuation wave 1: tokenizer apply, doc surgery, CDC chunking, MERGE, unpivot, bigram LM, graph, sketches.

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403
from .docs import (  # noqa: F401
    _DUCK_MINHASH_CTE, _DUCK_TOKS, _dedup_stage, _duck_lsh_cte,
    _duck_minhash_mins,
)
from .rows_only import _media_fixture  # noqa: F401

# ===========================================================================
# Round-3 continuation wave: tokenizer apply, doc surgery, CDC chunking,
# warehouse MERGE, unpivot, bigram LM
# ===========================================================================

# BPE merge table — a frozen MODEL ARTIFACT (learned offline from the
# sf0.01 word-frequency table with deterministic ties: max count, then
# lexicographic), shipped as data exactly the way production tokenizers
# ship merges.txt.  Applying merge k everywhere before merge k+1, each
# left-to-right non-overlapping, IS the BPE apply algorithm — and that is
# literally the semantics of chained string replace() in both engines.
_BPE_MERGES = [
    ("e r", "er"), ("i n", "in"), ("o w", "ow"), ("o r", "or"),
    ("s t", "st"), ("m er", "mer"), ("a t", "at"), ("l u", "lu"),
    ("a r", "ar"), ("p ar", "par"), ("j o", "jo"), ("jo in", "join"),
]


def _bpe_duck_expr(col: str) -> str:
    # chars spaced: DuckDB regexp_replace needs the 'g' flag (default is
    # first-match-only; Spark's replaces all) — one of the two dialect
    # holes, the other being \\1 vs $1 backreferences.
    e = f"trim(regexp_replace({col}, '(.)', '\\1 ', 'g'))"
    for a, b in _BPE_MERGES:
        e = f"replace({e}, '{a}', '{b}')"
    return e


@register(
    "bpe_encode_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), vocab AS (
      SELECT w, count(*) AS c FROM tok GROUP BY w
    ), enc AS (
      SELECT w, len(string_split({_bpe_duck_expr('w')}, ' ')) AS np
      FROM vocab
    )
    SELECT t.doc_id,
           count(*)::BIGINT            AS n_words,
           sum(e.np)::BIGINT           AS n_pieces,
           round(sum(e.np)::DOUBLE / count(*) + 1e-9, 6) AS pieces_per_word
    FROM tok t JOIN enc e ON t.w = e.w
    GROUP BY t.doc_id
    """,
    "BPE tokenizer APPLY at corpus scale (the serving half of the "
    "bpe_pair_counts training step): encode the DISTINCT-WORD table — the "
    "real tokenizer-serving shape, vocabulary-sized work not corpus-sized "
    "— by spacing characters and folding the frozen merge list through "
    "chained replace().  Equivalence caveat (found by "
    "test_wave_properties): replace() equals the classic symbol-list BPE "
    "scan only when no producible symbol extends a merge operand across a "
    "token boundary — 'j o' after 'o w' would glue j to half of 'ow'.  "
    "The shipped table is proven exact on every corpus word "
    "(test_engine_merge_table_exact_on_corpus_vocabulary); on unsafe "
    "inputs both engines still agree (both run replace()), so the gate "
    "verifies the same documented discretization.  Piece counts "
    "broadcast-join back onto the token stream for per-doc totals; zero "
    "UDFs, the merge fold is one codegen'd expression.  Scale: vocab "
    "table is Zipf-bounded (MBs at 100 TB), corpus pass is a broadcast "
    "join + one doc-keyed aggregate",
)
def bpe_encode_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    vocab = tok.groupBy("w").agg(F.count("*").alias("c"))
    enc = F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 "))
    for a, b in _BPE_MERGES:
        enc = F.replace(enc, F.lit(a), F.lit(b))
    pieces = vocab.select(
        "w", F.size(F.split(enc, " ")).alias("np")
    )
    return (
        tok.join(F.broadcast(pieces), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("np").cast("long").alias("n_pieces"),
            F.round(
                F.sum("np").cast("double") / F.count("*") + F.lit(1e-9), 6
            ).alias("pieces_per_word"),
        )
    )


_SCRUB_SIZE, _SCRUB_MAXFREQ = 10, 2  # remove chunks occurring > 2 times


@register(
    "line_scrub_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), starts AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t), 1) + 1, {_SCRUB_SIZE})) AS s
      FROM toks
    ), chunks AS (
      SELECT doc_id, s,
             array_to_string(list_slice(t, s, s + {_SCRUB_SIZE} - 1), ' ') AS txt
      FROM starts WHERE len(list_slice(t, s, s + {_SCRUB_SIZE} - 1)) > 0
    ), freqd AS (
      SELECT doc_id, s, txt,
             count(*) OVER (PARTITION BY md5(txt)) AS freq
      FROM chunks
    ), per_doc AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_chunks,
             sum(CASE WHEN freq > {_SCRUB_MAXFREQ} THEN 1 ELSE 0 END)::BIGINT
               AS n_removed,
             coalesce(string_agg(txt, ' ' ORDER BY s)
                        FILTER (WHERE freq <= {_SCRUB_MAXFREQ}), '')
               AS scrubbed
      FROM freqd GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_removed,
           CASE WHEN trim(scrubbed) = '' THEN 0
                ELSE len(string_split(trim(scrubbed), ' ')) END::BIGINT
             AS scrubbed_tokens,
           md5(scrubbed) AS scrub_hash
    FROM per_doc
    """,
    "RefinedWeb/MassiveText-style line-level scrub — DOCUMENT SURGERY, "
    "not gating: every 10-token chunk whose exact text occurs more than "
    "twice corpus-wide (boilerplate) is cut OUT of the document and the "
    "survivor text reconstructed in original order; the gate hashes the "
    "reconstructed text itself, so ordering bugs cannot hide.  (This "
    "corpus has no newlines, so 'line' = fixed token chunk — same surgery "
    "mechanics.)  One md5-keyed frequency window + one doc-keyed ordered "
    "rebuild; only hashes shuffle for the dedup decision.  Complements "
    "chunk_dedup_docs (which KEEPS first occurrences and reports stats)",
)
def line_scrub_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    df = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)),
                        F.lit(_SCRUB_SIZE))
    chunk = F.slice(F.col("t"), F.col("s"), _SCRUB_SIZE)
    ex = (
        df.select("doc_id", "t", F.explode(starts).alias("s"))
        .select("doc_id", "s", F.array_join(chunk, " ").alias("txt"),
                F.size(chunk).alias("n"))
        .filter(F.col("n") > 0)
    )
    freq = F.count("*").over(Window.partitionBy(F.md5("txt")))
    fd = ex.withColumn("freq", freq)
    kept = F.col("freq") <= _SCRUB_MAXFREQ
    per_doc = fd.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("s"), F.col("txt")))
                    )
                ),
                lambda x: x["txt"],
            ),
            " ",
        ).alias("scrubbed"),
    )
    return per_doc.select(
        "doc_id", "n_chunks", "n_removed",
        F.when(F.trim(F.col("scrubbed")) == "", F.lit(0))
         .otherwise(F.size(F.split(F.trim(F.col("scrubbed")), " ")))
         .cast("long").alias("scrubbed_tokens"),
        F.md5("scrubbed").alias("scrub_hash"),
    )


_CDC_MOD = 8  # expected chunk length ~8 words


@register(
    "cdc_chunk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks
    ), tokp AS (
      SELECT doc_id, p, t[p] AS w,
             CASE WHEN ('0x' || substr(md5(t[p]), 1, 8))::BIGINT
                       % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS b
      FROM pos
    ), cids AS (
      SELECT doc_id, p, w,
             sum(b) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS UNBOUNDED PRECEDING) - b AS cid
      FROM tokp
    ), chunks AS (
      SELECT doc_id, cid, count(*)::BIGINT AS n,
             md5(string_agg(w, ' ' ORDER BY p)) AS h
      FROM cids GROUP BY doc_id, cid
    ), freqd AS (
      SELECT doc_id, cid, n,
             count(*) OVER (PARTITION BY h) AS freq
      FROM chunks
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_chunks,
           round(avg(n) + 1e-9, 6) AS avg_chunk,
           max(n)::BIGINT AS max_chunk,
           sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
    FROM freqd GROUP BY doc_id
    """,
    "Content-defined chunking (the FastCDC/rsync shape): a word ends a "
    "chunk when its content hash ≡ 0 (mod 8), so boundaries move WITH the "
    "content — an insertion reshapes only its local chunk and every later "
    "chunk keeps its identity, which is why storage dedup uses CDC instead "
    "of fixed offsets.  chunk_id = running boundary count (boundary word "
    "closes its own chunk); duplicate detection on md5 of the ordered "
    "chunk text.  One doc-keyed window + one (doc,chunk) aggregate + one "
    "hash-keyed frequency window — all hash-sized shuffles at 100 TB",
)
def cdc_chunk_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    tokp = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text")))
                    .alias("p0", "w"))
        .select(
            "doc_id", (F.col("p0") + 1).alias("p"), "w",
            F.when(
                F.conv(F.substring(F.md5("w"), 1, 8), 16, 10)
                 .cast("long") % _CDC_MOD == 0, 1
            ).otherwise(0).alias("b"),
        )
    )
    wdoc = (Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0))
    cids = tokp.withColumn("cid", F.sum("b").over(wdoc) - F.col("b"))
    chunks = cids.groupBy("doc_id", "cid").agg(
        F.count("*").cast("long").alias("n"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            )
        ).alias("h"),
    )
    freqd = chunks.withColumn(
        "freq", F.count("*").over(Window.partitionBy("h"))
    )
    return freqd.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.round(F.avg("n") + F.lit(1e-9), 6).alias("avg_chunk"),
        F.max("n").cast("long").alias("max_chunk"),
        F.sum(F.when(F.col("freq") > 1, 1).otherwise(0)).cast("long")
         .alias("n_dup_chunks"),
    )


_shared_sql(
    "merge_upsert_orders",
    """
    WITH src AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) + 1000 AS new_cents
      FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey + 100000000 AS k, 'I' AS op,
             CAST(round(o_totalprice * 100) AS BIGINT) AS new_cents
      FROM orders WHERE o_orderkey % 13 = 0
    ), tgt AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), merged AS (
      -- SHUFFLE_HASH: full-outer cannot broadcast, and Spark defaults the
      -- stats-equal sides to sort-merge; the hint rides in a comment DuckDB
      -- ignores, keeping ONE shared text.  At 100 TB both sides bucket by k.
      SELECT /*+ SHUFFLE_HASH(s) */
             coalesce(s.k, t.k) AS k,
             CASE WHEN s.k IS NULL                  THEN 'keep'
                  WHEN s.op = 'D' AND t.k IS NOT NULL THEN 'delete'
                  WHEN t.k IS NULL                  THEN 'insert'
                  ELSE 'update' END AS action,
             CASE WHEN s.k IS NULL THEN t.cents ELSE s.new_cents END AS cents
      FROM tgt t FULL OUTER JOIN src s ON s.k = t.k
    )
    SELECT action,
           count(*)                         AS n,
           CAST(sum(cents) AS BIGINT)       AS total_cents,
           round(sum(cents) / CAST(100 AS DOUBLE), 2) AS total_price
    FROM merged
    GROUP BY action
    """,
    "MERGE INTO (upsert) emulated engine-agnostically — the Delta/Iceberg "
    "verb OSS Spark lacks — as ONE full-outer join between target and a "
    "deterministic CDC batch (updates %7, deletes %11 [delete wins on "
    "overlap], inserts on fresh keys %13), with WHEN MATCHED / NOT "
    "MATCHED arms as a CASE over the two join sides; per-action row and "
    "value totals make every arm's effect visible to the hash gate.  "
    "Money math is EXACT INTEGER CENTS end-to-end: round(price*100) to "
    "BIGINT once at the edge, integer sums are order-free — the float "
    "variant (round(x*1.1, 2) per row) diverged between engines on "
    "halfway rounding at sf0.01, caught by this gate.  "
    "Scale: at 100 TB both sides bucket by key for a co-located merge, "
    "or the CDC batch broadcasts when small — same plan either way",
)


@register(
    "unpivot_lineitem_metrics",
    """
    WITH m AS (
      SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric,
           count(*)            AS n,
           round(sum(v), 2)    AS total,
           round(avg(v), 6)    AS mean,
           round(min(v), 6)    AS vmin,
           round(max(v), 6)    AS vmax
    FROM m GROUP BY metric
    """,
    "UNPIVOT (wide -> long reshaping): Spark runs the NATIVE "
    "DataFrame.unpivot operator (one Expand node, single scan — not four "
    "self-unions re-reading the table), the oracle is the semantically "
    "equivalent UNION ALL; the differential proves the melt reshape "
    "itself.  At scale the Expand multiplies rows 4x in the map stage "
    "with one shuffle for the tiny per-metric aggregate",
)
def unpivot_lineitem_metrics(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    m = li.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "v",
    )
    return m.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("v"), 2).alias("total"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.min("v"), 6).alias("vmin"),
        F.round(F.max("v"), 6).alias("vmax"),
    )


@register(
    "bigram_logprob_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), uni AS (
      SELECT w, count(*) AS c1 FROM tok GROUP BY w
    ), vstats AS (
      SELECT count(*) AS v FROM uni
    ), bg AS (
      SELECT doc_id, t[p] AS w1, t[p + 1] AS w2
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS p FROM toks)
    ), bgc AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), lp AS (
      SELECT b.w1, b.w2,
             CAST(round(ln((b.c2 + 1.0) / (u.c1 + s.v)) * 1e6) AS BIGINT)
               AS lp_micro
      FROM bgc b JOIN uni u ON b.w1 = u.w, vstats s
    ), per_doc AS (
      SELECT g.doc_id, count(*) AS n_bigrams,
             sum(l.lp_micro)::BIGINT AS sum_lp_micro
      FROM bg g JOIN lp l ON g.w1 = l.w1 AND g.w2 = l.w2
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_bigrams, sum_lp_micro,
           round(sum_lp_micro / (n_bigrams * 1e6) + 1e-9, 6) AS avg_logprob,
           round(exp(-round(sum_lp_micro / (n_bigrams * 1e6) + 1e-9, 6))
                 + 1e-9, 4) AS perplexity
    FROM per_doc
    """,
    "Bigram-LM document scoring — the KenLM-direction upgrade of "
    "unigram_logprob_docs: corpus bigram counts with add-one smoothing "
    "over P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V), per-bigram log-probs rounded "
    "to integer micro-nats BEFORE summation (order-free parity, same rule "
    "as unigram), per-doc average and perplexity.  Docs with < 2 tokens "
    "drop (no bigrams).  Two count aggregates + one doc rollup; the "
    "bigram LM table is Zipf-bounded and broadcasts here — at open-vocab "
    "100 TB the score join shuffles on (w1,w2) instead, same plan minus "
    "the hint",
)
def bigram_logprob_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    tok = staged.select("doc_id", F.explode("t").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c1"))
    vstats = uni.agg(F.count("*").alias("v"))
    # sequence(1, n) DESCENDS when n < 1 in Spark (range() in DuckDB is
    # simply empty) — guard short docs explicitly.
    pair_idx = F.when(
        F.size("t") < 2, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size("t") - 1))
    bg = staged.select(
        "doc_id", "t", F.explode(pair_idx).alias("p")
    ).select(
        "doc_id",
        F.element_at("t", F.col("p")).alias("w1"),
        F.element_at("t", F.col("p") + 1).alias("w2"),
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    lp = (
        bgc.join(F.broadcast(uni), bgc["w1"] == uni["w"]).drop("w")
        .crossJoin(F.broadcast(vstats))
        .select(
            "w1", "w2",
            F.round(
                F.log((F.col("c2") + F.lit(1.0))
                      / (F.col("c1") + F.col("v"))) * 1e6, 0
            ).cast("long").alias("lp_micro"),
        )
    )
    per_doc = (
        bg.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
    )
    avg = F.round(
        F.col("sum_lp_micro") / (F.col("n_bigrams") * F.lit(1e6))
        + F.lit(1e-9), 6,
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "sum_lp_micro", avg.alias("avg_logprob")
    ).withColumn(
        "perplexity", F.round(F.exp(-F.col("avg_logprob")) + F.lit(1e-9), 4)
    )


_RATE_ANOMALY_SQL = """
    WITH daily AS (
      SELECT user_id,
             CAST(hour(ts) AS BIGINT)   AS hr,
             date_trunc('day', ts)      AS day,
             count(*)                   AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id, CAST(hour(ts) AS BIGINT), date_trunc('day', ts)
    ), z AS (
      SELECT user_id, hr, c,
             count(*)   OVER w AS n_days,
             sum(c)     OVER w AS s1,
             sum(c * c) OVER w AS s2,
             max(c)     OVER w AS max_count
      FROM daily
      WINDOW w AS (PARTITION BY user_id, hr)
    )
    SELECT user_id,
           hr,
           CAST(max(n_days) AS BIGINT)    AS n_days,
           CAST(max(s1) AS BIGINT)        AS s1,
           CAST(max(s2) AS BIGINT)        AS s2,
           CAST(max(max_count) AS BIGINT) AS max_count,
           CAST(sum(CASE WHEN n_days * c - s1 > 0
                          AND (n_days * c - s1) * (n_days * c - s1)
                              > 9 * (n_days * s2 - s1 * s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_days
    FROM z
    GROUP BY user_id, hr
"""

_shared_sql(
    "events_rate_anomaly",
    _RATE_ANOMALY_SQL,
    "UEBA rate baselining — the SIEM behavioral layer above per-event "
    "rules: per (user, hour-of-day), daily event counts form the baseline "
    "and a day is anomalous when count > mean + 3*stddev.  The 3-sigma "
    "test is EXACT INTEGER arithmetic — c > S1/n + 3*sqrt((n*S2-S1^2))/n "
    "cross-multiplied to (n*c-S1)^2 > 9*(n*S2-S1^2) with a sign guard — "
    "so no float ever enters the decision and both engines agree bit-wise "
    "(sqrt/stddev would not).  Baseline moments ride ONE (user,hr)-keyed "
    "window over the tiny daily-count table (NULL users group as their "
    "own entity, no null-safe join needed — windows partition NULLs "
    "together in both engines).  Scale: the daily rollup is the only "
    "corpus-sized pass; baselines are users x 24 rows",
)


_shared_sql(
    "events_partial_merge",
    """
    WITH clean AS (
      SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day,
             CAST(round(value * 1e6) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), day_partial AS (
      SELECT wk, day, count(*) AS n, sum(v) AS s, min(v) AS lo, max(v) AS hi
      FROM clean GROUP BY wk, day
    ), merged AS (
      SELECT wk, CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
             min(lo) AS lo, max(hi) AS hi
      FROM day_partial GROUP BY wk
    ), direct AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
             min(v) AS lo, max(v) AS hi
      FROM clean GROUP BY wk
    )
    SELECT m.wk AS wk, m.n AS n, m.s AS sum_micro,
           m.lo AS vmin_micro, m.hi AS vmax_micro,
           (m.n = d.n AND m.s = d.s AND m.lo = d.lo AND m.hi = d.hi)
             AS partials_equal
    FROM merged m JOIN direct d ON m.wk = d.wk
    """,
    "Incremental-view-maintenance proof: weekly aggregates computed two "
    "ways — MERGED from persisted day-level partials (sum of n/s, min of "
    "lo, max of hi: the algebraic-aggregate merge a materialized rollup "
    "performs on refresh, never rescanning raw data) and DIRECT from raw "
    "rows — with the equality emitted as a column the oracle pins TRUE.  "
    "Values in integer micro-units so both paths and both engines sum "
    "order-free.  This is the exact-aggregate twin of the HLL/CMS "
    "mergeable-sketch rows: at 100 TB the day partials are the stored "
    "artifact and week/month/quarter all fold from them",
)


@register(
    "events_decayed_score",
    """
    WITH clean AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(round(value * 1e6) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), horizon AS (
      SELECT max(day) AS maxday FROM clean
    ), aged AS (
      SELECT user_id, v,
             least(CAST(date_diff('day', day, maxday) AS BIGINT) // 7, 62)
               AS k
      FROM clean, horizon
    )
    SELECT user_id,
           count(*)                    AS n_events,
           CAST(sum(v) AS BIGINT)      AS raw_micro,
           CAST(sum(v >> CAST(k AS INTEGER)) AS BIGINT) AS decayed_micro,
           round(sum(v >> CAST(k AS INTEGER)) / greatest(sum(v), 1)
                 + 1e-9, 6)            AS retention
    FROM aged GROUP BY user_id
    """,
    "Time-decayed engagement score (the feature-store 'decayed counter'): "
    "each event's value decays by half per 7 days of age at the corpus "
    "horizon — and the decay is an INTEGER RIGHT-SHIFT of micro-units "
    "(v >> floor(age/7d), capped at 62), a discretized exponential that "
    "keeps the whole aggregation order-free integer math; the float form "
    "(v * exp(-lambda*age)) cannot hash-match across engines because "
    "windowed float summation associates differently.  One corpus pass + "
    "a 1-row broadcast horizon; per-user sums shuffle once.  Weekly "
    "half-life steps are the tradeoff for exactness — documented, and at "
    "100 TB the shift table costs nothing",
)
def events_decayed_score(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clean = ev.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    horizon = clean.agg(F.max("day").alias("maxday"))
    aged = clean.crossJoin(F.broadcast(horizon)).select(
        "user_id", "v",
        F.least(
            (F.datediff("maxday", "day").cast("long") / F.lit(7))
            .cast("long"),
            F.lit(62),
        ).alias("k"),
    )
    # F.shiftright takes a literal bit count only — the per-row shift needs
    # the SQL form
    dec = F.expr("shiftright(v, CAST(k AS INT))")
    return aged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("long").alias("raw_micro"),
        F.sum(dec).cast("long").alias("decayed_micro"),
        F.round(
            F.sum(dec) / F.greatest(F.sum("v"), F.lit(1)) + F.lit(1e-9), 6
        ).alias("retention"),
    )


@register(
    "editdist_neardup_docs",
    _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), pre AS (
      SELECT doc_id, substr(coalesce(text, ''), 1, 80) AS pfx FROM documents
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(pa.pfx, pb.pfx) AS BIGINT) AS lev,
           round(1.0 - levenshtein(pa.pfx, pb.pfx)
                 / CAST(greatest(length(pa.pfx), length(pb.pfx), 1) AS DOUBLE)
                 + 1e-9, 6) AS sim
    FROM cand c
    JOIN pre pa ON c.id_a = pa.doc_id
    JOIN pre pb ON c.id_b = pb.doc_id
    """,
    "Edit-distance verification of LSH candidates — the character-level "
    "near-dup check (OCR noise, small in-place edits) that set-based "
    "Jaccard misses: Levenshtein over 80-char prefixes (bounding the "
    "O(len^2) DP per pair), normalized to a similarity.  Rides the shared "
    "persisted MinHash signature stage, so the quadratic work only ever "
    "touches LSH-bucketed candidates — never all pairs; text joins are "
    "shuffle-hash on doc_id (stats-less candidate frame).  At 100 TB the "
    "prefix cap is the knob: verify cost is pairs x cap^2, independent of "
    "document length",
)
def editdist_neardup_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    pre = docs.select(
        "doc_id",
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80)
         .alias("pfx"),
    )
    pa = pre.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"))
    pb = pre.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"))
    j = (
        pairs.join(pa.hint("shuffle_hash"), "id_a")
        .join(pb.hint("shuffle_hash"), "id_b")
    )
    lev = F.levenshtein("pa", "pb")
    return j.select(
        "id_a", "id_b",
        lev.cast("long").alias("lev"),
        F.round(
            F.lit(1.0)
            - lev / F.greatest(F.length("pa"), F.length("pb"), F.lit(1))
                     .cast("double")
            + F.lit(1e-9), 6,
        ).alias("sim"),
    )


@register(
    "triangle_count_docs",
    _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM cand e1
      JOIN cand e2 ON e1.id_b = e2.id_a
      JOIN cand e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ), nodes AS (
      SELECT a AS d FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT d AS doc_id, count(*) AS n_triangles
    FROM nodes GROUP BY d
    """,
    "Triangle counting on the LSH near-dup graph — the clustering- "
    "coefficient signal that separates tight duplicate cliques from "
    "chains of borderline matches (a clique's members close triangles; "
    "transitive false-positive chains do not).  Spark side runs the "
    "DEGREE-ORIENTED wedge algorithm: each undirected edge points from "
    "its (degree, id)-smaller endpoint, wedges form only at each "
    "triangle's minimum vertex, and one join against oriented edges "
    "closes them — every triangle found exactly once, and hub vertices "
    "generate O(sqrt(m)) wedges instead of O(d^2), the bound that makes "
    "the algorithm survive skewed similarity graphs at 100 TB.  The "
    "oracle brute-forces the a<b<c three-way join: identical triangle "
    "set, so the hash gate proves the oriented algorithm lossless",
)
def triangle_count_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    ).select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    sym = pairs.union(pairs.select(F.col("y").alias("x"),
                                   F.col("x").alias("y")))
    deg = sym.groupBy("x").agg(F.count("*").alias("dx"))
    # orient: (u, v) with (deg, id) of u strictly smaller
    e = (
        pairs.join(deg.hint("shuffle_hash"), "x")
        .join(
            deg.select(F.col("x").alias("y"), F.col("dx").alias("dy"))
               .hint("shuffle_hash"),
            "y",
        )
        .select(
            F.when((F.col("dx") < F.col("dy"))
                   | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))),
                   F.struct(F.col("x").alias("u"), F.col("dx").alias("du"),
                            F.col("y").alias("v"), F.col("dy").alias("dv")))
             .otherwise(
                   F.struct(F.col("y").alias("u"), F.col("dy").alias("du"),
                            F.col("x").alias("v"), F.col("dx").alias("dv")))
             .alias("o")
        )
        .select("o.u", "o.du", "o.v", "o.dv")
    )
    # the oriented edge list feeds THREE joins (two wedge sides + the
    # closing probe); without materialization each branch re-executes the
    # whole LSH bucket self-join lineage — measured 24.9 -> 3.9 s at
    # sf0.1.  Same checkpoint idiom as connected_components: real
    # checkpoint when the session has a dir, executor-local otherwise.
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    e = e.checkpoint(eager=True) if has_dir else e.localCheckpoint(eager=True)
    e1 = e.select(F.col("u"), F.col("v").alias("v1"),
                  F.col("dv").alias("d1"))
    e2 = e.select(F.col("u"), F.col("v").alias("v2"),
                  F.col("dv").alias("d2"))
    wedges = (
        e1.join(e2.hint("shuffle_hash"), "u")
        .filter(
            (F.col("d1") < F.col("d2"))
            | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
        )
    )
    closing = e.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["v1", "v2"])
    nodes = (
        tri.select(F.col("u").alias("d"))
        .union(tri.select(F.col("v1").alias("d")))
        .union(tri.select(F.col("v2").alias("d")))
    )
    return nodes.groupBy(F.col("d").alias("doc_id")).agg(
        F.count("*").alias("n_triangles")
    )


_shared_sql(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), trans AS (
      SELECT cur, nxt, count(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
      SELECT cur, sum(n) AS tn FROM trans GROUP BY cur
    )
    SELECT t.cur, t.nxt,
           CAST(t.n AS BIGINT) AS n,
           round(t.n / CAST(o.tn AS DOUBLE) + 1e-9, 6) AS p
    FROM trans t JOIN tot o ON t.cur = o.cur
    """,
    "First-order Markov transition matrix over per-user event sequences — "
    "the path-analysis primitive behind next-action prediction and "
    "anomalous-sequence detection: lead() within each user's (ts, "
    "event_id)-ordered stream (the unique tiebreak keeps both engines' "
    "orderings identical), transition counts, and row-normalized "
    "probabilities.  One user-keyed window + two tiny aggregates; the "
    "matrix is |event_types|^2 regardless of corpus size",
)


_CONV_LAG_SPARK = """
    WITH fv AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id
    ), conv AS (
      SELECT e.user_id,
             unix_timestamp(min(e.ts)) - unix_timestamp(f.first_view) AS lag_s
      FROM events e JOIN fv f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f.first_view
      GROUP BY e.user_id, f.first_view
    )
    SELECT count(*)                                        AS n_converted,
           CAST(min(lag_s) AS BIGINT)                      AS min_lag_s,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY lag_s), 6)
             AS median_lag_s,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY lag_s), 6)
             AS p75_lag_s,
           CAST(max(lag_s) AS BIGINT)                      AS max_lag_s
    FROM conv
"""


def _conv_lag_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_CONV_LAG_SPARK)


QUERIES["events_conversion_lag"] = CatalogQuery(
    _conv_lag_fn,
    _CONV_LAG_SPARK.replace(
        "unix_timestamp(min(e.ts)) - unix_timestamp(f.first_view)",
        "date_diff('second', f.first_view, min(e.ts))",
    ),
    "Conversion-lag funnel timing: per user, first 'view' then the first "
    "'purchase' at-or-after it; the lag distribution reported at exact "
    "dyadic percentiles (0.5, 0.75 — the percentile_prices "
    "representability rule) over INTEGER seconds.  One text modulo the "
    "epoch-difference dialect hole (unix_timestamp subtraction vs "
    "date_diff('second'), both = floor-second difference).  Two "
    "user-keyed aggregates + one join; the converted-user table is "
    "users-sized",
)


@register(
    "k_anonymity_docs",
    """
    WITH g AS (
      SELECT lang, source, count(*) AS n FROM documents
      GROUP BY lang, source
    ), tot AS (SELECT sum(n) AS t FROM g)
    SELECT g.lang, g.source,
           CAST(g.n AS BIGINT)                          AS n,
           (g.n < 5)                                    AS k_violation,
           round(g.n / CAST(o.t AS DOUBLE) + 1e-9, 6)   AS share
    FROM g g, tot o
    """,
    "k-anonymity audit over the quasi-identifier (lang, source) — the "
    "governance gate run before releasing corpus metadata: any "
    "equivalence class smaller than k=5 is a re-identification risk and "
    "flags k_violation (NULL attribute values form their own class, as "
    "GROUP BY does in both engines).  One aggregate; class table is "
    "cardinality-sized, the 1-row total broadcasts",
)
def k_anonymity_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("t"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang", "source",
        F.col("n").cast("long").alias("n"),
        (F.col("n") < 5).alias("k_violation"),
        F.round(F.col("n") / F.col("t").cast("double") + F.lit(1e-9), 6)
         .alias("share"),
    )


@register(
    "containment_pairs_docs",
    _duck_lsh_cte(3, 8, 2) + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.hs, b.hs)) AS inter,
             len(a.hs) AS na, len(b.hs) AS nb
      FROM cand c
      JOIN hsh a ON c.id_a = a.doc_id
      JOIN hsh b ON c.id_b = b.doc_id
    )
    SELECT id_a, id_b,
           round(inter / CAST(greatest(na, 1) AS DOUBLE) + 1e-9, 6)
             AS contain_a_in_b,
           round(inter / CAST(greatest(nb, 1) AS DOUBLE) + 1e-9, 6)
             AS contain_b_in_a,
           (inter >= CAST(0.8 * least(na, nb) AS BIGINT)
            AND least(na, nb) > 0) AS is_contained
    FROM scored
    WHERE inter > 0
    """,
    "Broder CONTAINMENT scoring of LSH candidates — the asymmetric "
    "near-dup measure Jaccard hides: a short doc quoted wholesale inside "
    "a long one has tiny Jaccard (union is huge) but containment "
    "|A∩B|/|A| ~ 1, which is how quotation/boilerplate-inclusion dedup "
    "decides to keep the superset and drop the subset.  Same shared "
    "signature stage and integer-array intersect as the Jaccard verify — "
    "only the denominator changes — and the is_contained gate "
    "cross-multiplies to integer arithmetic so no float enters the "
    "decision.  Scale identical to jaccard_pairs_docs: bucketed "
    "candidates only, never all pairs",
)
def containment_pairs_docs(spark, sf_dir):
    from ..ops.dedup import candidate_pairs_from_buckets, lsh_buckets

    docs = _load_wide(spark, sf_dir, "documents")
    sigs = _dedup_stage(spark, sf_dir)
    cands = candidate_pairs_from_buckets(lsh_buckets(sigs, 8, 2))
    a, b = sigs.alias("a"), sigs.alias("b")
    j = (
        cands.join(a, cands.id_a == F.col("a.id"))
        .join(b, cands.id_b == F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    na, nb = F.col("a.nsh"), F.col("b.nsh")
    return (
        j.select(
            "id_a", "id_b", inter.alias("inter"),
            na.alias("na"), nb.alias("nb"),
        )
        .filter(F.col("inter") > 0)
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter") / F.greatest(F.col("na"), F.lit(1))
                                   .cast("double") + F.lit(1e-9), 6
            ).alias("contain_a_in_b"),
            F.round(
                F.col("inter") / F.greatest(F.col("nb"), F.lit(1))
                                   .cast("double") + F.lit(1e-9), 6
            ).alias("contain_b_in_a"),
            (
                (F.col("inter")
                 >= (F.lit(0.8) * F.least("na", "nb")).cast("long"))
                & (F.least("na", "nb") > 0)
            ).alias("is_contained"),
        )
    )


@register(
    "trimmed_mean_pandas",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), ranked AS (
      SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
             count(*)     OVER (PARTITION BY event_type)             AS n
      FROM v
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(n) - 2 * (max(n) // 10) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                          THEN vm ELSE 0 END)
                 / CAST(max(n) - 2 * (max(n) // 10) AS DOUBLE) / 1e6
                 + 1e-9, 6) AS trimmed_mean
    FROM ranked GROUP BY event_type
    """,
    "10%-trimmed mean per group via a GROUPED_AGG Arrow pandas UDF — the "
    "one Pandas-UDF flavor the catalog lacked (scalar, grouped-map, "
    "mapInPandas, stateful, and UDTF are covered elsewhere): the whole "
    "per-group series arrives as ONE Arrow batch, numpy sorts and trims "
    "floor(n/10) from each tail, and the sum stays exact int64 until a "
    "single final division — so the Python path hash-matches the "
    "oracle's rank-filtered SQL exactly (ties trim identically because "
    "equal values are interchangeable).  Scale: grouped-agg UDFs need "
    "each group in one executor's memory — right for group counts like "
    "event types, wrong for unbounded groups; the SQL twin in the oracle "
    "IS the unbounded-safe formulation, documented as the 100 TB path",
)
def trimmed_mean_pandas(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_sum_micro(v: pd.Series) -> float:
        a = v.sort_values().to_numpy()
        k = len(a) // 10
        kept = a[k: len(a) - k] if k else a
        # python-int sum: exact at any length (int64 would be too, here)
        return float(sum(int(x) for x in kept))

    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a pandas agg too
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    g = v.groupBy("event_type").agg(
        n_rows(F.col("vm")).alias("n"),
        trimmed_sum_micro(F.col("vm")).alias("ts_micro"),
    )
    n_kept = (F.col("n") - 2 * F.floor(F.col("n") / 10)).cast("long")
    return g.select(
        "event_type", "n", n_kept.alias("n_kept"),
        F.round(
            F.col("ts_micro") / n_kept.cast("double") / F.lit(1e6)
            + F.lit(1e-9), 6,
        ).alias("trimmed_mean"),
    )


@register(
    "zipf_slope_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), vocab AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), ranked AS (
      -- MILLI-units, not micro: the OLS moment sum(x*x) is ~(28e3)^2 = 8e8
      -- per row, safe in int64 to ~10^10 vocabulary terms; micro-units
      -- (~28e6 -> 8e14/row) overflow int64 near 1e4 terms, where ANSI
      -- Spark errors while DuckDB silently widens to HUGEINT — the same
      -- unit reduction events_seasonal_decompose documents
      SELECT CAST(round(ln(row_number() OVER (ORDER BY c DESC, tok)) * 1e3)
                  AS BIGINT) AS x,
             CAST(round(ln(c) * 1e3) AS BIGINT) AS y
      FROM vocab
    ), sums AS (
      SELECT count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ranked
    )
    -- final cross-products in DOUBLE, not BIGINT: sx*sx and n*sxx pass
    -- int64 near 2.7e5 vocabulary terms (sx ~ 1e3*(n ln n - n) ~ 3.1e9 ->
    -- sx^2 ~ 9.7e18 > 2^63-1), a realistic corpus size where ANSI Spark /
    -- DuckDB overflow-error.  The int64 SUMS are exactly double-
    -- representable far past that scale and IEEE multiply/subtract/divide
    -- are engine-deterministic, so parity survives the widening.
    SELECT CAST(n AS BIGINT) AS n_vocab,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 + 1e-9, 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE) / n
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx / n) / 1e3 + 1e-9, 6) AS ln_intercept
    FROM sums
    """,
    "Zipf-slope corpus diagnostic: OLS fit of ln(freq) on ln(rank) over "
    "the vocabulary — natural text sits near slope -1, and a corpus that "
    "doesn't is synthetic, truncated, or template-spammed (this one fits "
    "~-0.3: flat shared vocab, honestly reported).  Parity design: each "
    "ln() is rounded to integer MILLI-units first (milli, not micro: the "
    "x*x moments must stay inside int64 out to ~1e10 vocabulary terms — "
    "micro-units overflow near 1e4, where ANSI Spark errors but DuckDB "
    "silently widens to HUGEINT), all OLS moments are then exact integer "
    "sums (order-free), and the slope is one double division at the end "
    "— the naive float Σln accumulation cannot hash-match across "
    "engines.  Rank ties break on the word itself, so both engines rank "
    "identically.  One token aggregate + one range-partitioned global "
    "rank over the vocabulary (ops/rank.global_row_number — the vocab is "
    "sublinear in corpus size but still 10^6-10^8 terms at 100 TB, too "
    "big for a single-partition WindowExec)",
)
def zipf_slope_docs(spark, sf_dir):
    from ..ops.rank import global_row_number

    docs = _load_wide(spark, sf_dir, "documents")
    # persist the vocabulary rollup: global_row_number reads it twice
    # (boundary sketch + rank window) and its lineage is the full
    # tokenize/explode/aggregate corpus pass (guide §7.2); vocab-sized.
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c"))
        .persist()
    )
    # milli-units (see oracle comment): keeps sum(x*x) inside int64 at any
    # realistic vocabulary size under ANSI mode
    ranked = global_row_number(
        vocab, [F.col("c").desc(), F.col("tok")], "_rn",
        part_key=-F.col("c"),
    ).select(
        F.round(F.log(F.col("_rn").cast("double")) * 1e3).cast("long")
         .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e3).cast("long")
         .alias("y"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # cross-products in DOUBLE (mirrors the oracle comment above): sx*sx
    # overflows int64 near 2.7e5 vocab terms; the int64 sums themselves are
    # exactly double-representable far beyond that, and IEEE arithmetic is
    # engine-deterministic, so widening keeps parity AND removes the
    # ANSI-overflow ceiling
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_vocab"),
        F.round(slope + F.lit(1e-9), 6).alias("zipf_slope"),
        F.round(
            (F.col("sy").cast("double") / F.col("n")
             - slope * F.col("sx") / F.col("n")) / F.lit(1e3)
            + F.lit(1e-9), 6,
        ).alias("ln_intercept"),
    )


@register(
    "multimodal_phash",
    None,  # decode is Pandas-UDF-backed; rows-only (values pinned by tests)
    "Perceptual near-duplicate IMAGES — the bridge from the multimodal "
    "family to the dedup family, as one composed DAG: deterministic PNGs "
    "(8 of them re-encoded with small pixel perturbations = planted "
    "near-dups) stream through the stdlib decode (decode_image_pixels) "
    "into phash_from_pixels (64-bit integer average-hash: 8x8 nearest "
    "sample grid, integer luma, mean threshold by cross-multiplication — "
    "no float anywhere) and the pairs come from phash_neardup's banded "
    "Hamming self-join (8 bit-bands; pigeonhole guarantees any pair "
    "within distance 6 shares a band, so candidates are lossless; "
    "bit_count(xor) verifies).  Exactly the simhash recipe applied to "
    "pixels.  Scale: only 64-bit hashes shuffle; decode stays on the "
    "executors",
)
def multimodal_phash(spark, sf_dir):
    from ..ops.multimodal import (
        MEDIA_SCHEMA, decode_image_pixels, encode_png, phash_from_pixels,
        phash_neardup,
    )

    import hashlib

    def build():
        rows = []
        for i in range(24):
            w = h = 16
            # md5-expanded content: genuinely independent images (a linear
            # (i*a + j*b) % m ramp has the SAME slope for every i and its
            # phashes collide at Hamming ~1 — caught in dev)
            base = b"".join(
                hashlib.md5(f"{i}:{k}".encode()).digest()
                for k in range(w * h * 3 // 16)
            )
            rows.append((i, "image/png", bytearray(encode_png(w, h, 3, base)),
                         ("png", 0)))
            if i < 8:  # planted near-dup: push 3 SAMPLED pixels across the
                # mean (grid points of the 8x8 phash sample lattice, sx=2*gx,
                # sy=2*gy at 16x16) so the pair lands at Hamming 1-4, not 0 —
                # exercising the verify arm, not just band equality
                pert = bytearray(base)
                for gy, gx in ((1, 1), (3, 5), (6, 2)):
                    o = (2 * gy * w + 2 * gx) * 3
                    for ch in range(3):
                        pert[o + ch] = (pert[o + ch] + 120) % 256
                rows.append((100 + i, "image/png",
                             bytearray(encode_png(w, h, 3, bytes(pert))),
                             ("png", 0)))
        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    media = _media_fixture(spark, "phash32", 32, build)
    hashes = phash_from_pixels(decode_image_pixels(media))
    return phash_neardup(hashes, max_dist=6, bands=8)


_LSH_GAUGE_CAP = 500      # brute-force truth is the gauge's cost — cap it
_LSH_GAUGE_THRESH = 0.5
_LSH_GAUGE_CONFIGS = [(2, 8), (4, 4), (8, 2)]  # (bands, rows_per_band)


@register(
    "lsh_recall_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
      WHERE doc_id < {_LSH_GAUGE_CAP}
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM toks
    ), hsh AS (
      SELECT doc_id,
             list_transform(s, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
      FROM sh
    ), sig AS (
      SELECT doc_id, [{_duck_minhash_mins(16)}] AS g FROM hsh
    ), truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.hs, b.hs))::DOUBLE
            / greatest(len(a.hs) + len(b.hs)
                       - len(list_intersect(a.hs, b.hs)), 1)
            >= {_LSH_GAUGE_THRESH}
    ), cfg AS (
      SELECT * FROM (VALUES {", ".join(f"({nb}, {rpb})" for nb, rpb in _LSH_GAUGE_CONFIGS)})
        AS t(nb, rpb)
    ), buckets AS (
      SELECT s.doc_id, c.nb, c.rpb, u.b,
             md5(array_to_string(
               list_slice(s.g, u.b * c.rpb + 1, u.b * c.rpb + c.rpb), '|'))
               AS bucket
      FROM sig s, cfg c, (SELECT unnest(range(0, 8)) AS b) u
      WHERE u.b < c.nb
    ), cand AS (
      SELECT DISTINCT l.nb, l.rpb, l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.nb = r.nb AND l.b = r.b AND l.bucket = r.bucket
       AND l.doc_id < r.doc_id
    ), per AS (
      SELECT c.nb, c.rpb,
             count(*) AS n_candidates,
             sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      FROM cand c
      LEFT JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b
      GROUP BY c.nb, c.rpb
    ), tc AS (SELECT count(*) AS n_truth FROM truth)
    SELECT CAST(p.nb AS BIGINT)            AS bands,
           CAST(p.rpb AS BIGINT)           AS rows_per_band,
           CAST(p.n_candidates AS BIGINT)  AS n_candidates,
           CAST(tc.n_truth AS BIGINT)      AS n_truth,
           CAST(p.n_hits AS BIGINT)        AS n_hits,
           round(p.n_hits / CAST(greatest(tc.n_truth, 1) AS DOUBLE)
                 + 1e-9, 6)                AS recall
    FROM per p, tc
    """,
    "LSH band-configuration tuning gauge — the dedup twin of ann_recall: "
    "three band layouts (2x8 / 4x4 / 8x2) sliced from the SAME 16-hash "
    "signatures, each scored for candidate count and recall against "
    "brute-force exact shingle-Jaccard >= 0.5 truth (capped to doc_id < "
    "500: the truth is quadratic BY DEFINITION — that cost is the whole "
    "reason LSH exists, and the gauge pays it once on a slice to pick "
    "the config the full corpus then runs bucketed).  More rows per "
    "band -> fewer, more precise candidates; more bands -> higher "
    "recall, more candidates — the measured curve IS the tuning "
    "decision.  All three configs ride one signature stage",
)
def lsh_recall_docs(spark, sf_dir):
    from ..ops.dedup import lsh_buckets

    # round-12 bimodality fix (verdict ask #5): the gauge used to slice
    # the SHARED corpus-wide signature cache (_dedup_stage), so its
    # timing flipped ~2.5x with suite-order cache state — warm slice vs
    # a full-corpus stage rebuild after any clearCache.  It now computes
    # its OWN cap-bounded stage from a doc_id-pruned scan (1/10 of the
    # corpus) and eagerly localCheckpoints it: one deterministic ~0.2 s
    # materialization per call, every downstream reference (truth BNLJ
    # both sides + three band slicings) reads the checkpointed blocks,
    # and the blocks free on GC — no persist leak, no cache-state mode.
    from ..ops.dedup import hashed_docs, minhash_signatures, shingled_docs

    docs = _load_wide(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _LSH_GAUGE_CAP
    )
    sigs = minhash_signatures(
        hashed_docs(shingled_docs(docs, "text", "doc_id", 3)), 16
    ).localCheckpoint(eager=True)
    a, b = sigs.alias("a"), sigs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    union = F.greatest(
        F.col("a.nsh") + F.col("b.nsh") - inter, F.lit(1)
    )
    truth = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(inter.cast("double") / union >= _LSH_GAUGE_THRESH)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    # ONE cfg-tagged bucket table and ONE self-join for all three band
    # layouts (was: three separate join+distinct pipelines — same rows,
    # 3x the stages); nb is unique per config so (nb, band, bucket) is
    # the collision key and rpb rides along for the output
    buckets = None
    for nb, rpb in _LSH_GAUGE_CONFIGS:
        bk = lsh_buckets(sigs, nb, rpb).select(
            F.lit(nb).alias("bands"), F.lit(rpb).alias("rows_per_band"),
            "id", "band", "bucket",
        )
        buckets = bk if buckets is None else buckets.unionAll(bk)
    l, r = buckets.alias("l"), buckets.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.bands") == F.col("r.bands"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.bands").alias("bands"),
            F.col("l.rows_per_band").alias("rows_per_band"),
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
        )
        .distinct()
    )
    hit = truth.withColumn("hit", F.lit(1))
    per = (
        cands.join(F.broadcast(hit), ["id_a", "id_b"], "left")
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    tc = truth.agg(F.count("*").alias("n_truth"))
    return per.crossJoin(F.broadcast(tc)).select(
        F.col("bands").cast("long").alias("bands"),
        F.col("rows_per_band").cast("long").alias("rows_per_band"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(
            F.col("n_hits")
            / F.greatest(F.col("n_truth"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("recall"),
    )


_KCORE_K, _KCORE_ROUNDS = 2, 12


def _kcore_oracle() -> str:
    """Unrolled simultaneous-peel rounds (the PageRank-oracle precedent:
    standard SQL forbids aggregation in a recursive member, so a bounded
    loop unrolls literally)."""
    cte = _DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), e0 AS (
      SELECT id_a AS x, id_b AS y FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    )"""
    # each e{i} is referenced three times per round (degree agg + both
    # semi-join sides); without MATERIALIZED DuckDB inlines the chain and
    # the expansion grows 3^rounds — "Too many open files" on the base
    # parquet was the symptom
    for i in range(_KCORE_ROUNDS):
        cte += f"""
    , d{i} AS (SELECT x, count(*) AS c FROM e{i} GROUP BY x)
    , k{i} AS (SELECT x FROM d{i} WHERE c >= {_KCORE_K})
    , e{i + 1} AS MATERIALIZED (
      SELECT e.x, e.y FROM e{i} e
      JOIN k{i} a ON e.x = a.x JOIN k{i} b ON e.y = b.x
    )"""
    n = _KCORE_ROUNDS
    return cte + f"""
    SELECT d.x AS doc_id,
           CAST(d.c AS BIGINT) AS core_degree,
           ((SELECT count(*) FROM e{n}) = (SELECT count(*) FROM e{n - 1}))
             AS converged
    FROM (SELECT x, count(*) AS c FROM e{n} GROUP BY x) d
    """


@register(
    "kcore_docs",
    _kcore_oracle(),
    f"2-core decomposition of the LSH near-dup graph — the noise filter "
    f"above connected components: a chain of borderline pairwise matches "
    f"is one 'cluster' to CC but has NO 2-core, while a genuine duplicate "
    f"clique survives peeling; membership separates them.  Simultaneous "
    f"peeling (drop every degree<{_KCORE_K} vertex each round) is "
    f"order-free, so both engines run the identical BOUNDED "
    f"{_KCORE_ROUNDS}-round loop — Spark as a DataFrame loop with "
    f"per-round checkpoint lineage truncation, the oracle unrolled as "
    f"chained CTEs (PageRank precedent) — and a 'converged' column "
    f"compares the last two rounds' edge counts so an instance needing "
    f"more rounds FLAGS itself instead of silently truncating.  Each "
    f"round is one degree aggregate + one semi-join pair, vertex-keyed at "
    f"any scale",
)
def kcore_docs(spark, sf_dir):
    docs = _load_wide(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    e = pairs.select(F.col("id_a").alias("x"), F.col("id_b").alias("y"))
    e = e.unionAll(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

    def _chk(df):
        # LAZY local checkpoint (round 13, the connected_components
        # pattern): every _chk here is immediately followed by a count
        # whose single-reference job materializes + caches the frame, so
        # this drops the dedicated eager-count job per truncation (total
        # driver jobs 27 -> 24 measured; AQE stage-materialization jobs
        # make up the rest)
        return (df.checkpoint(eager=True) if has_dir
                else df.localCheckpoint(eager=False))

    from ..ops.tuning import size_coalesced_rounds

    # Fixed-point early exit (guide §1.2: remove passes you throw away).
    # Peeling is MONOTONE — each round's edge set is a subset of the
    # previous round's — so equal consecutive edge COUNTS proves the sets
    # are equal, every remaining round is the identity, and the final
    # frame/`converged` flag are bit-identical to running all
    # _KCORE_ROUNDS rounds.  The per-round count runs on the freshly
    # checkpointed frame (already materialized, so it is a cheap job);
    # the old post-loop pair of count jobs is absorbed into the loop.
    # size_coalesced_rounds: same iterative tiny-shuffle rationale as
    # pagerank_int (ops/tuning).
    # the initial checkpoint materializes the LSH candidate-pair lineage
    # — keep it OUTSIDE the scope (the CC lesson: byte-coalescing an
    # expensive upstream pipeline's stages serializes real compute)
    e = _chk(e)
    converged = False
    with size_coalesced_rounds(spark):
        prev_count = e.count()
        for _ in range(_KCORE_ROUNDS):
            deg = e.groupBy("x").agg(F.count("*").alias("c"))
            keep = deg.filter(F.col("c") >= _KCORE_K).select("x")
            e = _chk(
                e.join(keep.hint("shuffle_hash"), "x")
                .join(
                    keep.select(F.col("x").alias("y")).hint("shuffle_hash"),
                    "y",
                )
                .select("x", "y")
            )
            cur = e.count()
            if cur == prev_count:
                converged = True
                break
            prev_count = cur
    return (
        e.groupBy("x")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(
            F.col("x").alias("doc_id"), "core_degree",
            F.lit(converged).alias("converged"),
        )
    )


_shared_sql(
    "events_assoc_rules",
    """
    WITH ue AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ), tot AS (
      SELECT count(DISTINCT user_id) AS n_users FROM ue
    ), item AS (
      SELECT event_type, count(*) AS n FROM ue GROUP BY event_type
    ), pair AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS n_both
      FROM ue a JOIN ue b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.lhs, p.rhs,
           CAST(p.n_both AS BIGINT) AS n_both,
           round(p.n_both / CAST(t.n_users AS DOUBLE) + 1e-9, 6)
             AS support,
           round(p.n_both / CAST(la.n AS DOUBLE) + 1e-9, 6)
             AS confidence,
           round((p.n_both * t.n_users)
                 / CAST(la.n * rb.n AS DOUBLE) + 1e-9, 6) AS lift
    FROM pair p
    JOIN item la ON p.lhs = la.event_type
    JOIN item rb ON p.rhs = rb.event_type
    CROSS JOIN tot t
    """,
    "Association rules over per-user behavior (market-basket on event "
    "types): support / confidence / lift for every directed type pair, "
    "all ratios derived from exact integer counts in one final "
    "projection (lift cross-multiplied before the single division).  "
    "The distinct (user, type) reduction is the only corpus-sized pass; "
    "pair counting self-joins the user-keyed distinct table and the "
    "item/total tables broadcast.  Lift > 1 = behavioral affinity, the "
    "recommender/cross-sell primitive",
)


_CUSUM_H_NUM, _CUSUM_H_DEN = 1, 2  # alarm threshold h = mean/2


@register(
    "events_cusum_shift",
    f"""
    WITH v AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), ref AS (
      -- exact integer FLOOR division: DuckDB's // truncates toward zero
      -- (-7 // 2 = -3) while the detector's k is defined as floor(mean)
      -- (-7/2 -> -4).  (s - pmod(s, c)) is exactly divisible by c, so the
      -- truncating // on the adjusted numerator IS floor division — no
      -- doubles involved, exact at any corpus size.
      SELECT (CAST(sum(vm) AS BIGINT)
              - ((CAST(sum(vm) AS BIGINT) % count(*)) + count(*)) % count(*))
             // count(*) AS k_micro
      FROM v
    ), p AS (
      SELECT event_type, ts, event_id,
             sum(vm - k_micro) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS prefix
      FROM v, ref
    ), p2 AS (
      -- nested window functions are illegal in both engines: the running
      -- min over the prefix column needs its own stage
      SELECT event_type, ts, prefix,
             min(prefix) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_min
      FROM p
    ), s AS (
      SELECT event_type, ts,
             prefix - least(run_min, 0) AS cusum,
             (SELECT (k_micro * {_CUSUM_H_NUM}
                      - ((k_micro * {_CUSUM_H_NUM} % {_CUSUM_H_DEN})
                         + {_CUSUM_H_DEN}) % {_CUSUM_H_DEN})
                     // {_CUSUM_H_DEN} FROM ref)
               AS h
      FROM p2
    )
    SELECT event_type,
           count(*)                                   AS n_events,
           CAST(max(cusum) AS BIGINT)                 AS cusum_max,
           CAST(sum(CASE WHEN cusum > h THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_alarms,
           date_trunc('second', min(CASE WHEN cusum > h THEN ts END))
                                                      AS first_alarm_ts
    FROM s GROUP BY event_type
    """,
    "CUSUM mean-shift detection per event type — the sequential "
    "change-point detector behind drift alarms: S_i = max(0, S_i-1 + "
    "(x_i - k)) rewritten as prefix_i - min(0, running_min(prefix)) so "
    "the RECURSION becomes two window functions over one ordered "
    "partition — and everything is INTEGER micro-units (reference k = "
    "integer-floor corpus mean, threshold h = k/2 in integer division), "
    "so the running extremes are exact in both engines where a float "
    "recursion could never hash-match.  Planted-shift test proves the "
    "alarm fires and localizes the change; uniform corpus yields its "
    "honest baseline alarm rate.  One corpus pass + one type-keyed "
    "window",
)
def events_cusum_shift(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    # exact integer FLOOR division (k = floor(mean)): (s - pmod(s, c)) is
    # exactly divisible by c, so truncating `div` on it IS floor — matches
    # the oracle's pmod-adjusted // form bit-for-bit, including negative
    # corpus means, with no double rounding at any corpus size
    ref = v.agg(
        F.expr(
            "(CAST(sum(vm) AS BIGINT)"
            " - pmod(CAST(sum(vm) AS BIGINT), count(*))) div count(*)"
        ).alias("k_micro")
    )
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    p = (
        v.crossJoin(F.broadcast(ref))
        .withColumn("prefix", F.sum(F.col("vm") - F.col("k_micro")).over(w))
        .withColumn("run_min", F.min("prefix").over(w))
        .withColumn(
            "h",
            F.expr(
                f"(k_micro * {_CUSUM_H_NUM}"
                f" - pmod(k_micro * {_CUSUM_H_NUM}, {_CUSUM_H_DEN}))"
                f" div {_CUSUM_H_DEN}"
            ),
        )
    )
    s = p.withColumn(
        "cusum", F.col("prefix") - F.least(F.col("run_min"), F.lit(0))
    )
    return s.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("cusum").cast("long").alias("cusum_max"),
        F.sum(F.when(F.col("cusum") > F.col("h"), 1).otherwise(0))
         .cast("long").alias("n_alarms"),
        F.date_trunc(
            "second",
            F.min(F.when(F.col("cusum") > F.col("h"), F.col("ts"))),
        ).alias("first_alarm_ts"),
    )


@register(
    "keywords_per_doc",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w
    ), n_docs AS (
      SELECT count(*) AS n FROM toks WHERE len(t) > 0
    ), df AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w
    ), idf AS (
      SELECT w, CAST(round(ln(n / CAST(df AS DOUBLE)) * 1e6) AS BIGINT)
               AS idf_micro
      FROM df, n_docs
    ), scored AS (
      SELECT t.doc_id, t.w, t.tf * i.idf_micro AS score_micro,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY t.tf * i.idf_micro DESC, t.w)
               AS rank
      FROM tf t JOIN idf i ON t.w = i.w
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS term,
           CAST(score_micro AS BIGINT) AS score_micro
    FROM scored WHERE rank <= 3
    """,
    "Per-document keyword extraction: top-3 terms by tf*idf where idf is "
    "rounded to integer micro-nats FIRST so the score is an exact "
    "integer product and the (score desc, term) ranking is bit-stable in "
    "both engines — float tf-idf ties break differently per engine and "
    "cannot gate.  The corpus-level tfidf_top_terms answers 'what is "
    "this corpus about'; this answers 'what is each DOC about' — the "
    "tagging/routing primitive.  One tf aggregate + broadcast idf + one "
    "doc-keyed window",
)
def keywords_per_doc(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = _load_wide(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    tok = staged.select("doc_id", F.explode("t").alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    n_docs = staged.filter(F.size("t") > 0).agg(F.count("*").alias("n"))
    df = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = df.crossJoin(F.broadcast(n_docs)).select(
        "w",
        F.round(F.log(F.col("n") / F.col("df").cast("double")) * 1e6)
         .cast("long").alias("idf_micro"),
    )
    scored = tf.join(F.broadcast(idf), "w").select(
        "doc_id", "w",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    rank = F.row_number().over(
        Window.partitionBy("doc_id")
        .orderBy(F.col("score_micro").desc(), F.col("w"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("term"),
            F.col("score_micro").cast("long").alias("score_micro"),
        )
    )


_shared_sql(
    "events_seasonal_decompose",
    """
    WITH v AS (
      -- MILLI-units, not micro: the variance moments square vm and sum
      -- over the corpus; micro^2 sums overflow int64 (Spark ANSI errors,
      -- DuckDB silently widens to HUGEINT) — milli keeps n*sum(vm^2)
      -- comfortably inside both engines' exact integer range
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(round(value * 1e3) AS BIGINT) AS vm
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), season AS (
      SELECT event_type, hr, vm,
             count(*) OVER w AS sn,
             sum(vm)  OVER w AS ss
      FROM v
      WINDOW w AS (PARTITION BY event_type, hr)
    ), resid AS (
      SELECT event_type,
             vm,
             vm - CAST(floor(ss / CAST(sn AS DOUBLE)) AS BIGINT) AS r
      FROM season
    )
    SELECT event_type,
           count(*)                                        AS n,
           CAST(sum(vm) AS BIGINT)                         AS sum_milli,
           CAST(sum(r) AS BIGINT)                          AS resid_sum,
           round(1.0
                 - (count(*) * sum(r * r) - sum(r) * sum(r))
                   / CAST(greatest(count(*) * sum(vm * vm)
                                   - sum(vm) * sum(vm), 1) AS DOUBLE)
                 + 1e-9, 6)                                AS var_explained
    FROM resid GROUP BY event_type
    """,
    "Seasonal decomposition (the hour-of-day component): subtract each "
    "(type, hour)'s integer-floor mean and report the variance the "
    "seasonal profile explains — computed from exact integer moments "
    "(n*sum(r^2) - sum(r)^2 over n*sum(v^2) - sum(v)^2, one double "
    "division at the end), so the whole decomposition is order-free.  "
    "Hourly means ride one (type,hr) window; a synthetic uniform corpus "
    "honestly explains ~0.  The model-residual shape UEBA baselining "
    "(events_rate_anomaly) thresholdss on counts; this decomposes "
    "values",
)


_QNORM_K = 16  # map each source onto the pooled distribution at 16 ranks


@register(
    "quantile_normalize_docs",
    f"""
    WITH s AS (
      SELECT doc_id, source, n_chars FROM documents
      WHERE n_chars IS NOT NULL
    ), ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*)    OVER (PARTITION BY source)        AS ns
      FROM s
    ), pooled AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS pr
      FROM s
    ), np AS (SELECT count(*) AS n FROM s)
    SELECT k.doc_id, k.source, k.n_chars,
           CAST(k.r AS BIGINT) AS src_rank,
           p.n_chars AS normalized
    FROM ranked k
    JOIN np ON true
    JOIN pooled p
      ON p.pr = ((2 * k.r - 1) * np.n + k.ns) // (2 * k.ns)
    """,
    "Quantile normalization across sources — the batch-effect correction "
    "training mixtures need when one source's quality/length scores run "
    "systematically hot: each document's value is replaced by the POOLED "
    "distribution's value at the same relative rank.  The rank mapping "
    "is pure integer arithmetic (midpoint rule (2r-1)n_pool/(2n_src) "
    "rounded via integer +den/2 trick), so engine parity is exact — no "
    "interpolated quantiles anywhere.  Unique (value, doc_id) orderings "
    "make both row_number()s deterministic.  Scale: the pooled rank is "
    "GLOBAL, so it runs on ops/rank.global_row_number — the two-pass "
    "range-partitioned rank (sampled split points via repartitionByRange, "
    "rank within ranges, broadcast per-range offsets) — never a "
    "single-partition WindowExec; exact, so the oracle is unchanged",
)
def quantile_normalize_docs(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..ops.rank import global_row_number

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    ).select("doc_id", "source", "n_chars")
    ranked = docs.select(
        "doc_id", "source", "n_chars",
        F.row_number().over(
            Window.partitionBy("source").orderBy("n_chars", "doc_id")
        ).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = global_row_number(docs, ["n_chars", "doc_id"], "pr").select(
        F.col("n_chars").alias("p_chars"), "pr"
    )
    np_ = docs.agg(F.count("*").alias("n"))
    j = ranked.crossJoin(F.broadcast(np_)).withColumn(
        "target",
        ((2 * F.col("r") - 1) * F.col("n") + F.col("ns"))
        / (2 * F.col("ns")),
    ).withColumn("target", F.floor(F.col("target")).cast("long"))
    return (
        j.join(pooled.hint("shuffle_hash"), j["target"] == pooled["pr"])
        .select(
            "doc_id", "source", "n_chars",
            F.col("r").cast("long").alias("src_rank"),
            F.col("p_chars").alias("normalized"),
        )
    )


def _rho_case_sql(col: str) -> str:
    """rho (HLL leading-zero rank) of a 32-bit hash as a CASE chain of
    integer comparisons — bit-exact in any engine, no log2 float whose
    rounding at exact powers of two could flip a bucket."""
    branches = "\n             ".join(
        f"WHEN {col} >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    )
    return f"(CASE {branches} ELSE 33 END)"


_HLL_M = 256  # 2^8 buckets


@register(
    "hll_scratch_events",
    f"""
    WITH h AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS bucket,
             ('0x' || substr(md5(user_id::VARCHAR), 3, 8))::BIGINT AS hv
      FROM events WHERE user_id IS NOT NULL
    ), rho AS (
      SELECT bucket, max({_rho_case_sql('hv')}) AS r FROM h GROUP BY bucket
    ), s AS (
      -- EMPTY registers hold value 0 and contribute 2^0 = 1 each to the
      -- indicator sum (scaled: 2^33) — summing only hit buckets inflated
      -- the estimate 8.5x (1281 vs 150 true), caught by the honesty cols
      SELECT CAST(sum(CAST(2 AS BIGINT) ** (33 - r)) AS BIGINT)
             + (256 - count(*)) * 8589934592 AS ssum,
             count(*) AS nz
      FROM rho
    ), est AS (
      -- alpha*m^2*2^33 precomputed in one double literal: DuckDB types a
      -- 0.718365 * 256 * ... chain as DECIMAL and overflows its product
      SELECT ssum, nz,
             round(404403543289500.8 / ssum) AS raw_est,
             {_HLL_M} - nz AS v
      FROM s
    ), final AS (
      SELECT CAST(CASE WHEN raw_est < 2.5 * {_HLL_M} AND v > 0
                  THEN round({_HLL_M} * ln({_HLL_M} / CAST(v AS DOUBLE)))
                  ELSE raw_est END AS BIGINT) AS hll_estimate,
             CAST(ssum AS BIGINT) AS s_scaled,
             CAST(nz AS BIGINT) AS n_buckets_hit
      FROM est
    )
    SELECT f.hll_estimate, f.s_scaled, f.n_buckets_hit,
           t.true_distinct,
           round(abs(f.hll_estimate - t.true_distinct)
                 / CAST(greatest(t.true_distinct, 1) AS DOUBLE)
                 + 1e-9, 6) AS rel_error
    FROM final f,
         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
          FROM events WHERE user_id IS NOT NULL) t
    """,
    "HyperLogLog built FROM SCRATCH relationally — the sketch INTERNALS "
    "under an EXACT differential gate, which no library HLL can offer: "
    "because the hash is deterministic md5, bucket (first md5 byte), "
    "rank (leading-zero CASE chain — no log2() float whose rounding at "
    "exact powers of two could flip a bucket), the integer-scaled "
    "indicator sum Σ2^(33-ρ), the bias-corrected estimate AND the "
    "small-range linear-counting branch (exercised here: 150 users << "
    "2.5m) are all bit-identical across engines — the gate hash-matches "
    "the whole sketch, not a tolerance band (contrast "
    "events_hll_rollup's bounded oracle over Spark's opaque library "
    "sketch).  True count and relative error emitted for honesty.  One "
    "hash pass + a 256-row rollup; the rho table IS the mergeable "
    "partial a 100 TB store persists",
)
def hll_scratch_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    # bucket/hv are pure functions of user_id and the sketch is a MAX per
    # bucket, so duplicate users contribute nothing: dedup user_id FIRST
    # (map-side partial aggregation collapses the event stream to the
    # distinct-user set before the shuffle — guide §2.3 "aggregate before
    # you shuffle"), then md5-hash only the distinct users.  The old
    # shape md5-hashed every event row twice (sketch pass + countDistinct
    # truth pass).  Deliberately NOT persisted: both consumers re-run the
    # scan+partial-distinct (cheap, pruned to one column), and the A/B
    # showed the cache's materialization barrier costs more than the
    # second scan (same lesson as customer_rfm in batch 1); the win is
    # hashing |users| rows instead of 2x|events|.
    du = ev.select("user_id").distinct()
    md5 = F.md5(F.col("user_id").cast("string"))
    h = du.select(
        F.conv(F.substring(md5, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(md5, 3, 8), 16, 10).cast("long").alias("hv"),
    )
    rho_expr = "CASE " + " ".join(
        f"WHEN hv >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    ) + " ELSE 33 END"
    rho = h.groupBy("bucket").agg(
        F.max(F.expr(rho_expr)).alias("r")
    )
    s = rho.agg(
        F.sum(F.expr("CAST(pow(2, 33 - r) AS BIGINT)")).cast("long")
         .alias("__hit"),
        F.count("*").alias("nz"),
    ).select(
        # empty registers contribute 2^(33-0) each — see oracle comment
        (F.col("__hit")
         + (F.lit(_HLL_M) - F.col("nz")) * F.lit(8589934592).cast("long"))
        .cast("long").alias("ssum"),
        "nz",
    )
    est = s.select(
        "ssum", "nz",
        F.round(F.lit(404403543289500.8) / F.col("ssum")).alias("raw_est"),
        (F.lit(_HLL_M) - F.col("nz")).alias("v"),
    )
    final = est.select(
        F.when(
            (F.col("raw_est") < 2.5 * _HLL_M) & (F.col("v") > 0),
            F.round(
                F.lit(float(_HLL_M))
                * F.log(F.lit(float(_HLL_M)) / F.col("v").cast("double"))
            ),
        ).otherwise(F.col("raw_est")).cast("long").alias("hll_estimate"),
        F.col("ssum").cast("long").alias("s_scaled"),
        F.col("nz").cast("long").alias("n_buckets_hit"),
    )
    truth = du.agg(
        F.count("*").cast("long").alias("true_distinct")
    )
    return final.crossJoin(F.broadcast(truth)).select(
        "hll_estimate", "s_scaled", "n_buckets_hit", "true_distinct",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("true_distinct"))
            / F.greatest(F.col("true_distinct"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("rel_error"),
    )


@register(
    "compress_ratio_docs",
    None,  # zlib has no SQL twin; rows-only (values pinned by a local test)
    "Compression-ratio quality signal — the cheap repetition detector "
    "production filters use beside Gopher stats (boilerplate and spam "
    "compress far better than natural text): zlib level-6 deflate per "
    "document in an Arrow-batched pandas UDF, emitting raw/compressed "
    "lengths and the ratio.  The corpus-level twin of what "
    "repetition_docs measures structurally; a doc compressing below "
    "~0.3 is near-certainly templated.  Scale: pure map work, no "
    "shuffle; bytes stay on executors, only two ints and a ratio return",
)
def compress_ratio_docs(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress((t or "").encode("utf-8"), 6))
        )

    docs = _load_wide(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
         .alias("raw_len"),
        comp_len(F.col("text")).alias("comp_len"),
    )
    return out.select(
        "doc_id", "raw_len", "comp_len",
        F.round(
            F.col("comp_len")
            / F.greatest(F.col("raw_len"), F.lit(1)).cast("double")
            + F.lit(1e-9), 6,
        ).alias("ratio"),
    )


_shared_sql(
    "events_theilsen_trend",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('day', ts)
    ), idx AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS d
      FROM daily
    ), slopes AS (
      SELECT a.event_type,
             CAST(round((b.c - a.c) * 1e6
                        / CAST(b.d - a.d AS DOUBLE)) AS BIGINT)
               AS slope_micro
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.d < b.d
    )
    SELECT event_type,
           count(*) AS n_pairs,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY slope_micro)
                 / 1e6 + 1e-9, 6) AS theilsen_slope,
           CAST(min(slope_micro) AS BIGINT) AS min_slope_micro,
           CAST(max(slope_micro) AS BIGINT) AS max_slope_micro
    FROM slopes GROUP BY event_type
    """,
    "Theil-Sen robust trend per event type — the median of all pairwise "
    "day-slopes, immune to the outlier days that wreck OLS: each slope "
    "is micro-rounded to an INTEGER before the median, whose "
    "interpolation sits at the exactly-representable 0.5 (the dyadic "
    "rule), so the whole estimator gates exactly.  Day pairs are "
    "days-squared per type (~400 here) — the classic bound; at longer "
    "horizons the repeated-median or sampled variant bounds it, same "
    "shape.  One daily rollup + one within-type pair join",
)


@register(
    "multimodal_phash_clusters",
    None,  # composed Pandas-UDF decode; rows-only (pinned by phash tests)
    "The image-dedup ENDGAME as one DAG: decode -> perceptual hash -> "
    "banded Hamming pairs -> connected components -> cluster sizes.  "
    "Composes multimodal_phash's planted fixture with the same "
    "large-star/small-star CC the text dedup family uses — proving the "
    "clustering layer is modality-agnostic: it consumes (id_a, id_b) "
    "pairs and never knows pixels produced them.  Output: one row per "
    "multi-image cluster with its size (the 8 planted pairs -> 8 "
    "clusters of 2)",
)
def multimodal_phash_clusters(spark, sf_dir):
    from ..ops.dedup import connected_components

    # persist the phash pair list: its lineage is the Pandas-UDF image
    # decode + 64-bit DCT hash over every blob, and it is referenced
    # THREE times below (both vertex-union branches + the edge list) —
    # unpersisted, the Python decode pipeline executes three times
    # (guide §4: the JVM<->Python boundary is the expensive part; cross
    # it once).  The frame itself is pair-sized.
    pairs = multimodal_phash(spark, sf_dir).persist()
    verts = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cc = connected_components(
        verts, pairs.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")),
    )
    return (
        cc.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .select(F.col("cluster").alias("cluster_id"), "cluster_size")
    )


